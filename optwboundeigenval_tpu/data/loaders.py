"""Host-side batching: the TPU-native replacement for the reference's
``torch.utils.data.DataLoader`` usage (opt.py:873-880, usps_data.py).

Design:
  * numpy arrays on host; batches are dicts ``{"x", "y", "w"}``;
  * **static shapes**: the final partial batch is padded to the full
    batch size with zero-weight rows (``w = 0``), so every train step
    hits the same compiled program and batches always divide the
    ``data`` mesh axis.  All weighted means are exact because padded
    rows carry zero weight (mirrors the reference's batch-size-weighted
    averaging, opt.py:739, opt.py:1035-1037);
  * deterministic shuffling from a seed (reference seeds 1226,
    usps_data.py:27-28, forest_data.py:48-53);
  * optional per-batch host augmentation hook (the reference's
    torchvision transforms, usps_data.py:25-33).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional

import numpy as np


class ArrayLoader:
    """Iterable over padded, weighted batches of (x, y)."""

    def __init__(
        self,
        x: np.ndarray,
        y: np.ndarray,
        batch_size: int = 128,
        *,
        shuffle: bool = False,
        seed: int = 0,
        pad: bool = True,
        drop_remainder: bool = False,
        augment: Optional[Callable[[np.ndarray, np.random.Generator], np.ndarray]] = None,
        host_shard: Optional[tuple] = None,
    ):
        assert len(x) == len(y)
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        if host_shard is not None:
            # multi-host input pipeline: host i of n feeds its strided
            # shard (SURVEY.md §2.9 "per-host data sharding"); pass
            # (jax.process_index(), jax.process_count())
            i, n = host_shard
            self.x = self.x[i::n]
            self.y = self.y[i::n]
        # kept so consumers can tell a host-sharded loader (per-process
        # DIFFERENT local data) from a replicated one — eval must
        # allgather shards before computing global metrics
        self.host_shard = host_shard
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.pad = pad
        self.drop_remainder = drop_remainder
        self.augment = augment
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.x)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_examples(self) -> int:
        return len(self.x)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.x)
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        self._epoch += 1
        bs = self.batch_size
        stop = (n // bs) * bs if self.drop_remainder else n
        for start in range(0, stop, bs):
            take = idx[start : start + bs]
            xb = self.x[take]
            yb = self.y[take]
            w = np.ones(len(take), dtype=np.float32)
            if self.augment is not None:
                xb = self.augment(xb, self._rng)
            if self.pad and len(take) < bs:
                padn = bs - len(take)
                xb = np.concatenate([xb, np.zeros((padn,) + xb.shape[1:], xb.dtype)])
                yb = np.concatenate(
                    [yb, np.zeros((padn,) + yb.shape[1:], yb.dtype)]
                )
                w = np.concatenate([w, np.zeros(padn, np.float32)])
            yield {"x": xb, "y": yb, "w": w}

    def random_batch(self, rng: Optional[np.random.Generator] = None):
        """One uniformly random batch — the reference estimates epoch-end
        rho on a random batch (opt.py:604-612)."""
        rng = rng or self._rng
        n = len(self.x)
        take = rng.choice(n, size=min(self.batch_size, n), replace=False)
        xb, yb = self.x[take], self.y[take]
        w = np.ones(len(take), dtype=np.float32)
        if self.pad and len(take) < self.batch_size:
            padn = self.batch_size - len(take)
            xb = np.concatenate([xb, np.zeros((padn,) + xb.shape[1:], xb.dtype)])
            yb = np.concatenate([yb, np.zeros((padn,) + yb.shape[1:], yb.dtype)])
            w = np.concatenate([w, np.zeros(padn, np.float32)])
        return {"x": xb, "y": yb, "w": w}


class PrefetchLoader:
    """Background-thread batch prefetcher.

    The reference overlaps host data work with compute via torch
    DataLoader worker processes (num_workers, opt.py:306); here a
    daemon thread keeps a small queue of ready batches ahead of the
    device.  Augmentation work runs in the C++ kernels
    (native/augment.cpp) which release the GIL for the bulk of their
    time inside ctypes, so the overlap is real even single-process."""

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth
        self.batch_size = getattr(loader, "batch_size", None)

    def __len__(self):
        return len(self.loader)

    @property
    def num_examples(self):
        return self.loader.num_examples

    def random_batch(self, rng=None):
        return self.loader.random_batch(rng)

    def __iter__(self):
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()
        sentinel = object()
        error: list = []

        def worker():
            try:
                for batch in self.loader:
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as exc:  # propagate loader failures
                error.append(exc)
            finally:
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    break
                yield item
        finally:
            # abandoned iteration (e.g. next(iter(loader))): unblock and
            # terminate the worker instead of leaking a thread.  Note
            # that the wrapped loader's RNG has still advanced by the
            # prefetched batches — same caveat as torch DataLoader
            # workers.
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=2.0)


def train_valid_split(
    n: int, valid_fraction: float, seed: int = 1226
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic index split (reference: SubsetRandomSampler over a
    seeded permutation, usps_data.py; sklearn train_test_split with
    random_state=1226, forest_data.py:48-53)."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)
    n_valid = int(np.floor(valid_fraction * n))
    return idx[n_valid:], idx[:n_valid]
