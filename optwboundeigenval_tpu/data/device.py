"""Device-resident dataset loader.

The reference streams every batch from host RAM through the torch
DataLoader (opt.py:873-880); on a TPU behind a network tunnel that
pattern is transfer-bound — a CIFAR-sized epoch moves ~600 MB of pixels
host→device for the train pass and again for the epoch-end eval pass,
while the actual step compute takes a fraction of that time.

``DeviceArrayLoader`` is the TPU-native alternative when the dataset
fits in HBM (CIFAR f32 is 614 MB against 16 GB on v5e): the full
``(x, y)`` arrays are placed on device ONCE, the per-epoch shuffle
happens on host (a numpy permutation, identical to
:class:`ArrayLoader`'s), and each batch is materialised by a jitted
on-device gather whose only host→device traffic is the ``(batch,)``
int32 index vector — 512 bytes instead of 1.5 MB for CIFAR b128.

Semantics match :class:`ArrayLoader` exactly (same seed → same batch
order; the padded tail batch carries zero rows with ``w = 0``): padding
is implemented by gathering row 0 and multiplying by the ``w > 0``
mask, which reproduces the host loader's zero-filled rows bit-exactly,
so trajectories are identical either way
(tests/test_data.py::test_device_loader_matches_arrayloader).

Single-process loader: the gathered batches live on the default device
and the trainer's ``_put_batch`` reshards them across a single-process
mesh as usual.  Multi-host pipelines keep using the host
:class:`ArrayLoader` with ``host_shard``.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp


def _make_gather(transform, augment):
    """Build the jitted gather program: take rows ``idx`` of the
    device-resident dataset, apply the deterministic ``transform``
    (e.g. uint8 → normalized float — lets the dataset sit in HBM at 1/4
    the footprint) and the key-driven ``augment`` (random flip/crop on
    the VPU — the reference does torchvision augmentation on host,
    usps_data.py:25-33 / cifar_data.py:98-106), then zero the padded
    tail (rows where ``w == 0``), matching the host loader's
    zero-filled padding."""

    @partial(jax.jit, static_argnames=("use_aug",))
    def gather(x, y, idx, w, key, *, use_aug):
        xb = jnp.take(x, idx, axis=0)
        yb = jnp.take(y, idx, axis=0)
        if transform is not None:
            xb = transform(xb)
        if augment is not None and use_aug:
            xb = augment(xb, key)
        mask = (w > 0)
        xb = xb * mask.reshape((-1,) + (1,) * (xb.ndim - 1)).astype(xb.dtype)
        yb = yb * mask.reshape((-1,) + (1,) * (yb.ndim - 1)).astype(yb.dtype)
        return xb, yb

    return gather


def cifar_augment_device(x, key, pad: int = 4, flip_p: float = 0.5):
    """On-device CIFAR recipe: random horizontal flip + random crop
    with ``pad``-pixel padding (the reference's torchvision recipe,
    cifar_data.py:98-106, moved off the host: one fused VPU program per
    batch instead of a scipy loop over images)."""
    kf, kc = jax.random.split(key)
    b, h, w, c = x.shape
    flip = jax.random.bernoulli(kf, flip_p, (b,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    offs = jax.random.randint(kc, (b, 2), 0, 2 * pad + 1)

    def crop(img, off):
        return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (h, w, c))

    return jax.vmap(crop)(xp, offs)


class DeviceArrayLoader:
    """Drop-in :class:`ArrayLoader` replacement yielding device-resident
    batches ``{"x": jax.Array, "y": jax.Array, "w": np.ndarray}``.

    ``w`` stays a host array: the trainer reduces it host-side
    (weighted-mean bookkeeping) and ships it to device as a step
    argument exactly as with the host loader.
    """

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
        transform=None,
        augment=None,
        device=None,
    ):
        assert len(x) == len(y)
        xh = np.asarray(x)
        yh = np.asarray(y)
        put = jax.device_put if device is None else partial(
            jax.device_put, device=device)
        self.x = put(xh)
        self.y = put(yh)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.pad = pad
        self.drop_remainder = drop_remainder
        # transform: deterministic on-device per-batch map (e.g.
        # uint8 → normalized float); augment: fn(x_batch, key) — random
        # on-device augmentation, applied to __iter__ batches only
        # (like the host loader's hook), never to random_batch
        self.transform = transform
        self.augment = augment
        self._gather = _make_gather(transform, augment)
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = int(self.x.shape[0])
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_examples(self) -> int:
        return int(self.x.shape[0])

    def _emit(self, take: np.ndarray, use_aug: bool = False):
        bs = self.batch_size
        n_valid = len(take)
        w = np.ones(n_valid, dtype=np.float32)
        if self.pad and n_valid < bs:
            take = np.concatenate(
                [take, np.zeros(bs - n_valid, take.dtype)])
            w = np.concatenate([w, np.zeros(bs - n_valid, np.float32)])
        if use_aug and self.augment is not None:
            self._key, key = jax.random.split(self._key)
        else:
            use_aug, key = False, self._key
        xb, yb = self._gather(self.x, self.y, jnp.asarray(take, jnp.int32),
                              jnp.asarray(w), key, use_aug=use_aug)
        return {"x": xb, "y": yb, "w": w}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = int(self.x.shape[0])
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        self._epoch += 1
        bs = self.batch_size
        stop = (n // bs) * bs if self.drop_remainder else n
        for start in range(0, stop, bs):
            yield self._emit(idx[start:start + bs], use_aug=True)

    def random_batch(self, rng: Optional[np.random.Generator] = None):
        """One uniformly random batch (epoch-end rho estimation,
        opt.py:604-612)."""
        rng = rng or self._rng
        n = int(self.x.shape[0])
        take = rng.choice(n, size=min(self.batch_size, n), replace=False)
        return self._emit(take)


def as_device_loader(loader, transform=None, augment=None):
    """Convert a host :class:`ArrayLoader` into a
    :class:`DeviceArrayLoader` over the same data — same batch size,
    padding, and (by copying the generator state) the same shuffle
    stream, so the batch order is identical from the point of
    conversion.  The config driver's ``device_data`` flag routes train
    loaders through this.

    Host augmentation hooks cannot move to device automatically; pass a
    device-side ``augment`` or keep the host loader."""
    if getattr(loader, "augment", None) is not None and augment is None:
        raise ValueError(
            "loader has a host augment hook; pass a device-side "
            "augment= (e.g. cifar_augment_device) or keep the host "
            "loader")
    dev = DeviceArrayLoader(
        np.asarray(loader.x), np.asarray(loader.y),
        batch_size=loader.batch_size,
        shuffle=loader.shuffle, pad=loader.pad,
        drop_remainder=loader.drop_remainder,
        transform=transform, augment=augment,
    )
    dev._rng.bit_generator.state = loader._rng.bit_generator.state
    return dev
