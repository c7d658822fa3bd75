"""Full-size CIFAR-10 epoch wallclock (BASELINE.json north-star metric).

Runs ONE complete spectral-training epoch of the
cifar10_DenseNet_mu0_01_K100 recipe shape — 50,048 synthetic 32x32
images, 391 steps of batch 128, DenseNet-40-12, binding band (K=0) so
the vGHv penalty gradient runs EVERY step — through the public
``SpectralTrainer.iter_epoch`` protocol (per-batch spectral steps +
epoch-end full-train-set eval + random-batch rho, exactly the
reference's per-epoch work, opt.py:580-763), with the tuned knobs:
bf16 compute, remat, defer_metrics.

The projection for the torch-CPU reference comes from its measured
curvature throughput (0.16 HVP/s at batch 32,
benchmarks/measure_torch_densenet_baseline.py): one spectral step =
(pow_iters + 3) HVP-equivalents (SURVEY.md §3.1), so a 391-step epoch
at the SAME mean pow_iters is projected, per-example normalized.

Usage: python benchmarks/bench_epoch_wallclock.py [--steps 391]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TORCH_CPU_HVPS_PER_SEC = 0.16  # measured, batch 32
TORCH_CPU_BATCH = 32


def _cached_images(n, shape, n_classes, seed):
    """Disk-cached make_images: generating 50k CIFAR-sized images costs
    ~5 min of host RNG on this one-core machine — cache the arrays so
    repeated bench configs pay it once."""
    from optwboundeigenval_tpu.data.synthetic import make_images

    cache = (f"/tmp/owb_data_cache/images_n{n}_s{'x'.join(map(str, shape))}"
             f"_c{n_classes}_seed{seed}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return z["x"], z["y"]
    x, y = make_images(n, shape=shape, n_classes=n_classes, seed=seed)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez(cache, x=x, y=y)
    return x, y


def main(steps=391, batch=128, scan_steps=1, device_data=False,
         workdir="/tmp/bench_epoch", verbose=True):
    import jax.numpy as jnp

    from optwboundeigenval_tpu.data.device import DeviceArrayLoader
    from optwboundeigenval_tpu.data.loaders import ArrayLoader
    from optwboundeigenval_tpu.models import DenseNet3
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.train import SpectralTrainer, Task

    n = steps * batch
    x, y = _cached_images(n, (32, 32, 3), 10, 0)
    # device_data: the tunneled-TPU epoch is transfer-bound (~1.2 GB of
    # pixels per epoch: 391 train batches + 391 eval batches); the
    # device-resident dataset ships the pixels ONCE and then only
    # (batch,) int32 index vectors per step
    loader_cls = DeviceArrayLoader if device_data else ArrayLoader
    loader = loader_cls(x.astype(np.float32), y.astype(np.int32),
                        batch_size=batch)
    task = Task(model=DenseNet3(dtype=jnp.bfloat16), has_batch_stats=True)
    tr = SpectralTrainer(
        task, sgd(0.1, momentum=0.9), mu=0.01, K=0.0, pow_iter_eps=0.05,
        batch_size=batch, max_pow_iter=100, ignore_bad_vals=False,
        remat=True, defer_metrics=True, scan_steps=scan_steps,
        header="BENCH_EPOCH", seed=0,
        min_iter=1, max_iter=1,
        log_dir=os.path.join(workdir, "logs"),
        model_dir=os.path.join(workdir, "models"),
    )
    first = next(iter(loader))
    tr.init_state(first)

    # Snapshot the INIT state, warm-compile every program the epoch
    # needs, then restore the snapshot before timing: the timed epoch
    # starts from the IDENTICAL training state for every scan_steps
    # config.  (Power-iteration trip counts are strongly
    # state-dependent on this synthetic task, so timing epochs that
    # start from different warm-up states is apples-to-oranges — the
    # round-3 scan_steps investigation hit exactly that.)
    snap = (tr.params, tr.model_state, tr.opt_state, tr.v, tr.rng)

    def warm_epoch(n_batches):
        m = n_batches * batch
        tr.iter_epoch(
            loader_cls(x[:m].astype(np.float32), y[:m].astype(np.int32),
                       batch_size=batch)
        )

    if scan_steps > 1:
        warm_epoch(scan_steps)
        rem = steps % scan_steps
        if rem:
            warm_epoch(rem)
    else:
        warm_epoch(2)
    if device_data:
        # the gather program's cache key includes the dataset shape —
        # warm it for the FULL arrays too (no shuffle: iteration order
        # and loader state are unaffected)
        next(iter(loader))

    tr.params, tr.model_state, tr.opt_state, tr.v, tr.rng = snap
    tr._np_rng = np.random.default_rng(tr.seed)

    t0 = time.perf_counter()
    tr.iter_epoch(loader)
    wall = time.perf_counter() - t0

    # mean power-iteration count for the torch projection, from the
    # epoch's own deferred metrics (a fetched per-step train_step here
    # would cold-compile the whole per-batch program in scan mode just
    # to read this number)
    pow_iters = float(getattr(tr, "mean_pow_iters", 0.0)) or float(
        tr.train_step(first, fetch=True)["pow_iters"]
    )
    hvp_equiv_per_step = pow_iters + 3.0
    torch_examples_per_sec = TORCH_CPU_HVPS_PER_SEC * TORCH_CPU_BATCH
    torch_epoch_s = steps * hvp_equiv_per_step * batch / torch_examples_per_sec

    out = dict(
        metric="cifar10_densenet40_epoch_wallclock",
        steps=steps,
        batch=batch,
        scan_steps=scan_steps,
        device_data=device_data,
        images=n,
        epoch_wallclock_s=round(wall, 2),
        steps_per_sec=round(steps / wall, 2),
        mean_pow_iters=pow_iters,
        torch_cpu_projected_epoch_s=round(torch_epoch_s, 0),
        speedup_vs_torch_cpu=round(torch_epoch_s / wall, 0),
        final_f=float(tr.f),
        final_rho=float(tr.rho),
    )
    if verbose:  # suppressed when embedded in bench.py's one-line contract
        print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=391)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--scan_steps", type=int, default=1,
                    help="fuse chunks of k train steps into one lax.scan "
                         "program (chunked-dispatch fast path)")
    ap.add_argument("--device_data", action="store_true",
                    help="device-resident dataset (index-only transfers)")
    args = ap.parse_args()
    main(args.steps, args.batch, args.scan_steps, args.device_data)
