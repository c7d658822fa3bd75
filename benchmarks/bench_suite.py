"""Extended benchmark suite (run on the TPU chip).

Measures, beyond the headline bench.py number:
  1. HVP throughput on the CIFAR DenseNet-40-12 (the reference's big
     from-scratch workload) — marginal cost between two scan lengths;
  2. one spectral-regularized epoch wallclock on CIFAR DenseNet3
     (synthetic data, the BASELINE.json "epoch wallclock" metric).

Prints one JSON line per metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed_materialize(fn, *args, reps=3):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        best = min(best, time.perf_counter() - t0)
    return best


def bench_densenet_hvp():
    from optwboundeigenval_tpu.models import DenseNet3
    from optwboundeigenval_tpu.ops import curvature
    from optwboundeigenval_tpu.train import Task
    from optwboundeigenval_tpu.utils.tree import tree_uniform_like

    task = Task(model=DenseNet3(depth=40, growth_rate=12, num_classes=10),
                has_batch_stats=True)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(32, 32, 32, 3)).astype(np.float32)),
        "y": jnp.asarray(rng.integers(0, 10, size=32).astype(np.int32)),
        "w": jnp.ones(32, jnp.float32),
    }
    params, ms = task.init(jax.random.PRNGKey(0), batch["x"])

    def loss_fn(p, b):
        variables = {"params": p, **ms}
        out, _ = task.model.apply(variables, b["x"], train=True,
                                  mutable=["batch_stats"])
        return task.loss(out, b["y"], b["w"])

    def make_run(n):
        @jax.jit
        def run(params, batch, v):
            _, hvp_fn = curvature.linearize_hvp(loss_fn, params, batch)

            def body(v, _):
                hv = hvp_fn(v)
                nrm = jnp.sqrt(
                    sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(hv))
                )
                return jax.tree.map(lambda x: x / nrm, hv), nrm

            return jax.lax.scan(body, v, None, length=n)[1]

        return run

    v0 = tree_uniform_like(params)
    t_small = timed_materialize(make_run(20), params, batch, v0)
    t_large = timed_materialize(make_run(80), params, batch, v0)
    hvps = 60 / max(t_large - t_small, 1e-9)
    print(json.dumps({
        "metric": "hvp_throughput_densenet40_batch32",
        "value": round(hvps, 2), "unit": "HVPs/sec/chip",
    }))


def bench_cifar_epoch(n_batches=20):
    from optwboundeigenval_tpu.data.loaders import ArrayLoader
    from optwboundeigenval_tpu.data.synthetic import make_images
    from optwboundeigenval_tpu.models import DenseNet3
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.train import SpectralTrainer, Task

    x, y = make_images(32 * n_batches, shape=(32, 32, 3), n_classes=10,
                       seed=0)
    loader = ArrayLoader(x, y, 32, shuffle=True, seed=1)
    tr = SpectralTrainer(
        Task(model=DenseNet3(depth=40, growth_rate=12, num_classes=10),
             has_batch_stats=True),
        sgd(0.1, momentum=0.9, weight_decay=1e-4),
        mu=0.01, K=100.0, batch_size=32, max_iter=1, min_iter=1,
        max_pow_iter=100, pow_iter_eps=0.05, header="BENCH",
        log_dir="/tmp/bench/logs", model_dir="/tmp/bench/models",
    )
    tr.init_state(next(iter(loader)))
    # warm up compiles with one epoch, then time the second
    tr.iter_epoch(loader)
    t0 = time.perf_counter()
    tr.iter_epoch(loader)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "cifar10_densenet40_epoch_wallclock",
        "value": round(dt, 2), "unit": f"sec/{n_batches}x32-batch epoch",
        "batches_per_sec": round(n_batches / dt, 2),
    }))


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "hvp"):
        bench_densenet_hvp()
    if which in ("all", "epoch"):
        bench_cifar_epoch()
