"""Headline benchmark: Hessian-vector-product throughput per chip.

HVPs dominate the reference's training cost (SURVEY.md §3.1: one batch
with active regularizer = #pow_iters + 3 backwards), so HVPs/sec/chip
is the north-star metric (BASELINE.json).

Baseline: the reference implementation pattern (PyTorch CPU, float64,
cached create-graph gradient, repeated ``autograd.grad`` products —
opt.py:77-108) measured on this machine: **24.27 HVPs/sec** on the
USPS CNN (ndim=14794) at batch 128.  Target: >= 10x (BASELINE.md).

This benchmark measures the same computation TPU-native: one
``jax.linearize`` of the loss gradient, then repeated linear HVP calls
inside a ``lax.scan`` under jit.  Measurement detail: on the tunneled
TPU platform ``block_until_ready`` does not reliably block, and every
device->host transfer pays a large fixed tunnel RTT, so throughput is
computed from the *marginal* cost between two scan lengths with a
forced host materialization — fixed overhead cancels.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TORCH_CPU_BASELINE_HVPS_PER_SEC = 24.27  # measured 2026-08-16, see docstring


def main() -> None:
    from optwboundeigenval_tpu.models import CNNUSPS
    from optwboundeigenval_tpu.ops import curvature
    from optwboundeigenval_tpu.train import Task
    from optwboundeigenval_tpu.utils.tree import tree_uniform_like

    task = Task(model=CNNUSPS())
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(128, 16, 16, 1)).astype(np.float32)),
        "y": jnp.asarray(rng.integers(0, 10, size=128).astype(np.int32)),
        "w": jnp.ones(128, jnp.float32),
    }
    params, _ = task.init(jax.random.PRNGKey(0), batch["x"])

    def loss_fn(p, b):
        out = task.model.apply({"params": p}, b["x"], train=True)
        return task.loss(out, b["y"], b["w"])

    def make_run(n):
        @jax.jit
        def run(params, batch, v):
            _, hvp_fn = curvature.linearize_hvp(loss_fn, params, batch)

            def body(v, _):
                hv = hvp_fn(v)
                # normalize so the loop is a real power iteration (keeps
                # every step dependent on the previous one)
                nrm = jnp.sqrt(
                    sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(hv))
                )
                return jax.tree.map(lambda x: x / nrm, hv), nrm

            return jax.lax.scan(body, v, None, length=n)

        return run

    v0 = tree_uniform_like(params)
    n_small, n_large = 400, 1600

    def timed(n, reps=3):
        run = make_run(n)
        np.asarray(run(params, batch, v0)[1])  # compile + materialize
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(params, batch, v0)[1])  # forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    t_small = timed(n_small)
    t_large = timed(n_large)
    hvps_per_sec = (n_large - n_small) / max(t_large - t_small, 1e-9)

    print(
        json.dumps(
            {
                "metric": "hvp_throughput_usps_cnn_batch128",
                "value": round(hvps_per_sec, 2),
                "unit": "HVPs/sec/chip",
                "vs_baseline": round(
                    hvps_per_sec / TORCH_CPU_BASELINE_HVPS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
