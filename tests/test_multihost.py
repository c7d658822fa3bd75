"""REAL multi-host execution test: 2 separate ``jax.distributed``
processes (Gloo CPU collectives, 2 virtual devices each = 4 global)
run spectral train steps through the public ``SpectralTrainer.train_step``
on a global mesh, each feeding its ``ArrayLoader(host_shard=...)``
shard — the full SURVEY §2.9 multi-host recipe actually crossing
process boundaries, not a single-process simulation.

The per-step (rho, g, ||grad f||) must agree (a) between the two hosts
(they hold replicas of one global computation) and (b) with a
single-process run on the identical global batches (the psum'd
cross-host reduction is exact; batch rows are interleaved across hosts
but every loss is a weighted mean, so permutation-invariant).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from optwboundeigenval_tpu.data.loaders import ArrayLoader
from optwboundeigenval_tpu.data.synthetic import make_classification
from optwboundeigenval_tpu.models import ForestNet
from optwboundeigenval_tpu.optim import sgd
from optwboundeigenval_tpu.train import SpectralTrainer, Task

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _reference_rows(tmp_path):
    """Single-process run on the same global batches (32 rows/step)."""
    x, y = make_classification(128, 10, 4, seed=7)
    loader = ArrayLoader(x, y, batch_size=32)
    tr = SpectralTrainer(
        Task(model=ForestNet(hidden=8, num_classes=4)),
        sgd(0.1),
        mu=0.05,
        K=0.0,
        batch_size=32,
        max_pow_iter=50,
        pow_iter_eps=1e-4,
        seed=0,
        header="MH_REF",
        log_dir=str(tmp_path / "logs_ref"),
        model_dir=str(tmp_path / "models_ref"),
    )
    rows = []
    for step, batch in enumerate(loader):
        m = tr.train_step(batch)
        rows.append({"step": step, "rho": float(m["rho"]), "g": float(m["g"]),
                     "gradf_norm": float(m["gradf_norm"])})
        if step >= 2:
            break
    return rows


def test_two_process_distributed_train_step(tmp_path):
    nproc = 2
    port = _free_port()
    outs = [str(tmp_path / f"out{i}.json") for i in range(nproc)]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_DISABLE_COMPILATION_CACHE"] = "1"

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(nproc),
             f"127.0.0.1:{port}", outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = []
    for o in outs:
        with open(o) as fh:
            results.append(json.load(fh))

    rows0, rows1 = results[0]["rows"], results[1]["rows"]
    assert len(rows0) == len(rows1) == 3
    # (a) both hosts observe the identical global computation
    for r0, r1 in zip(rows0, rows1):
        assert r0["step_ok"] and r1["step_ok"]
        np.testing.assert_allclose(r0["rho"], r1["rho"], rtol=1e-6)
        np.testing.assert_allclose(r0["gradf_norm"], r1["gradf_norm"],
                                   rtol=1e-6)

    # (b) the 2-host run matches the single-process run on the same
    # global batches (f32 reduction-order differences only)
    ref = _reference_rows(tmp_path)
    for r0, rr in zip(rows0, ref):
        np.testing.assert_allclose(r0["rho"], rr["rho"], rtol=2e-3)
        np.testing.assert_allclose(r0["gradf_norm"], rr["gradf_norm"],
                                   rtol=2e-3)
        np.testing.assert_allclose(r0["g"], rr["g"], rtol=2e-3, atol=1e-7)
