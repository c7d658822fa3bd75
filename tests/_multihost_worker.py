"""Subprocess worker for the REAL multi-host test (tests/test_multihost.py).

Each worker is one ``jax.distributed`` process (the TPU-pod analog of a
host): it initializes the collective runtime through
``parallel.init_distributed``, feeds its per-host shard through
``ArrayLoader(host_shard=...)``, and runs spectral-regularized train
steps on the GLOBAL mesh via the public ``SpectralTrainer.train_step``
API.  Cross-process psums ride Gloo on the CPU backend (ICI on real
pods) — the communication path SURVEY §2.9 specifies, actually
executed across process boundaries.

Usage: python _multihost_worker.py <pid> <nproc> <coordinator> <outfile>
"""

import json
import os
import sys

pid, nproc = int(sys.argv[1]), int(sys.argv[2])
coordinator, outfile = sys.argv[3], sys.argv[4]

os.environ["JAX_DISABLE_COMPILATION_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax

# sitecustomize pre-imports jax with the TPU plugin registered; the
# platform override must go through jax.config before first backend use
# (and keeps concurrent workers off the single-client TPU tunnel).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optwboundeigenval_tpu import parallel  # noqa: E402

parallel.init_distributed(coordinator, num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

from optwboundeigenval_tpu.data.loaders import ArrayLoader  # noqa: E402
from optwboundeigenval_tpu.data.synthetic import make_classification  # noqa: E402
from optwboundeigenval_tpu.models import ForestNet  # noqa: E402
from optwboundeigenval_tpu.optim import sgd  # noqa: E402
from optwboundeigenval_tpu.train import SpectralTrainer, Task  # noqa: E402

assert jax.process_count() == nproc, (jax.process_count(), nproc)
assert len(jax.devices()) == 2 * nproc  # 2 virtual devices per host

# identical dataset on every host; host_shard feeds disjoint strided rows
x, y = make_classification(128, 10, 4, seed=7)
GLOBAL_BATCH = 32
loader = ArrayLoader(
    x, y, batch_size=GLOBAL_BATCH // nproc, host_shard=(pid, nproc)
)

mesh = parallel.make_mesh()  # all 2*nproc devices on the data axis
trainer = SpectralTrainer(
    Task(model=ForestNet(hidden=8, num_classes=4)),
    sgd(0.1),
    mu=0.05,
    K=0.0,
    batch_size=GLOBAL_BATCH,
    max_pow_iter=50,
    pow_iter_eps=1e-4,
    seed=0,
    header="MH",
    mesh=mesh,
    log_dir=os.path.join(os.path.dirname(outfile), f"logs{pid}"),
    model_dir=os.path.join(os.path.dirname(outfile), f"models{pid}"),
)

rows = []
for step, batch in enumerate(loader):
    m = trainer.train_step(batch)
    rows.append(
        {
            "step": step,
            "rho": float(m["rho"]),
            "g": float(m["g"]),
            "gradf_norm": float(m["gradf_norm"]),
            "step_ok": bool(m["step_ok"]),
        }
    )
    if step >= 2:
        break

with open(outfile, "w") as fh:
    json.dump({"pid": pid, "rows": rows}, fh)
print(f"worker {pid}: done", flush=True)
