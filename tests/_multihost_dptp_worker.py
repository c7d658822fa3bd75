"""Subprocess worker for the 4-process dp x tp multi-host test
(tests/test_multihost.py::test_four_process_dp_tp_train_loop).

Four ``jax.distributed`` processes with ONE local device each form a
``data=2 x model=2`` mesh (the smallest mesh whose ``model`` axis spans
processes).  Each process feeds the host shard of its DATA coordinate —
the two processes in a data group hold identical rows, matching
``shard_batch``'s replicate-along-model placement — runs the full
``train()`` loop (per-epoch eval, TSV logging, checkpointing), and then
evaluates the train set through the host-sharded loader, exercising the
data-sharded output-allgather eval with tp-replica dedup
(trainer._eval_outputs_sharded / _eval_is_contributor).

Usage: python _multihost_dptp_worker.py <pid> <nproc> <coordinator> <outfile>
"""

import json
import os
import sys

pid, nproc = int(sys.argv[1]), int(sys.argv[2])
coordinator, outfile = sys.argv[3], sys.argv[4]
assert nproc == 4

os.environ["JAX_DISABLE_COMPILATION_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optwboundeigenval_tpu import parallel  # noqa: E402

parallel.init_distributed(coordinator, num_processes=nproc, process_id=pid)

from optwboundeigenval_tpu.data.loaders import ArrayLoader  # noqa: E402
from optwboundeigenval_tpu.data.synthetic import make_classification  # noqa: E402
from optwboundeigenval_tpu.models import ForestNet  # noqa: E402
from optwboundeigenval_tpu.optim import sgd  # noqa: E402
from optwboundeigenval_tpu.train import SpectralTrainer, Task  # noqa: E402

assert jax.process_count() == nproc
assert len(jax.local_devices()) == 1

x, y = make_classification(128, 10, 4, seed=7)
xv, yv = make_classification(64, 10, 4, seed=8)
GLOBAL_BATCH = 32
DP = 2
workdir = os.path.dirname(outfile)

mesh = parallel.make_mesh(data=DP, model=nproc // DP)
# this process's data-axis coordinate: where its (single) device sits
# in the mesh grid — its loader feeds THAT data half
data_coord = None
for d_idx in range(mesh.devices.shape[0]):
    if any(dev.process_index == pid for dev in mesh.devices[d_idx]):
        data_coord = d_idx
assert data_coord is not None


class _PinnedRng:
    def __init__(self, start=0):
        self.i = start

    def integers(self, low, high):
        v = low + self.i % max(high - low, 1)
        self.i += 1
        return v


tr = SpectralTrainer(
    Task(model=ForestNet(hidden=8, num_classes=4)),
    sgd(0.1),
    mu=0.05,
    K=0.0,
    batch_size=GLOBAL_BATCH,
    max_pow_iter=50,
    pow_iter_eps=1e-4,
    min_iter=2,
    max_iter=2,
    seed=0,
    header="MHDT",
    mesh=mesh,
    log_dir=os.path.join(workdir, f"dptp_logs{pid}"),
    model_dir=os.path.join(workdir, f"dptp_models{pid}"),
)
tr._np_rng = _PinnedRng()

# per-DATA-GROUP host shard: both processes of a data group feed the
# identical local rows (replicated along the model axis)
train_loader = ArrayLoader(
    x, y, batch_size=GLOBAL_BATCH // DP, host_shard=(data_coord, DP)
)
valid_loader = ArrayLoader(xv, yv, batch_size=GLOBAL_BATCH)
tr.train(train_loader=train_loader, valid_loader=valid_loader)

rows = []
with open(tr.log_file) as fh:
    for line in fh:
        parts = line.split()
        if parts and parts[0].isdigit():
            rows.append([float(p) for p in parts])

# global train-set eval THROUGH the host-sharded loader: the two tp
# replicas of each data group hold identical rows — without the
# contributor dedup every example would be double-counted
trf, tracc, trf1 = tr.test_model(loader=train_loader)

with open(outfile, "w") as fh:
    json.dump(
        {
            "pid": pid,
            "data_coord": data_coord,
            "rows": rows,
            "best_iter": tr.best_iter,
            "train_eval": [float(trf), float(tracc), float(trf1)],
        },
        fh,
    )
print(f"worker {pid}: done", flush=True)
