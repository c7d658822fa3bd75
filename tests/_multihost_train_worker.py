"""Subprocess worker for the multi-host FULL-train() test
(tests/test_multihost.py::test_two_process_full_train_loop).

Each worker is one ``jax.distributed`` process running the complete
``SpectralTrainer.train()`` loop on the global mesh — per-epoch eval
(test_model on a replicated validation set), TSV logging, per-epoch and
best-model checkpointing of the sharded state — for 2 epochs; it then
checkpoints full state (save_full), constructs a FRESH trainer, resumes
from the checkpoint, and trains 1 more epoch.  The combined 3-epoch TSV
must match a single-process straight-through run (SURVEY §2.9 loop-level
multi-host evidence; the reference is single-process, opt.py:246-251).

Usage: python _multihost_train_worker.py <pid> <nproc> <coordinator> <outfile>
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


class _PinnedRng:
    """Epoch-end random-batch draw pinned to call-counter % n (so the
    resumed trainer continues the straight-through draw sequence)."""

    def __init__(self, start=0):
        self.i = start

    def integers(self, low, high):
        v = low + self.i % max(high - low, 1)
        self.i += 1
        return v


x, y = make_classification(128, 10, 4, seed=7)
xv, yv = make_classification(64, 10, 4, seed=8)
GLOBAL_BATCH = 32
workdir = os.path.dirname(outfile)


def make_trainer(log_tag):
    # train shards per host; validation is replicated (every host passes
    # evaluated as per-process stripes (trainer._eval_outputs_sharded)
    mesh = parallel.make_mesh()
    return SpectralTrainer(
        Task(model=ForestNet(hidden=8, num_classes=4)),
        sgd(0.1),
        mu=0.05,
        K=0.0,
        batch_size=GLOBAL_BATCH,
        max_pow_iter=50,
        pow_iter_eps=1e-4,
        min_iter=3,
        max_iter=3,
        seed=0,
        header="MHT",
        mesh=mesh,
        full_ckpt=True,  # per-epoch save_full: the mid-run resume point
        log_dir=os.path.join(workdir, f"{log_tag}_logs{pid}"),
        model_dir=os.path.join(workdir, f"{log_tag}_models{pid}"),
    )


def loaders():
    train = ArrayLoader(
        x, y, batch_size=GLOBAL_BATCH // nproc, host_shard=(pid, nproc)
    )
    valid = ArrayLoader(xv, yv, batch_size=GLOBAL_BATCH)
    return train, valid


# ---- phase 1: epochs 0-1 (full_ckpt writes the per-epoch resume
# point; train() itself ends with the BEST model loaded — reference
# test_set semantics — so the checkpoint must come from inside the
# loop, not after it) ----------------------------------------------------
train_loader, valid_loader = loaders()
tr = make_trainer("run")
tr._np_rng = _PinnedRng()
tr.max_iter = 2
tr.min_iter = 2
tr.train(train_loader=train_loader, valid_loader=valid_loader)
ckpt = os.path.join(tr.model_dir, tr.header2 + "_full.msgpack")

# ---- phase 2: fresh trainer resumes the sharded state, epoch 2 ----------
tr2 = make_trainer("run")  # same log/model dirs: the TSV appends
tr2._np_rng = _PinnedRng(start=2)  # continue the draw sequence
tr2.init_state(next(iter(train_loader)))
tr2.resume(ckpt)
assert tr2.i == 1, tr2.i
tr2.train(train_loader=train_loader, valid_loader=valid_loader)

rows = []
with open(tr2.log_file) as fh:
    for line in fh:
        parts = line.split()
        if parts and parts[0].isdigit():
            rows.append([float(p) for p in parts])

# global train-set eval THROUGH the host-sharded loader: exercises the
# sharded-eval adapter (trainer._eval_outputs_sharded) — each host
# holds a DIFFERENT local shard, so without the adapter each host would
# silently report its own shard's metrics as the global ones
trf, tracc, trf1 = tr2.test_model(loader=train_loader)

with open(outfile, "w") as fh:
    json.dump(
        {
            "pid": pid,
            "rows": rows,
            "best_iter": tr2.best_iter,
            "best_val_acc": tr2.best_val_acc,
            "train_eval": [float(trf), float(tracc), float(trf1)],
        },
        fh,
    )
print(f"worker {pid}: done", flush=True)
