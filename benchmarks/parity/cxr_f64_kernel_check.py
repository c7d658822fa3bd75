"""f64 kernel-parity check for the chest-x-ray workload (DenseNet121 +
in-model Sigmoid + W-BCE-with-logits, NaN labels — the reference's
flagship, dcnn.py:255-265/375-400).

Runs 3 damped power iterations (alpha=1, uniform v0 — the reference's
deterministic random_v, opt.py:324-325) from the SAME converted init on
the SAME batch in float64 on BOTH frameworks and reports the per-
iteration Rayleigh quotients.  Also reports each framework's own f32
run against its f64 oracle.

Measured (2026-08-17, recorded in run_parity.CONFIGS['cxr']):
  * torch f64 vs jax f64 lam: agree to ~4.5e-8 relative at every
    iteration — ALGORITHMIC parity on the full 121-layer HVP through
    train-mode BN and the double-sigmoid W-BCE composition;
  * torch f32 vs torch f64: up to 22% deviation by iteration 2 (and
    jax f32 similarly) — the uniform v0 is nearly orthogonal to the
    dominant eigenvector of an operator with ||H|| ~ 100, so the early
    iterates are chaotic under rounding.  The f32 single-batch rho
    difference between frameworks is therefore intrinsic arithmetic
    noise, not implementation divergence.

Usage: python benchmarks/parity/cxr_f64_kernel_check.py <workdir>
  (workdir must contain data.npz, init_params.npz, converted_init.npz
   from a `run_parity.py --task cxr` run)
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TORCH_SNIPPET = r"""
import os, sys
sys.path.insert(0, {repo!r})
import numpy as np
from benchmarks.parity import _refenv
_refenv.install()
import torch, dcnn
import opt as ref_opt
wd = {wd!r}
model = dcnn.DenseNet121(14, isTrained=False)
sd = {{k: torch.from_numpy(v) for k, v in np.load(os.path.join(wd,'init_params.npz')).items()}}
model.load_state_dict(sd)
model = model.double(); model.train()
crit = dcnn.W_BCEWithLogitsLoss()
data = np.load(os.path.join(wd,'data.npz'))
x = np.ascontiguousarray(data['x_train'][:4].transpose(0,3,1,2)).astype(np.float64)
y = data['y_train'][:4].astype(np.float64)
op = ref_opt.HVPOperator(model, [torch.from_numpy(x), torch.from_numpy(y)], crit, use_gpu=False)
ndim = sum(p.numel() for p in model.parameters())
v = torch.from_numpy(np.ones(ndim)/np.sqrt(ndim))
lams = []
for i in range(3):
    hv = op.Hv(v, storedGrad=True)
    lam = float(torch.dot(hv.double(), v))
    if lam < 0: lam = -lam; hv = -hv
    lams.append(lam)
    vn = v + (hv.double() - v)
    v = vn / torch.norm(vn)
print("RESULT " + __import__('json').dumps(lams))
"""

_JAX_SNIPPET = r"""
import os, sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict
from optwboundeigenval_tpu.models.cxr import DenseNet121Sigmoid
from optwboundeigenval_tpu.train import Task
from optwboundeigenval_tpu.train.task import weighted_bce_with_logits
from optwboundeigenval_tpu.ops import curvature
from optwboundeigenval_tpu.utils.tree import (tree_uniform_like, tree_vdot,
                                              tree_scale, tree_sub, tree_axpy)
wd = {wd!r}
data = np.load(os.path.join(wd,'data.npz'))
x = data['x_train'][:4].astype(np.float64); y = data['y_train'][:4].astype(np.float64)
task = Task(model=DenseNet121Sigmoid(class_count=14, dtype=jnp.float64),
            loss=weighted_bce_with_logits, has_batch_stats=True)
batch = {{"x": jnp.asarray(x), "y": jnp.asarray(y), "w": jnp.ones(4, jnp.float64)}}
params, model_state = task.init(jax.random.PRNGKey(0), batch["x"])
loaded = dict(np.load(os.path.join(wd,'converted_init.npz')))
flat = flatten_dict({{"params": params, **model_state}}, sep="/")
for k in flat: flat[k] = jnp.asarray(loaded[k], jnp.float64)
variables = unflatten_dict(flat, sep="/")
params = variables.pop("params"); model_state = variables
loss_fn = task.loss_fn(model_state, None)
_, hvp = curvature.linearize_hvp(loss_fn, params, batch)
v = tree_uniform_like(params)
lams = []
for i in range(3):
    hv = hvp(v)
    lam = float(tree_vdot(hv, v))
    if lam < 0: lam = -lam; hv = tree_scale(-1.0, hv)
    lams.append(lam)
    vn = tree_axpy(1.0, tree_sub(hv, v), v)
    v = tree_scale(1.0/float(jnp.sqrt(tree_vdot(vn, vn))), vn)
print("RESULT " + __import__('json').dumps(lams))
"""


def _run(snippet):
    out = subprocess.run(
        [sys.executable, "-c", snippet], capture_output=True, text=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main(wd):
    t = _run(_TORCH_SNIPPET.format(repo=REPO, wd=wd))
    j = _run(_JAX_SNIPPET.format(repo=REPO, wd=wd))
    rels = [abs(a - b) / abs(a) for a, b in zip(t, j)]
    res = {"torch_f64": t, "jax_f64": j, "rel": rels, "max_rel": max(rels)}
    print(json.dumps(res, indent=1))
    with open(os.path.join(wd, "f64_kernel_check.json"), "w") as fh:
        json.dump(res, fh, indent=1)
    assert max(rels) < 1e-6, rels
    print("f64 kernel parity OK")


if __name__ == "__main__":
    main(sys.argv[1])
