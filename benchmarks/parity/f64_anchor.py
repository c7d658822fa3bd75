"""Per-batch float64 anchor pass for the cxr f32 parity task.

The cxr f32 verdict used to rest on a 3x-chaos envelope (the matched-
batch rho gap median 1.26e-1 was judged against the reference's own
init-perturbation sensitivity).  This pass replaces the envelope with
MEASURED per-batch decomposition: during the f32 run both drivers dump
every pre-eigensolve state + batch (cfg ``dump_rho_states``); this
script then re-solves each state's eigenproblem in float64 with the
identical protocol (uniform v0 — the reference's ``random_v`` is
deterministic, opt.py:324-325 — same pow_iter_eps/max_pow_iter/alpha):

  * ``rho_t64_own[b]``  — the reference's OWN f64 oracle at its f32
    state s_t(b) (the reference's exact comp_rho code, model cast to
    double; opt.py:418-533);
  * ``rho_j64_own[b]``  — this framework's OWN f64 oracle at its f32
    state s_j(b);
  * ``rho_j64_at_ref[b]`` — this framework's f64 solve AT THE
    REFERENCE'S state (through the layout converter): cross-framework
    kernel parity along the actual visited trajectory.

From these, run_parity.compare derives the anchored verdict:
  B1 (strict, per batch): relerr(rho_j64_at_ref, rho_t64_own) —
      both frameworks compute the same rho at every visited state;
  B2: med|rho_f32 - rho_f64_own| comparable across frameworks (the f32
      deviation is symmetric rounding chaos, not a one-sided defect);
  plus the exact triangle decomposition
      |rho_j32 - rho_t32| <= d_j + div + B1_abs + d_t
  with div = |rho_j64(s_j) - rho_j64(s_t)| the TRUE state divergence.

Usage: python f64_anchor.py <workdir> --side torch|jax
"""

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))


def _states(d):
    if not os.path.isdir(d):
        return []
    return [os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.startswith("state_") and f.endswith(".npz")]


def torch_side(workdir, cfg):
    """Reference's own f64 oracle at each of ITS dumped states."""
    sys.path.insert(0, REPO)
    from benchmarks.parity import ref_driver  # installs _refenv

    import torch

    torch.set_default_dtype(torch.float64)
    torch.manual_seed(cfg["seed"])
    model, opt_, sched = ref_driver.build(cfg["task"], cfg)
    model = model.double()
    import dcnn
    import opt as ref_opt

    criterion = dcnn.W_BCEWithLogitsLoss()
    o = ref_opt.OptWBoundEignVal(
        model, criterion, opt_, scheduler=sched,
        mu=cfg["mu"], K=cfg["K"], eps=-1,
        pow_iter_eps=cfg["pow_iter_eps"],
        batch_size=cfg["batch_size"],
        min_iter=cfg["epochs"], max_iter=cfg["epochs"],
        max_pow_iter=cfg["max_pow_iter"],
        ignore_bad_vals=cfg["ignore_bad_vals"],
        rand_init=cfg.get("rand_init", False),
        gradg_clip=cfg.get("gradg_clip"),
        verbose=False, header="ANCHOR_T",
    )
    rhos = []
    for path in _states(os.path.join(workdir, "ref_states")):
        z = np.load(path)
        sd = {k[3:]: torch.from_numpy(z[k]).double()
              for k in z.files if k.startswith("sd/")}
        model.load_state_dict(sd)
        inputs = torch.from_numpy(z["batch/x"]).double()
        target = torch.from_numpy(z["batch/y"]).double()
        o.comp_rho([inputs, target])
        rhos.append(float(o.rho))
        print(f"# torch anchor {path.rsplit('_', 1)[-1]}: rho={o.rho:.8g}",
              flush=True)
    with open(os.path.join(workdir, "anchor_torch.json"), "w") as fh:
        json.dump({"rho_t64_own": rhos}, fh)


def jax_side(workdir, cfg):
    """This framework's f64 oracle at its OWN dumped states AND at the
    reference's dumped states (through the layout converter)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    sys.path.insert(0, REPO)
    from optwboundeigenval_tpu.models.cxr import DenseNet121Sigmoid
    from optwboundeigenval_tpu.ops import curvature, eigen
    from optwboundeigenval_tpu.train import Task
    from optwboundeigenval_tpu.train.task import weighted_bce_with_logits
    from optwboundeigenval_tpu.utils.tree import tree_uniform_like
    from scripts.convert_torch_weights import convert_dcnn_densenet121

    task = Task(
        model=DenseNet121Sigmoid(
            class_count=cfg.get("n_classes", 14), dtype=jnp.float64
        ),
        loss=weighted_bce_with_logits,
        has_batch_stats=True,
    )

    @jax.jit
    def _solve(variables, batch):
        params = variables.pop("params")
        model_state = variables
        loss_fn = task.loss_fn(model_state, None)
        _, hvp_fn = curvature.linearize_hvp(loss_fn, params, batch)
        eig = eigen.estimate_dominant_eig(
            hvp_fn, tree_uniform_like(params),
            eps=cfg["pow_iter_eps"], max_iter=cfg["max_pow_iter"],
            ignore_bad_vals=cfg["ignore_bad_vals"],
        )
        return eig.rho

    def solve(variables, batch):
        return float(_solve(dict(variables), batch))

    def f64_tree(flat):
        flat = {k: jnp.asarray(np.asarray(v), jnp.float64)
                for k, v in flat.items()}
        return unflatten_dict(flat, sep="/")

    own = []
    for path in _states(os.path.join(workdir, "jax_states")):
        z = np.load(path)
        variables = f64_tree(
            {k[4:]: z[k] for k in z.files if k.startswith("var/")}
        )
        batch = {k[6:]: jnp.asarray(np.asarray(z[k]), jnp.float64)
                 for k in z.files if k.startswith("batch/")}
        own.append(solve(variables, batch))
        print(f"# jax own anchor {path.rsplit('_', 1)[-1]}: "
              f"rho={own[-1]:.8g}", flush=True)

    at_ref = []
    for path in _states(os.path.join(workdir, "ref_states")):
        z = np.load(path)
        sd = {k[3:]: np.asarray(z[k], np.float64)
              for k in z.files if k.startswith("sd/")}
        variables = f64_tree(convert_dcnn_densenet121(sd))
        x = np.asarray(z["batch/x"], np.float64).transpose(0, 2, 3, 1)
        y = np.asarray(z["batch/y"], np.float64)
        batch = {
            "x": jnp.asarray(x), "y": jnp.asarray(y),
            "w": jnp.ones(x.shape[0], jnp.float64),
        }
        at_ref.append(solve(variables, batch))
        print(f"# jax at-ref anchor {path.rsplit('_', 1)[-1]}: "
              f"rho={at_ref[-1]:.8g}", flush=True)

    with open(os.path.join(workdir, "anchor_jax.json"), "w") as fh:
        json.dump({"rho_j64_own": own, "rho_j64_at_ref": at_ref}, fh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--side", required=True, choices=["torch", "jax"])
    args = ap.parse_args()
    cfg = json.load(open(os.path.join(args.workdir, "config.json")))
    if args.side == "torch":
        torch_side(args.workdir, cfg)
    else:
        jax_side(args.workdir, cfg)


if __name__ == "__main__":
    main()
