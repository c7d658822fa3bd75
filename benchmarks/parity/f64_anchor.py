"""Per-batch float64 anchor pass for the f32 parity tasks (cxr, cifar).

The cxr f32 verdict used to rest on a 3x-chaos envelope (the matched-
batch rho gap median 1.26e-1 was judged against the reference's own
init-perturbation sensitivity).  This pass replaces the envelope with
MEASURED per-batch decomposition: during the f32 run both drivers dump
every pre-eigensolve state + batch (cfg ``dump_rho_states``); this
script then re-solves each state's eigenproblem in float64 with the
identical protocol (uniform v0 — the reference's ``random_v`` is
deterministic, opt.py:324-325 — same pow_iter_eps/max_pow_iter/alpha):

With cfg ``anchor_warm_v`` the anchor solves WARM-START from the f32
run's own converged per-state eigenvector (the ``v/*`` arrays both
drivers dump post-solve): at a given state BOTH frameworks still use
the SAME v0 (the dumping side's), so B1 remains a same-protocol
cross-framework comparison, while each solve needs a few polish
iterations instead of a full power-iteration budget — this is what
makes the FULL-SCALE cxr anchor pass tractable on one CPU core
(the uniform-v0 protocol measured ~2.5 h there; VERDICT r04 #1).

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
    import opt as ref_opt

    if cfg["task"] == "cxr":
        import dcnn

        criterion = dcnn.W_BCEWithLogitsLoss()
    else:
        # cifar/forest/usps recipes: plain CE on (double-softmax)
        # logits — same criterion selection as ref_driver.run
        criterion = torch.nn.CrossEntropyLoss()
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
    warm = bool(cfg.get("anchor_warm_v"))
    rhos = []
    for path in _states(os.path.join(workdir, "ref_states")):
        z = np.load(path)
        sd = {k[3:]: torch.from_numpy(z[k]).double()
              for k in z.files if k.startswith("sd/")}
        model.load_state_dict(sd)
        if warm and any(k.startswith("v/") for k in z.files):
            # warm-start from the f32 run's converged eigenvector at
            # THIS state (dumped split per parameter in HVP order)
            o.rand_init = False
            o.v = torch.from_numpy(np.concatenate([
                np.asarray(z[f"v/{pname}"], np.float64).reshape(-1)
                for pname, _ in model.named_parameters()
            ])).double()
        elif warm:
            # a dump without v (pre-warm-schema): uniform protocol for
            # this state, never the previous state's leftover o.v
            o.rand_init = False
            o.v = o.random_v()
        inputs = torch.from_numpy(z["batch/x"]).double()
        if cfg["task"] == "cxr":
            target = torch.from_numpy(z["batch/y"]).double()
        else:
            # integer class labels (CrossEntropyLoss wants long)
            target = torch.from_numpy(
                np.asarray(z["batch/y"], np.int64)
            )
        iters, _, _ = o.comp_rho([inputs, target])
        rhos.append(float(o.rho))
        print(f"# torch anchor {path.rsplit('_', 1)[-1]}: rho={o.rho:.8g} "
              f"({iters + 1} iters{' warm' if warm else ''})",
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
    from optwboundeigenval_tpu.ops import curvature, eigen
    from optwboundeigenval_tpu.train import Task
    from optwboundeigenval_tpu.utils.tree import tree_uniform_like

    if cfg["task"] == "cifar":
        # cifar10_DenseNet recipe: DenseNet3 + plain CE on logits
        # (Task's default loss — same binding as jax_driver's cifar
        # branch), integer class labels
        from optwboundeigenval_tpu.models import DenseNet3
        from optwboundeigenval_tpu.utils.torch_interop import (
            convert_densenet3_state_dict,
        )

        task = Task(
            model=DenseNet3(depth=cfg["depth"], dtype=jnp.float64),
            has_batch_stats=True,
        )

        def convert_ref(sd):
            params, batch_stats = convert_densenet3_state_dict(
                sd, depth=cfg["depth"]
            )
            return {"params": params, "batch_stats": batch_stats}

        y_is_float = False
    else:
        from optwboundeigenval_tpu.models.cxr import DenseNet121Sigmoid
        from optwboundeigenval_tpu.train.task import (
            weighted_bce_with_logits,
        )
        from scripts.convert_torch_weights import (
            convert_dcnn_densenet121,
        )

        task = Task(
            model=DenseNet121Sigmoid(
                class_count=cfg.get("n_classes", 14), dtype=jnp.float64
            ),
            loss=weighted_bce_with_logits,
            has_batch_stats=True,
        )

        def convert_ref(sd):
            return unflatten_dict(convert_dcnn_densenet121(sd), sep="/")

        y_is_float = True

    warm = bool(cfg.get("anchor_warm_v"))

    @jax.jit
    def _solve(variables, batch, v0):
        params = variables.pop("params")
        model_state = variables
        loss_fn = task.loss_fn(model_state, None)
        _, hvp_fn = curvature.linearize_hvp(loss_fn, params, batch)
        eig = eigen.estimate_dominant_eig(
            hvp_fn, v0,
            eps=cfg["pow_iter_eps"], max_iter=cfg["max_pow_iter"],
            ignore_bad_vals=cfg["ignore_bad_vals"],
        )
        return eig.rho

    def solve(variables, batch, v0=None):
        if v0 is None:
            v0 = tree_uniform_like(variables["params"])
        return float(_solve(dict(variables), batch, v0))

    def f64_tree(flat):
        flat = {k: jnp.asarray(np.asarray(v), jnp.float64)
                for k, v in flat.items()}
        return unflatten_dict(flat, sep="/")

    def f64_cast(tree):
        import jax as _jax

        return _jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), tree
        )

    def load_batch(z):
        batch = {}
        for k in z.files:
            if not k.startswith("batch/"):
                continue
            name = k[6:]
            arr = np.asarray(z[k])
            if name == "y" and not y_is_float:
                batch[name] = jnp.asarray(arr)  # integer labels
            else:
                batch[name] = jnp.asarray(arr, jnp.float64)
        return batch

    own = []
    for path in _states(os.path.join(workdir, "jax_states")):
        z = np.load(path)
        variables = f64_tree(
            {k[4:]: z[k] for k in z.files if k.startswith("var/")}
        )
        v0 = None
        if warm and any(k.startswith("v/") for k in z.files):
            # this framework's own dumped post-solve eigenvector
            # (flatten_dict of the params-shaped v pytree)
            v0 = f64_tree(
                {k[2:]: z[k] for k in z.files if k.startswith("v/")}
            )
        batch = load_batch(z)
        own.append(solve(variables, batch, v0))
        print(f"# jax own anchor {path.rsplit('_', 1)[-1]}: "
              f"rho={own[-1]:.8g}", flush=True)

    at_ref = []
    for path in _states(os.path.join(workdir, "ref_states")):
        z = np.load(path)
        sd = {k[3:]: np.asarray(z[k], np.float64)
              for k in z.files if k.startswith("sd/")}
        variables = f64_cast(convert_ref(sd))
        v0 = None
        if warm and any(k.startswith("v/") for k in z.files):
            # the REFERENCE's dumped eigenvector, mapped to the flax
            # layout by the SAME converter as the params (pure
            # transposes/reshapes, so <v, Hv> semantics carry over):
            # overlay the per-param v chunks onto the state_dict and
            # keep the converter's params outputs
            vsd = {k: np.asarray(z[f"v/{k}"], np.float64)
                   if f"v/{k}" in z.files else v_
                   for k, v_ in sd.items()}
            v0 = f64_cast(convert_ref(vsd)["params"])
        x = np.asarray(z["batch/x"], np.float64).transpose(0, 2, 3, 1)
        if y_is_float:
            y = jnp.asarray(np.asarray(z["batch/y"]), jnp.float64)
        else:
            y = jnp.asarray(np.asarray(z["batch/y"], np.int64))
        batch = {
            "x": jnp.asarray(x), "y": y,
            "w": jnp.ones(x.shape[0], jnp.float64),
        }
        at_ref.append(solve(variables, batch, v0))
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
