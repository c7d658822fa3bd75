"""Drive SpectralTrainer on the SAME data / init / recipe as
ref_driver.py, for head-to-head parity measurement.

Usage: python benchmarks/parity/jax_driver.py <workdir> [platform]

Reads  <workdir>/data.npz, config.json, init_params.npz (torch init)
Writes <workdir>/jax_metrics.json

Parity controls mirrored from the reference side:
  * identical initial weights (torch state_dict -> flax layout via
    utils/torch_interop);
  * the reference's EXACT loss composition (softmax-in-model +
    CrossEntropyLoss == cross_entropy_double_softmax on logits);
  * unshuffled loader (reference to_loader, opt.py:871-878);
  * epoch-end random batch pinned to epoch % n_batches on both sides.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np  # noqa: E402


def _force_platform(platform):
    os.environ.setdefault("JAX_DISABLE_COMPILATION_CACHE", "1")
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)


def convert_forest(sd):
    from optwboundeigenval_tpu.utils.torch_interop import (
        convert_forestnet_state_dict,
    )

    return convert_forestnet_state_dict(sd)


def convert_usps(sd):
    from optwboundeigenval_tpu.utils.torch_interop import (
        convert_cnnusps_state_dict,
    )

    return convert_cnnusps_state_dict(sd)


class _PinnedRng:
    """Deterministic stand-in for the trainer's epoch-end random-batch
    draw: epoch counter modulo batch count (matched to ref_driver's
    pinned ``random.randint``)."""

    def __init__(self):
        self.i = 0

    def integers(self, low, high):
        v = low + self.i % max(high - low, 1)
        self.i += 1
        return v


def main(workdir, platform="cpu"):
    _force_platform(platform)
    import jax
    import jax.numpy as jnp

    from optwboundeigenval_tpu.data.loaders import ArrayLoader
    from optwboundeigenval_tpu.models import CNNUSPS, ForestNet
    from optwboundeigenval_tpu.optim import adam, sgd
    from optwboundeigenval_tpu.optim.schedules import LambdaLR
    from optwboundeigenval_tpu.train import SpectralTrainer, Task
    from optwboundeigenval_tpu.train.task import cross_entropy_double_softmax

    cfg = json.load(open(os.path.join(workdir, "config.json")))
    if cfg.get("f64"):
        # cxr_f64 strict run: float64 end to end (params arrive as f64
        # from the ref export; x64 makes every traced literal, the
        # eigensolver state, and the optimizer buffers f64 too)
        jax.config.update("jax_enable_x64", True)
    data = np.load(os.path.join(workdir, "data.npz"))
    x, y = data["x_train"], data["y_train"]
    xt, yt = data["x_test"], data["y_test"]
    if cfg.get("f64"):
        x, xt = x.astype(np.float64), xt.astype(np.float64)
        y, yt = y.astype(np.float64), yt.astype(np.float64)
    sd = dict(np.load(os.path.join(workdir, "init_params.npz")))

    batch_stats = None
    if cfg["task"] == "forest":
        task = Task(model=ForestNet(), loss=cross_entropy_double_softmax)
        params = convert_forest(sd)
        optimizer = sgd(cfg["lr"])
        scheduler = LambdaLR(cfg["lr"], lambda k: 1.0 / (1.0 + k))
        x_model = x
    elif cfg["task"] == "cifar":
        # cifar10_DenseNet recipe: plain CE on logits, SGD momentum .9
        # wd 1e-4, LambdaLR milestone drops — BatchNorm model, so this
        # task proves BN-inside-the-Hessian parity end to end
        from optwboundeigenval_tpu.models import DenseNet3
        from optwboundeigenval_tpu.utils.torch_interop import (
            convert_densenet3_state_dict,
        )

        task = Task(
            model=DenseNet3(
                depth=cfg["depth"],
                dtype=jnp.float64 if cfg.get("f64") else jnp.float32,
            ),
            has_batch_stats=True,
        )
        params, batch_stats = convert_densenet3_state_dict(
            sd, depth=cfg["depth"]
        )
        optimizer = sgd(cfg["lr"], momentum=0.9, weight_decay=1e-4)
        epochs = cfg["epochs"]
        scheduler = LambdaLR(
            cfg["lr"],
            lambda k: 0.1 ** ((k >= 0.5 * epochs) + (k >= 0.75 * epochs)),
        )
        x_model = x  # NHWC already
    elif cfg["task"] == "cxr":
        # chestxray_best_reg recipe at 64px: DenseNet121 + in-model
        # Sigmoid, W-BCE-with-logits ON the sigmoid outputs (the
        # reference's exact double-sigmoid composition,
        # dcnn.py:255-265 + dcnn.py:375-400), Adam lr 1e-5 COUPLED
        # wd 1e-5, ReduceLROnPlateau(patience=5), rand_init +
        # gradg_clip=100
        from optwboundeigenval_tpu.models.backbones import (
            load_pretrained_npz,
        )
        from optwboundeigenval_tpu.models.cxr import DenseNet121Sigmoid
        from optwboundeigenval_tpu.optim.schedules import ReduceLROnPlateau
        from optwboundeigenval_tpu.train.task import (
            weighted_bce_with_logits,
        )
        from scripts.convert_torch_weights import convert_dcnn_densenet121

        task = Task(
            model=DenseNet121Sigmoid(
                class_count=cfg.get("n_classes", 14),
                dtype=jnp.float64 if cfg.get("f64") else jnp.float32,
            ),
            loss=weighted_bce_with_logits,
            has_batch_stats=True,
        )
        converted = convert_dcnn_densenet121(sd)
        npz = os.path.join(workdir, "converted_init.npz")
        np.savez(npz, **converted)
        params = None  # overlaid below via load_pretrained_npz
        optimizer = adam(cfg["lr"], weight_decay=cfg["weight_decay"])
        scheduler = ReduceLROnPlateau(cfg["lr"], patience=5)
        x_model = x  # NHWC already
        if not cfg.get("f64"):
            y = y.astype(np.float32)
    else:
        task = Task(model=CNNUSPS(), loss=cross_entropy_double_softmax)
        params = convert_usps(sd)
        if cfg.get("optimizer") == "kfac":
            # usps_CNN_KFAC recipe: K-FAC as the TRAINING optimizer with
            # the TCov/TInv refresh scheduling (kfac.py:175-191)
            from optwboundeigenval_tpu.optim import KFAC

            optimizer = KFAC(
                lr=cfg["lr"], TCov=cfg["TCov"], TInv=cfg["TInv"],
                kfac_rand=cfg.get("kfac_rand", True),
            )
        else:
            optimizer = adam(cfg["lr"])
        scheduler = None
        x_model = x.reshape(-1, 16, 16, 1)

    extra = {}
    if cfg.get("lobpcg"):
        extra.update(
            lobpcg=True,
            kfac_batch=cfg["kfac_batch"],
            kfac_rand=cfg["kfac_rand"],
        )
    if cfg.get("alpha_exp"):
        # alpha(k)=exp(-4k-2) (params/forest_lobpcg.py:33-34); k is a
        # traced iteration index inside lax.while_loop, so jnp
        extra["pow_iter_alpha"] = lambda k: jnp.exp(-4.0 * k - 2.0)

    log_dir = os.path.join(workdir, "jax_logs")
    tr = SpectralTrainer(
        task,
        optimizer,
        scheduler,
        **extra,
        mu=cfg["mu"],
        K=cfg["K"],
        eps=-1.0,
        pow_iter_eps=cfg["pow_iter_eps"],
        batch_size=cfg["batch_size"],
        min_iter=cfg["epochs"],
        max_iter=cfg["epochs"],
        max_pow_iter=cfg["max_pow_iter"],
        ignore_bad_vals=cfg["ignore_bad_vals"],
        rand_init=cfg.get("rand_init", False),
        gradg_clip=cfg.get("gradg_clip"),
        verbose=True,
        header=cfg["header"],
        seed=cfg["seed"],
        log_dir=log_dir,
        model_dir=os.path.join(workdir, "jax_models"),
    )
    y_loader = y if cfg["task"] == "cxr" else y.astype(np.int32)
    loader = ArrayLoader(x_model, y_loader, batch_size=cfg["batch_size"])
    first = next(iter(loader))
    tr.init_state(first)
    # overwrite the flax init with the torch init (identical start)
    if params is None:
        # cxr: overlay the converted dcnn.DenseNet121 npz onto the full
        # variables tree, asserting EXACT coverage both directions
        from flax.traverse_util import flatten_dict, unflatten_dict

        loaded = dict(np.load(os.path.join(workdir, "converted_init.npz")))
        variables = {"params": tr.params, **tr.model_state}
        flat = flatten_dict(variables, sep="/")
        missing = [k for k in flat if k not in loaded]
        unexpected = [k for k in loaded if k not in flat]
        assert not missing and not unexpected, (missing[:5], unexpected[:5])
        for k in flat:
            assert loaded[k].shape == flat[k].shape, (k, loaded[k].shape,
                                                      flat[k].shape)
            # f64 runs: the flax init is f32 (param_dtype default), so
            # keep the torch export's float64 instead of the init dtype
            flat[k] = jnp.asarray(
                loaded[k],
                jnp.float64 if cfg.get("f64") else flat[k].dtype,
            )
        variables = unflatten_dict(flat, sep="/")
        tr.params = variables.pop("params")
        tr.model_state = variables
    else:
        # f64 runs: the flax init is f32 (param_dtype default even when
        # the compute dtype is f64), so keep the torch export's float64
        # instead of inheriting the init dtype
        tr.params = jax.tree.map(
            lambda ref, new: jnp.asarray(
                new, jnp.float64 if cfg.get("f64") else ref.dtype
            ),
            tr.params,
            params,
        )
    if batch_stats is not None:
        tr.model_state = jax.tree.map(
            lambda ref, new: jnp.asarray(
                new, jnp.float64 if cfg.get("f64") else ref.dtype
            ),
            tr.model_state,
            {"batch_stats": batch_stats},
        )
    if cfg.get("f64"):
        # rebuild the param-shaped solver/optimizer state in f64
        # (init_state derived both from the f32 flax init)
        from optwboundeigenval_tpu.utils.tree import tree_uniform_like

        tr.opt_state = jax.jit(tr.optimizer.init)(tr.params)
        tr.v = jax.jit(tree_uniform_like)(tr.params)
    tr._np_rng = _PinnedRng()

    if cfg.get("dump_rho_states"):
        # f64-anchor support (f64_anchor.py): snapshot the PRE-step
        # variables + the batch before every train_step, in call order
        # (matching the reference's comp_rho call order: per-batch
        # comp_g plus the pinned epoch-end random-batch comp_g).  The
        # anchor pass re-solves each state's eigenproblem in float64.
        from flax.traverse_util import flatten_dict

        sdir = os.path.join(workdir, "jax_states")
        os.makedirs(sdir, exist_ok=True)
        dump_counter = {"i": 0}
        orig_step_d = tr.train_step

        def dumping_step(batch, **kw):
            variables = {"params": tr.params, **tr.model_state}
            flat = {
                f"var/{k}": np.asarray(v)
                for k, v in flatten_dict(variables, sep="/").items()
            }
            flat.update(
                {f"batch/{k}": np.asarray(v) for k, v in batch.items()}
            )
            out = orig_step_d(batch, **kw)
            # POST-step converged eigenvector (the solve ran at the
            # PRE-step params dumped above; the param update happens
            # after it inside the step) — the f64 anchor warm-start
            flat.update(
                {f"v/{k}": np.asarray(v)
                 for k, v in flatten_dict(tr.v, sep="/").items()}
            )
            np.savez(
                os.path.join(sdir, f"state_{dump_counter['i']:03d}.npz"),
                **flat,
            )
            dump_counter["i"] += 1
            return out

        tr.train_step = dumping_step

    if cfg.get("v_noise"):
        # control run: inject a relative perturbation into the warm-start
        # eigenvector after every committed step.  Comparing this run
        # against the clean jax run measures how much the truncated
        # damped v-recursion amplifies per-step noise at the measured
        # cross-framework kernel-difference level — the yardstick for
        # judging rho drift that the params-perturbation chaos control
        # cannot see (it perturbs params, not the solver state).
        scale = float(cfg["v_noise"])
        noise_rng = np.random.default_rng(20260817)
        orig_step = tr.train_step

        def noisy_step(batch, **kw):
            out = orig_step(batch, **kw)
            tr.v = jax.tree.map(
                lambda a: a
                * (
                    1.0
                    + scale
                    * jnp.asarray(
                        noise_rng.standard_normal(a.shape), a.dtype
                    )
                ),
                tr.v,
            )
            return out

        tr.train_step = noisy_step

    t0 = time.time()
    tr.train(train_loader=loader)
    wall = time.time() - t0

    rows = []
    with open(tr.log_file) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) == 5 and parts[0].isdigit():
                rows.append(
                    dict(
                        zip(
                            ("epoch", "f", "rho", "h", "norm"),
                            [int(parts[0])] + [float(p) for p in parts[1:]],
                        )
                    )
                )
    batch_rows = []
    with open(tr.verbose_log_file) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) == 5 and parts[0].isdigit():
                batch_rows.append([float(p) for p in parts])

    def _outputs(xa, chunk=512):
        outs = []
        for i in range(0, len(xa), chunk):
            out = task.predict(
                tr.params, tr.model_state, {"x": jnp.asarray(xa[i : i + chunk])}
            )
            outs.append(np.asarray(out))
        return np.concatenate(outs)

    def accuracy(xa, ya):
        if cfg["task"] == "usps":
            xa = xa.reshape(-1, 16, 16, 1)
        if cfg["task"] == "cxr":
            # per-class ROC-AUC with NaN masking, mean over computable
            # classes — identical protocol to ref_driver.mean_auc
            from sklearn.metrics import roc_auc_score

            out = _outputs(xa, chunk=64)
            aucs = []
            for c in range(ya.shape[1]):
                m = ~np.isnan(ya[:, c])
                if len(np.unique(ya[m, c])) < 2:
                    continue
                aucs.append(roc_auc_score(ya[m, c], out[m, c]))
            return float(np.mean(aucs))
        return float((np.argmax(_outputs(xa), axis=1) == ya).mean())

    def param_drift():
        """Relative L2 distance between our final params and the
        reference's, through the same layout converter used for the
        init — quantifies how far the two trajectories actually moved
        apart in parameter space."""
        fp = os.path.join(workdir, "final_params.npz")
        if not os.path.exists(fp):
            return None
        sdf = dict(np.load(fp))
        if cfg["task"] == "forest":
            pf = convert_forest(sdf)
        elif cfg["task"] == "usps":
            pf = convert_usps(sdf)
        elif cfg["task"] == "cifar":
            from optwboundeigenval_tpu.utils.torch_interop import (
                convert_densenet3_state_dict,
            )

            pf, _ = convert_densenet3_state_dict(sdf, depth=cfg["depth"])
        else:  # cxr
            from flax.traverse_util import flatten_dict

            from scripts.convert_torch_weights import (
                convert_dcnn_densenet121,
            )

            conv = convert_dcnn_densenet121(sdf)
            flat = flatten_dict({"params": tr.params}, sep="/")
            num = den = 0.0
            for k, v in flat.items():
                a = np.asarray(conv[k], np.float64)
                b = np.asarray(v, np.float64)
                num += float(((b - a) ** 2).sum())
                den += float((a**2).sum())
            return float(np.sqrt(num) / max(np.sqrt(den), 1e-30))
        from jax.flatten_util import ravel_pytree

        a, _ = ravel_pytree(jax.tree.map(jnp.asarray, pf))
        b, _ = ravel_pytree(tr.params)
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(
            np.linalg.norm(b - a) / max(np.linalg.norm(a), 1e-30)
        )

    out = {
        "epochs": rows,
        "batch_rows": batch_rows,
        "train_acc": accuracy(x, y),
        "test_acc": accuracy(xt, yt),
        "wall_time_s": wall,
        "ndim": tr.ndim,
        "platform": platform or "default",
        "param_drift_rel": param_drift(),
    }
    with open(os.path.join(workdir, "jax_metrics.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"jax done: {cfg['task']} {cfg['epochs']} epochs, "
        f"final f={rows[-1]['f']:.6f} rho={rows[-1]['rho']:.6f} "
        f"test_acc={out['test_acc']:.4f} ({wall:.1f}s)"
    )


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "cpu")
