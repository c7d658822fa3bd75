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
    data = np.load(os.path.join(workdir, "data.npz"))
    x, y = data["x_train"], data["y_train"]
    xt, yt = data["x_test"], data["y_test"]
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

        task = Task(model=DenseNet3(depth=cfg["depth"]), has_batch_stats=True)
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
    else:
        task = Task(model=CNNUSPS(), loss=cross_entropy_double_softmax)
        params = convert_usps(sd)
        optimizer = adam(cfg["lr"])
        scheduler = None
        x_model = x.reshape(-1, 16, 16, 1)

    log_dir = os.path.join(workdir, "jax_logs")
    tr = SpectralTrainer(
        task,
        optimizer,
        scheduler,
        mu=cfg["mu"],
        K=cfg["K"],
        eps=-1.0,
        pow_iter_eps=cfg["pow_iter_eps"],
        batch_size=cfg["batch_size"],
        min_iter=cfg["epochs"],
        max_iter=cfg["epochs"],
        max_pow_iter=cfg["max_pow_iter"],
        ignore_bad_vals=cfg["ignore_bad_vals"],
        verbose=True,
        header=cfg["header"],
        seed=cfg["seed"],
        log_dir=log_dir,
        model_dir=os.path.join(workdir, "jax_models"),
    )
    loader = ArrayLoader(x_model, y.astype(np.int32), batch_size=cfg["batch_size"])
    first = next(iter(loader))
    tr.init_state(first)
    # overwrite the flax init with the torch init (identical start)
    tr.params = jax.tree.map(
        lambda ref, new: jnp.asarray(new, ref.dtype),
        tr.params,
        params,
    )
    if batch_stats is not None:
        tr.model_state = jax.tree.map(
            lambda ref, new: jnp.asarray(new, ref.dtype),
            tr.model_state,
            {"batch_stats": batch_stats},
        )
    tr._np_rng = _PinnedRng()

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

    def accuracy(xa, ya):
        if cfg["task"] == "usps":
            xa = xa.reshape(-1, 16, 16, 1)
        preds = []
        for i in range(0, len(xa), 512):
            out = task.predict(
                tr.params, tr.model_state, {"x": jnp.asarray(xa[i : i + 512])}
            )
            preds.append(np.argmax(np.asarray(out), axis=1))
        return float((np.concatenate(preds) == ya).mean())

    out = {
        "epochs": rows,
        "batch_rows": batch_rows,
        "train_acc": accuracy(x, y),
        "test_acc": accuracy(xt, yt),
        "wall_time_s": wall,
        "ndim": tr.ndim,
        "platform": platform or "default",
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
