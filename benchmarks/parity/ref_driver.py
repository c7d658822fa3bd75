"""Drive the ACTUAL reference implementation (/root/reference, torch
CPU) on synthetic data for head-to-head parity measurement.

Usage: python benchmarks/parity/ref_driver.py <workdir>

Reads  <workdir>/data.npz    (x_train, y_train, x_test, y_test)
       <workdir>/config.json (task, epochs, optimizer recipe, mu/K,
                              power-iteration settings, seed)
Writes <workdir>/init_params.npz  (the torch init state_dict, so the
                                   JAX side starts from IDENTICAL weights)
       <workdir>/ref_metrics.json (per-epoch f/rho/h/norm rows parsed
                                   from the reference's own log file,
                                   per-batch verbose rho rows, final
                                   train/test accuracy, wall time)

The reference code is imported and executed as-is (no copies); batch
order is the reference's own unshuffled ``to_loader`` order, and the
end-of-epoch random batch index is pinned to ``epoch % n_batches`` on
both sides (the only stochastic choice in the training path).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from benchmarks.parity import _refenv  # noqa: E402

_refenv.install()

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn as nn  # noqa: E402


def pin_rbatch():
    """Make the epoch-end random-batch choice deterministic and
    matched across frameworks: epoch counter modulo batch count."""
    import opt as ref_opt

    counter = {"i": 0}

    def randint(a, b):
        i = counter["i"]
        counter["i"] += 1
        return a + i % (b - a + 1)

    ref_opt.random.randint = randint


def build(task_name, cfg):
    if task_name == "forest":
        from forest_data import Net

        model = Net()
        opt_ = torch.optim.SGD(model.parameters(), lr=cfg["lr"])
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt_, lr_lambda=lambda k: 1.0 / (1.0 + k)
        )
    elif task_name == "usps":
        from usps_data import CNN

        model = CNN()
        opt_ = torch.optim.Adam(model.parameters(), lr=cfg["lr"])
        sched = None
    elif task_name == "cifar":
        # cifar10_DenseNet recipe (params/cifar10_DenseNet_mu0_01_K100.py):
        # SGD momentum .9 wd 1e-4, LambdaLR 0.1^(milestones at 50%/75%)
        from densenet import DenseNet3

        model = DenseNet3(cfg.get("depth", 16), 10)
        opt_ = torch.optim.SGD(
            model.parameters(), lr=cfg["lr"], momentum=0.9, weight_decay=1e-4
        )
        epochs = cfg["epochs"]
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt_,
            lr_lambda=lambda k: 0.1
            ** ((k >= 0.5 * epochs) + (k >= 0.75 * epochs)),
        )
    else:
        raise ValueError(task_name)
    return model, opt_, sched


def accuracy(model, x, y):
    was_training = model.training
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(x))
        pred = out.argmax(dim=1).numpy()
    if was_training:
        model.train()
    return float((pred == y).mean())


def main(workdir):
    cfg = json.load(open(os.path.join(workdir, "config.json")))
    data = np.load(os.path.join(workdir, "data.npz"))
    x, y = data["x_train"], data["y_train"]
    xt, yt = data["x_test"], data["y_test"]
    if cfg["task"] == "cifar":
        # stored NHWC (the JAX-native layout); torch wants NCHW
        x = np.ascontiguousarray(x.transpose(0, 3, 1, 2))
        xt = np.ascontiguousarray(xt.transpose(0, 3, 1, 2))

    torch.manual_seed(cfg["seed"])
    np.random.seed(cfg["seed"])
    model, opt_, sched = build(cfg["task"], cfg)

    # export the torch init so the JAX side starts from identical weights
    np.savez(
        os.path.join(workdir, "init_params.npz"),
        **{k: v.numpy() for k, v in model.state_dict().items()},
    )

    if cfg.get("perturb"):
        # chaos control: perturb the init by a relative epsilon and run
        # the REFERENCE against itself — measures how much trajectory
        # divergence pure f32 sensitivity produces, as the yardstick for
        # judging cross-framework drift
        g = torch.Generator().manual_seed(cfg["seed"] + 1)
        with torch.no_grad():
            for p in model.parameters():
                p.mul_(1.0 + cfg["perturb"] * torch.randn(p.shape, generator=g))

    pin_rbatch()
    import opt as ref_opt

    os.chdir(workdir)  # reference writes ./logs and ./models in CWD
    o = ref_opt.OptWBoundEignVal(
        model,
        nn.CrossEntropyLoss(),
        opt_,
        scheduler=sched,
        mu=cfg["mu"],
        K=cfg["K"],
        eps=-1,  # no CoV early stop: fixed-epoch comparison
        pow_iter_eps=cfg["pow_iter_eps"],
        batch_size=cfg["batch_size"],
        min_iter=cfg["epochs"],
        max_iter=cfg["epochs"],
        max_pow_iter=cfg["max_pow_iter"],
        ignore_bad_vals=cfg["ignore_bad_vals"],
        verbose=True,
        header=cfg["header"],
    )
    t0 = time.time()
    try:
        o.train(
            inputs=torch.from_numpy(x),
            target=torch.from_numpy(y.astype(np.int64)),
        )
    except FileNotFoundError:
        # without a validation set the reference never writes
        # *_trained_model_best.pt, and its final test_set crashes trying
        # to load it (opt.py:1069-1077).  Training itself is complete;
        # the model holds the final-epoch weights.
        pass
    wall = time.time() - t0

    # parse the reference's own logs for the trajectory
    rows = []
    with open(o.log_file) as fh:
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
    # the verbose log interleaves per-POWER-ITERATION rows (comp_rho,
    # opt.py:443) with the per-batch rows (iter, opt.py:714-719); a
    # batch row is exactly the numeric line that follows the
    # 'Power Iter Time elapsed' stamp (epoch-end comp_g blocks are
    # followed by 'G Time elapsed' instead, so they don't match)
    batch_rows = []
    after_power_stamp = False
    with open(o.verbose_log_file) as fh:
        for line in fh:
            parts = line.split()
            if after_power_stamp and len(parts) == 5 and parts[0].isdigit():
                batch_rows.append([float(p) for p in parts])
            after_power_stamp = line.startswith("Power Iter Time elapsed")

    out = {
        "epochs": rows,
        "batch_rows": batch_rows,
        "train_acc": accuracy(model, x, y),
        "test_acc": accuracy(model, xt, yt),
        "wall_time_s": wall,
        "ndim": o.ndim,
    }
    with open("ref_metrics.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"ref done: {cfg['task']} {cfg['epochs']} epochs, "
        f"final f={rows[-1]['f']:.6f} rho={rows[-1]['rho']:.6f} "
        f"test_acc={out['test_acc']:.4f} ({wall:.1f}s)"
    )


if __name__ == "__main__":
    main(sys.argv[1])
