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


class ComposedBN2d(nn.Module):
    """nn.BatchNorm2d's exact train/eval math composed from torch
    primitives (mean/var/rsqrt) so autograd derives EVERY order of
    derivative — unlike the native module, whose hand-written
    double-backward is not third-order exact (the vGHv defect pinned by
    tests/test_parity_reference.py::test_bn_triple_backward_exactness).
    state_dict-compatible with nn.BatchNorm2d (same parameter/buffer
    names, same running-stat update incl. the unbiased-variance
    correction), so the torch→flax converter works unchanged."""

    def __init__(self, c, eps=1e-5, momentum=0.1):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.register_buffer("running_mean", torch.zeros(c))
        self.register_buffer("running_var", torch.ones(c))
        self.register_buffer(
            "num_batches_tracked", torch.tensor(0, dtype=torch.long)
        )
        self.eps = eps
        self.momentum = momentum

    def forward(self, z):
        if self.training:
            mu = z.mean(dim=(0, 2, 3))
            var = ((z - mu.view(1, -1, 1, 1)) ** 2).mean(dim=(0, 2, 3))
            with torch.no_grad():
                n = z.numel() / z.shape[1]
                self.running_mean.mul_(1 - self.momentum).add_(
                    self.momentum * mu
                )
                self.running_var.mul_(1 - self.momentum).add_(
                    self.momentum * var * n / (n - 1)
                )
                self.num_batches_tracked += 1
            m, v = mu, var
        else:
            m, v = self.running_mean, self.running_var
        zhat = (z - m.view(1, -1, 1, 1)) * torch.rsqrt(
            v.view(1, -1, 1, 1) + self.eps
        )
        return zhat * self.weight.view(1, -1, 1, 1) + self.bias.view(
            1, -1, 1, 1
        )


def _swap_bn(mod):
    for name, child in mod.named_children():
        if isinstance(child, nn.BatchNorm2d):
            new = ComposedBN2d(
                child.num_features, eps=child.eps, momentum=child.momentum
            )
            new.load_state_dict(child.state_dict())
            setattr(mod, name, new)
        else:
            _swap_bn(child)


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
        if cfg.get("optimizer") == "kfac":
            # usps_CNN_KFAC recipe: the reference's own KFACOptimizer as
            # the TRAINING optimizer (kfac.py:12-23), with the in-loop
            # comp_fisher refresh every TCov steps (opt.py:644-651)
            from kfac import KFACOptimizer

            opt_ = KFACOptimizer(
                model, lr=cfg["lr"], TCov=cfg["TCov"], TInv=cfg["TInv"]
            )
        else:
            opt_ = torch.optim.Adam(model.parameters(), lr=cfg["lr"])
        sched = None
    elif task_name == "cifar":
        # cifar10_DenseNet recipe (params/cifar10_DenseNet_mu0_01_K100.py):
        # SGD momentum .9 wd 1e-4, LambdaLR 0.1^(milestones at 50%/75%)
        from densenet import DenseNet3

        model = DenseNet3(cfg.get("depth", 16), 10)
        if cfg.get("composed_bn"):
            # swap BEFORE the optimizer captures model.parameters()
            _swap_bn(model)
            assert not any(
                isinstance(m, nn.BatchNorm2d) for m in model.modules()
            )
        if cfg.get("f64"):
            # cifar_f64 strict run: same grad_dtype escape as the cxr
            # branch — the reference hard-casts the assembled direction
            # to f32 (`param.grad = p[i:i+n].view(s).float()`,
            # opt.py:658) and torch rejects an f32 grad on an f64 param
            model = model.double()
            for p in model.parameters():
                p.grad_dtype = torch.float32
        opt_ = torch.optim.SGD(
            model.parameters(), lr=cfg["lr"], momentum=0.9, weight_decay=1e-4
        )
        epochs = cfg["epochs"]
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt_,
            lr_lambda=lambda k: 0.1
            ** ((k >= 0.5 * epochs) + (k >= 0.75 * epochs)),
        )
    elif task_name == "cxr":
        # chestxray_best_reg recipe (params/chestxray_best_reg.py:
        # 105-147): dens121 + Sigmoid head, W-BCE-with-logits on the
        # sigmoid outputs (the reference's double-sigmoid composition),
        # Adam lr 1e-5 wd 1e-5, ReduceLROnPlateau(patience=5),
        # rand_init + gradg_clip — run here at 64px on the dnet fork
        # (dcnn.DenseNet121 with isTrained=False: the pretrained
        # download is environment-blocked, trains from scratch)
        import dcnn

        model = dcnn.DenseNet121(cfg.get("n_classes", 14), isTrained=False)
        if cfg.get("composed_bn"):
            # cxr_f64: remove the native-BN vGHv defect from the
            # counterparty (swap BEFORE the optimizer captures params)
            _swap_bn(model)
            assert not any(
                isinstance(m, nn.BatchNorm2d) for m in model.modules()
            )
        if cfg.get("f64"):
            model = model.double()
            # The reference CANNOT train a double model as-is: iter()
            # hard-casts the assembled direction to f32 before
            # assigning it (`param.grad = p[i:i+n].view(s).float()`,
            # opt.py:658), and torch rejects an f32 grad on an f64
            # param.  grad_dtype is torch's sanctioned escape; the
            # reference's applied direction then still carries ITS OWN
            # f32 rounding (~6e-8 rel — invisible at the 1e-3
            # criteria, and not mirrored on the jax side, which keeps
            # the direction in f64).
            for p in model.parameters():
                p.grad_dtype = torch.float32
        opt_ = torch.optim.Adam(
            model.parameters(), lr=cfg["lr"], weight_decay=cfg["weight_decay"]
        )
        sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt_, patience=5)
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


def mean_auc(model, x, y, batch=16):
    """Per-class ROC-AUC with NaN-label masking, mean over computable
    classes — the reference's 'auc' test protocol (opt.py:1001-1028),
    computed identically in both drivers (monotone sigmoid dropped:
    AUC-invariant)."""
    from sklearn.metrics import roc_auc_score

    was_training = model.training
    model.eval()
    outs = []
    with torch.no_grad():
        for i in range(0, len(x), batch):
            outs.append(model(torch.from_numpy(x[i : i + batch])).numpy())
    if was_training:
        model.train()
    out = np.concatenate(outs)
    aucs = []
    for c in range(y.shape[1]):
        m = ~np.isnan(y[:, c])
        if len(np.unique(y[m, c])) < 2:
            continue
        aucs.append(roc_auc_score(y[m, c], out[m, c]))
    return float(np.mean(aucs))


def main(workdir):
    cfg = json.load(open(os.path.join(workdir, "config.json")))
    data = np.load(os.path.join(workdir, "data.npz"))
    x, y = data["x_train"], data["y_train"]
    xt, yt = data["x_test"], data["y_test"]
    if cfg["task"] in ("cifar", "cxr"):
        # stored NHWC (the JAX-native layout); torch wants NCHW
        x = np.ascontiguousarray(x.transpose(0, 3, 1, 2))
        xt = np.ascontiguousarray(xt.transpose(0, 3, 1, 2))

    if cfg.get("f64"):
        # float64 end to end: params, data, and every tensor the
        # reference creates internally (random_v, penalty scalars, ...)
        torch.set_default_dtype(torch.float64)
        x, xt = x.astype(np.float64), xt.astype(np.float64)

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

    if cfg["task"] == "cxr":
        import dcnn

        criterion = dcnn.W_BCEWithLogitsLoss()
        target = torch.from_numpy(
            y.astype(np.float64 if cfg.get("f64") else np.float32)
        )
    else:
        criterion = nn.CrossEntropyLoss()
        target = torch.from_numpy(y.astype(np.int64))

    extra = {}
    if cfg.get("lobpcg"):
        # forest_lobpcg recipe: K-FAC-preconditioned eigensolve with the
        # kfac_batch refresh cadence (opt.py:426-430); kfac_rand=False
        # keeps the Fisher on true targets (deterministic)
        extra.update(
            lobpcg=True,
            kfac_batch=cfg["kfac_batch"],
            kfac_rand=cfg["kfac_rand"],
        )
    if cfg.get("alpha_exp"):
        # damped power-iteration step size alpha(k)=exp(-4k-2)
        # (params/forest_lobpcg.py:33-34)
        extra["pow_iter_alpha"] = lambda k: np.exp(-4 * k - 2)

    os.chdir(workdir)  # reference writes ./logs and ./models in CWD
    o = ref_opt.OptWBoundEignVal(
        model,
        criterion,
        opt_,
        scheduler=sched,
        **extra,
        mu=cfg["mu"],
        K=cfg["K"],
        eps=-1,  # no CoV early stop: fixed-epoch comparison
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
    )
    if cfg.get("dump_rho_states"):
        # f64-anchor support (f64_anchor.py): snapshot the model state
        # + the batch before every comp_rho, in call order (per-batch
        # comp_g at opt.py:618 plus the pinned epoch-end comp_g at
        # opt.py:740 — the anchor combine step pairs these with the
        # jax dumps by index arithmetic).
        sdir = os.path.join(workdir, "ref_states")
        os.makedirs(sdir, exist_ok=True)
        dump_counter = {"i": 0}
        orig_comp_rho = o.comp_rho

        def dumping_comp_rho(data, p=False):
            inputs_d, target_d = data
            arrays = {
                f"sd/{k}": v.detach().cpu().numpy()
                for k, v in o.model.state_dict().items()
            }
            arrays["batch/x"] = inputs_d.detach().cpu().numpy()
            arrays["batch/y"] = target_d.detach().cpu().numpy()
            out = orig_comp_rho(data, p)
            # POST-solve converged eigenvector (opt.py:508), split per
            # parameter in the HVP flattening order (model.parameters(),
            # opt.py:102): the f64 anchor pass warm-starts its re-solve
            # from this, cutting each anchor solve from a full power-
            # iteration budget to a few polish iterations
            vec = o.v.detach().cpu().numpy()
            off = 0
            for pname, prm in o.model.named_parameters():
                n = prm.numel()
                arrays[f"v/{pname}"] = (
                    vec[off:off + n].reshape(tuple(prm.shape))
                )
                off += n
            np.savez(
                os.path.join(sdir, f"state_{dump_counter['i']:03d}.npz"),
                **arrays,
            )
            dump_counter["i"] += 1
            return out

        o.comp_rho = dumping_comp_rho

    t0 = time.time()
    try:
        o.train(
            inputs=torch.from_numpy(x),
            target=target,
        )
    except FileNotFoundError:
        # without a validation set the reference never writes
        # *_trained_model_best.pt, and its final test_set crashes trying
        # to load it (opt.py:1069-1077).  Training itself is complete;
        # the model holds the final-epoch weights.
        pass
    wall = time.time() - t0

    # final weights, so the jax side can measure cross-framework
    # parameter drift (CWD is workdir here)
    np.savez(
        "final_params.npz",
        **{k: v.numpy() for k, v in model.state_dict().items()},
    )

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

    metric = mean_auc if cfg["task"] == "cxr" else accuracy
    out = {
        "epochs": rows,
        "batch_rows": batch_rows,
        "train_acc": metric(model, x, y),
        "test_acc": metric(model, xt, yt),
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
