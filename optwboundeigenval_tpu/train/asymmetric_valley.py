"""Asymmetric Valley trainer: SWA averaging + SGD/SWA interpolation
sweep.

Capability parity with reference ``AsymmetricValley``
(asymmetric_valley.py:15-345), a subclass of the driver replacing the
epoch step:

  * trapezoid SWA LR schedule (``schedule``, asymmetric_valley.py:43-52);
  * plain (unregularized) train epochs (``train_epoch``, :265-308);
  * from ``swa_start``: running average of weights into the SWA model
    with ``1/(n+1)`` mixing (``moving_average``, :446-449) and periodic
    BatchNorm-statistics recomputation (``bn_update``, :488-523);
  * from ``sgd_start``: ``iter2`` (:71-89) hunts for an SGD point with
    lower train loss but higher validation loss than the SWA point;
  * final linear interpolation sweep over
    ``distances*2 + division_part + 1`` points between the SGD and SWA
    solutions, evaluating train/valid loss+acc at each (with bn_update
    per point) and saving txt + 4 plots (``interpolation``, :91-156);
  * epoch-keyed full checkpoints {state_dict, swa_state_dict, swa_n,
    optimizer} (``save_checkpoint``, :436-443).

TPU-native: model weights are pytrees, so ``parameters_to_vector`` /
``vector_to_parameters`` (asymmetric_valley.py:353-399) disappear — the
interpolation is a pytree axpy; bn_update extracts per-batch statistics
from flax BatchNorm updates and cumulatively averages them (the
reference's ``momentum = 1/(i+1)`` scheme).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from optwboundeigenval_tpu.train import checkpoints
from optwboundeigenval_tpu.train.trainer import SpectralTrainer, _as_loader


def bn_update(task, params, model_state, loader, put_batch):
    """Recompute BatchNorm running stats as the cumulative average of
    per-batch statistics (reference bn_update,
    asymmetric_valley.py:488-523).  No-op for BN-free models."""
    if not task.has_batch_stats or not model_state:
        return model_state
    zero_state = jax.tree.map(jnp.zeros_like, model_state)
    ones_state = jax.tree.map(jnp.ones_like, model_state)

    acc = None
    n = 0

    @jax.jit
    def probe_momentum(params, batch):
        # EMA update is new = m*old + (1-m)*stat; from old=0 the write is
        # (1-m)*stat, from old=1 it gains +m — so m = new1 - new0 exactly,
        # per leaf (models in this repo use momentum=0.9, flax's default
        # is 0.99; probing handles both AND mixed momenta across layers)
        _, upd0 = task.model.apply(
            {"params": params, **zero_state}, batch["x"], train=True,
            mutable=["batch_stats"],
        )
        _, upd1 = task.model.apply(
            {"params": params, **ones_state}, batch["x"], train=True,
            mutable=["batch_stats"],
        )
        return jax.tree.map(lambda u1, u0: u1 - u0, upd1, upd0)

    @jax.jit
    def batch_stats_of(params, batch, m_tree):
        variables = {"params": params, **zero_state}
        _, updates = task.model.apply(
            variables, batch["x"], train=True, mutable=["batch_stats"]
        )
        # new = m*0 + (1-m)*stat  =>  stat = new/(1-m)
        return jax.tree.map(
            lambda u, m: u / jnp.maximum(1.0 - m, 1e-6), updates, m_tree
        )

    m_tree = None
    for data in loader:
        batch = put_batch(data)
        if m_tree is None:
            m_tree = probe_momentum(params, batch)
        stats = batch_stats_of(params, batch, m_tree)
        if acc is None:
            acc = stats
        else:
            acc = jax.tree.map(lambda a, s: a + (s - a) / (n + 1), acc, stats)
        n += 1
    if acc is None:
        return model_state
    return {**model_state, **acc}


class AsymmetricValleyTrainer(SpectralTrainer):
    def __init__(
        self,
        task,
        optimizer,
        scheduler=None,
        *,
        swa: bool = True,
        swa_start: int = 161,
        sgd_start: int = 201,
        swa_c_epochs: int = 1,
        swa_lr: float = 0.05,
        eval_freq: int = 5,
        save_freq: int = 5,
        division_part: int = 40,
        distances: int = 20,
        max_iter: int = 250,
        **kw,
    ):
        super().__init__(task, optimizer, scheduler, max_iter=max_iter, **kw)
        self.swa = swa
        self.swa_start = swa_start
        self.sgd_start = sgd_start
        self.swa_c_epochs = swa_c_epochs
        self.swa_lr = swa_lr
        self.eval_freq = eval_freq
        self.save_freq = save_freq
        self.division_part = division_part
        self.distances = distances
        self.swa_params = None
        self.swa_model_state = None
        self.swa_n = 0
        self.lr_init: Optional[float] = None
        self.swa_path: Optional[str] = None
        self.sgd_path: Optional[str] = None
        self.train_res_swa = None
        self.valid_res_swa = None
        self.plot_dir = "./plots"

    # ------------------------------------------------------------------
    def schedule_lr(self) -> float:
        """Trapezoid schedule (asymmetric_valley.py:43-52)."""
        t = self.i / (self.swa_start if self.swa else self.max_iter)
        lr_ratio = (self.swa_lr / self.lr_init) if self.swa else 0.01
        if t <= 0.5:
            factor = 1.0
        elif t <= 0.9:
            factor = 1.0 - (1.0 - lr_ratio) * (t - 0.5) / 0.4
        else:
            factor = lr_ratio
        return self.lr_init * factor

    def _build_plain_step(self):
        def step(params, model_state, opt_state, batch, rng):
            loss_fn = self._loss_fn(model_state, rng)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            grad_fn = lambda p: jax.value_and_grad(loss_fn)(p, batch)
            new_params, new_opt_state = self.optimizer.step(
                grads, opt_state, params, grad_fn=grad_fn, rng=rng
            )
            if self.task.has_batch_stats:
                _, new_model_state = self.task.train_loss(
                    new_params, model_state, batch, rng
                )
            else:
                new_model_state = model_state
            return new_params, new_model_state, new_opt_state, loss

        return jax.jit(step)

    def train_epoch(self, loader) -> dict:
        """Plain SGD epoch (asymmetric_valley.py:265-308): returns
        weighted train loss + accuracy."""
        step = self._get("plain_step", self._build_plain_step)
        loss_sum, n_sum = 0.0, 0.0
        for data in loader:
            batch = self._put_batch(data)
            self.rng, r = jax.random.split(self.rng)
            self.params, self.model_state, self.opt_state, loss = step(
                self.params, self.model_state, self.opt_state, batch, r
            )
            bw = float(np.sum(data["w"]))
            loss_sum += float(loss) * bw
            n_sum += bw
        self.f = loss_sum / max(n_sum, 1.0)
        acc = self.evaluate(loader)["accuracy"]
        return {"loss": self.f, "accuracy": acc}

    def evaluate(self, loader, params=None, model_state=None) -> dict:
        eval_step = self._get("eval_step", self._build_eval_step)
        params = self.params if params is None else params
        model_state = self.model_state if model_state is None else model_state
        loss_sum, correct, n_sum = 0.0, 0.0, 0.0
        for data in loader:
            batch = self._put_batch(data)
            loss, out = eval_step(params, model_state, batch)
            w = np.asarray(data["w"])
            nreal = int(np.sum(w > 0))
            pred = np.argmax(np.asarray(out)[:nreal], axis=1)
            correct += float(np.sum(pred == np.asarray(data["y"])[:nreal]))
            loss_sum += float(loss) * nreal
            n_sum += nreal
        return {
            "loss": loss_sum / max(n_sum, 1.0),
            "accuracy": correct / max(n_sum, 1.0) * 100.0,
        }

    # ------------------------------------------------------------------
    def _save_full(self, tag: str) -> str:
        path = os.path.join(self.model_dir, f"{self.header2}_av_{tag}.msgpack")
        checkpoints.save_checkpoint(
            path,
            {
                "state_dict": {"params": self.params,
                               "model_state": self.model_state},
                "swa_state_dict": {
                    "params": self.swa_params,
                    "model_state": self.swa_model_state,
                }
                if self.swa
                else {},
                "swa_n": np.asarray(self.swa_n),
                "epoch": np.asarray(self.i),
            },
        )
        return path

    def iter_epoch(self, train_loader) -> None:
        """SWA phase epoch (asymmetric_valley.py:54-69)."""
        if self.lr_init is None:
            self.lr_init = float(
                self.optimizer.get_learning_rate(self.opt_state) or 0.1
            )
        lr = self.schedule_lr()
        self.opt_state = self.optimizer.set_learning_rate(self.opt_state, lr)
        self.train_epoch(train_loader)

        if (
            self.swa
            and (self.i + 1) >= self.swa_start
            and (self.i + 1 - self.swa_start) % self.swa_c_epochs == 0
        ):
            if self.swa_params is None:
                self.swa_params = self.params
                self.swa_model_state = self.model_state
                self.swa_n = 1
            else:
                alpha = 1.0 / (self.swa_n + 1)
                self.swa_params = jax.tree.map(
                    lambda s, p: s * (1 - alpha) + p * alpha,
                    self.swa_params,
                    self.params,
                )
                self.swa_n += 1
            if (
                self.i == 0
                or self.i % self.eval_freq == self.eval_freq - 1
                or self.i == self.sgd_start - 2
            ):
                self.swa_model_state = bn_update(
                    self.task, self.swa_params, self.model_state, train_loader,
                    self._put_batch,
                )

        if (self.i + 1) % self.save_freq == 0:
            self.swa_path = self._save_full(f"ep{self.i + 1}")

    def iter2(self, train_loader, valid_loader) -> None:
        """Post-sgd_start hunt (asymmetric_valley.py:71-89): an SGD point
        with lower train loss and higher valid loss than the SWA point."""
        if self.train_res_swa is None:
            self.train_res_swa = self.evaluate(train_loader)
            self.valid_res_swa = self.evaluate(valid_loader)
            if self.swa_path is not None:
                payload = checkpoints.load_checkpoint(self.swa_path)
                self.params = checkpoints.restore_like(
                    self.params, payload["state_dict"]["params"]
                )
                self.model_state = checkpoints.restore_like(
                    self.model_state, payload["state_dict"]["model_state"]
                )
            self.model_state = bn_update(
                self.task, self.params, self.model_state, train_loader,
                self._put_batch,
            )
        self.opt_state = self.optimizer.set_learning_rate(
            self.opt_state, self.lr_init
        )
        train_res = self.train_epoch(train_loader)
        valid_res = self.evaluate(valid_loader)
        if (
            train_res["loss"] < self.train_res_swa["loss"]
            and valid_res["loss"] > self.valid_res_swa["loss"]
        ):
            self.sgd_path = self._save_full(f"sgd_ep{self.i + 1}")

    # ------------------------------------------------------------------
    def interpolation(self, train_loader, valid_loader) -> None:
        """Linear sweep between the SGD and SWA solutions
        (asymmetric_valley.py:91-156)."""
        if self.sgd_path is None or self.swa_path is None:
            return
        sgd_payload = checkpoints.load_checkpoint(self.sgd_path)
        swa_payload = checkpoints.load_checkpoint(self.swa_path)
        vec_1 = checkpoints.restore_like(
            self.params, sgd_payload["state_dict"]["params"]
        )
        vec_2 = checkpoints.restore_like(
            self.params, swa_payload["swa_state_dict"]["params"]
        )
        n_pts = self.distances * 2 + self.division_part + 1
        results = {k: np.zeros(n_pts) for k in
                   ("train_loss", "test_loss", "train_acc", "test_acc")}
        for idx in range(n_pts):
            t = (idx - self.distances) / self.division_part
            p = jax.tree.map(lambda b, a: b + t * (a - b), vec_2, vec_1)
            ms = bn_update(self.task, p, self.model_state, train_loader,
                           self._put_batch)
            tr = self.evaluate(train_loader, p, ms)
            te = self.evaluate(valid_loader, p, ms)
            results["train_loss"][idx] = tr["loss"]
            results["train_acc"][idx] = tr["accuracy"]
            results["test_loss"][idx] = te["loss"]
            results["test_acc"][idx] = te["accuracy"]
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.plot_dir, exist_ok=True)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for key in results:
            np.savetxt(
                os.path.join(self.log_dir, f"asymmetric_valley_{key}_results.txt"),
                results[key],
            )
            plt.cla()
            plt.plot(results[key])
            plt.savefig(
                os.path.join(self.plot_dir, f"asymmetric_valley_{key}_results.png")
            )

    # ------------------------------------------------------------------
    def train(
        self,
        inputs=None,
        target=None,
        inputs_valid=None,
        target_valid=None,
        train_loader=None,
        valid_loader=None,
        train_loader_na=None,
        crops: bool = False,
    ):
        if train_loader is None:
            train_loader = _as_loader((inputs, target), self.batch_size)
        if valid_loader is None:
            if inputs_valid is None:
                raise ValueError("AsymmetricValley requires validation data")
            valid_loader = _as_loader(
                (inputs_valid, target_valid), self.batch_size
            )
        first = next(iter(train_loader))
        self.init_state(first)
        if self.lr_init is None:
            self.lr_init = float(
                self.optimizer.get_learning_rate(self.opt_state) or 0.1
            )

        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.model_dir, exist_ok=True)
        with open(self.log_file, "w") as fh:
            fh.write("epoch\t f\t rho\t h\t norm\t val_acc\t val_f1\n")

        f_hist = []
        for self.i in range(self.max_iter):
            if (self.i + 1) >= self.sgd_start:
                self.iter2(train_loader, valid_loader)
            else:
                self.iter_epoch(train_loader)
            self.save()
            _, self.val_acc, val_f1 = self.test_model(loader=valid_loader)
            if self.val_acc > self.best_val_acc:
                self.best_val_acc = self.val_acc
                self.best_rho = self.rho
                self.best_iter = self.i
                self.save("_trained_model_best.msgpack")
            with open(self.log_file, "a") as fh:
                fh.write(
                    f"{self.i}\t {self.f:f}\t {self.rho:f}\t {self.h:f}\t "
                    f"{self.norm:f}\t {self.val_acc:f}\t {val_f1:f}\n"
                )
            f_hist.append(float(self.f))
            if self.i >= self.min_iter - 1:
                window = f_hist[-10:]
                coef_var = float(np.std(window) / np.abs(np.mean(window)))
                if coef_var <= self.eps:
                    break

        with open(self.log_file, "a") as fh:
            fh.write(f"Best Validation Iterate: {self.best_iter}\n")
            fh.write(f"Best Validation Accuracy: {self.best_val_acc}\n")
            fh.write(f"Rho: {self.best_rho}\n")

        self.interpolation(train_loader, valid_loader)
        eval_loader = train_loader_na if train_loader_na is not None else train_loader
        self.test_set(loader=eval_loader, label="Train", crops=crops)
