"""SpectralTrainer — the training driver.

Capability parity with reference ``OptWBoundEignVal``
(opt.py:238-1855): per-batch spectral-penalty gradient step, per-epoch
f/rho/h bookkeeping and TSV logging, validation-tracked best model,
coefficient-of-variation early stop, checkpointing, test/rho-test
evaluation cascade.

TPU-native structure (NOT a port):
  * ONE jitted train step contains: gradient linearization, the whole
    power-iteration ``lax.while_loop``, the gated v^T(∇H)v pass, and
    the optimizer update.  The reference runs its power loop in Python
    with a device sync per iteration (opt.py:447-498); here an epoch is
    ``n_batches`` XLA program invocations, full stop.
  * Explicit carried state: ``(params, model_state, opt_state, v, rng)``
    — the warm-started eigenvector is state, not a hidden attribute.
  * Data parallel by construction: with a mesh, batches are sharded
    over the ``data`` axis and params/eigenvector replicated; XLA
    psums the batch reductions (gradients AND HVPs) over ICI.

Log schema matches the reference exactly so downstream analysis/parse
tooling ports unchanged: ``epoch f rho h norm [val_acc val_f1]``
(opt.py:798-832); verbose per-batch ``batch rho norm gradf gradg``
(opt.py:594, 714-719).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from optwboundeigenval_tpu.data.loaders import ArrayLoader
from optwboundeigenval_tpu.ops import curvature, eigen, spectral
from optwboundeigenval_tpu.optim.api import Optimizer
from optwboundeigenval_tpu.parallel import mesh as meshlib
from optwboundeigenval_tpu.train import checkpoints
from optwboundeigenval_tpu.train.task import Task
from optwboundeigenval_tpu.utils.tree import (
    tree_uniform_like,
    tree_vdot,
)


def _as_loader(data, batch_size) -> ArrayLoader:
    if isinstance(data, ArrayLoader):
        return data
    x, y = data
    return ArrayLoader(np.asarray(x), np.asarray(y), batch_size=batch_size)


class SpectralTrainer:
    """Reference ctor surface (opt.py:239-316) mapped to TPU-native
    pieces.  ``mu`` may be a scalar or a callable of the epoch index
    (opt.py:598-602); ``pow_iter_alpha`` a scalar or callable of the
    power-iteration index (opt.py:489)."""

    def __init__(
        self,
        task: Task,
        optimizer: Optimizer,
        scheduler=None,
        *,
        mu: Union[float, Callable[[int], float]] = 0.0,
        K: float = 0.0,
        Kmin: float = 0.0,
        eps: float = -1.0,
        pow_iter_eps: float = 1e-3,
        batch_size: int = 128,
        min_iter: int = 10,
        max_iter: int = 100,
        max_pow_iter: int = 1000,
        pow_iter: bool = True,
        ignore_bad_vals: bool = True,
        rand_init: bool = False,
        pow_iter_alpha: Union[float, Callable] = 1.0,
        pow_iter_momentum: Optional[float] = None,
        eigensolver: str = "power",
        lanczos_m: Optional[int] = None,
        gradg_clip: Optional[float] = None,
        best_h: bool = False,
        btch_h: bool = False,
        verbose: bool = False,
        header: str = "",
        test_func: str = "maxacc",
        lobpcg: bool = False,
        kfac_rand: bool = True,
        kfac_ema: bool = False,
        precond_builder: Optional[Callable] = None,
        kfac_batch: int = 1,
        mesh=None,
        seed: int = 1226,
        mem_track: bool = False,
        remat: bool = False,
        hvp_micro: int = 0,
        defer_metrics: bool = False,
        scan_steps: int = 1,
        donate: bool = False,
        full_ckpt: bool = False,
        profile_dir: Optional[str] = None,
        profile_epoch: int = 0,
        log_dir: str = "./logs",
        model_dir: str = "./models",
    ):
        self.task = task
        self.optimizer = optimizer
        self.scheduler = scheduler
        self.mu = mu
        self.K = float(K)
        self.Kmin = float(Kmin)
        self.eps = eps
        self.pow_iter_eps = pow_iter_eps
        self.batch_size = batch_size
        self.min_iter = min_iter
        self.max_iter = max_iter
        self.max_pow_iter = max_pow_iter
        self.pow_iter = pow_iter
        self.ignore_bad_vals = ignore_bad_vals
        self.rand_init = rand_init
        self.pow_iter_alpha = pow_iter_alpha
        # heavy-ball accelerated power method (ops/eigen.py momentum):
        # fewer HVPs per step in the small-spectral-gap regime; not a
        # reference knob, off by default for trajectory parity.  Not
        # combinable with lobpcg (the recurrence replaces the
        # preconditioned update).
        if pow_iter_momentum is not None and lobpcg:
            raise ValueError(
                "pow_iter_momentum does not compose with lobpcg"
            )
        self.pow_iter_momentum = pow_iter_momentum
        # Krylov eigensolve (ops/eigen.py lanczos_dominant): 'lanczos'
        # swaps the power loop for an m-step Lanczos process — fewer
        # HVPs at tight tolerances; not a reference knob, 'power' is
        # the parity default.  Same warm-start + discard semantics.
        #
        # 'auto' is the measured-speedup POLICY: it resolves to the
        # early-exit Krylov solver (ops/eigen.lanczos_dominant_adaptive,
        # depth ≤ lanczos_m with the per-depth Δλ/residual tests) in the
        # many-HVPs regime — rand_init (fresh eigenvector every batch,
        # e.g. params/chestxray_best_reg.py) or tight pow_iter_eps ≤
        # 5e-3 (the reference's own default 1e-3) — and to plain power
        # iteration at loose eps with a warm start, where 1-2 HVPs
        # already suffice and a fixed Krylov build would be a slowdown.
        # lobpcg / pow_iter_momentum recipes keep their own solvers.
        # lanczos_m=None scales the Krylov depth cap with the tolerance:
        # m = clip(2*ceil(log10(1/eps)) + 2, 4, 16).
        if eigensolver not in ("power", "lanczos", "auto"):
            raise ValueError(f"unknown eigensolver: {eigensolver!r}")
        if eigensolver == "lanczos" and lobpcg:
            raise ValueError("eigensolver='lanczos' does not compose with lobpcg")
        if eigensolver == "lanczos" and pow_iter_momentum is not None:
            raise ValueError(
                "eigensolver='lanczos' does not compose with pow_iter_momentum"
            )
        self.eigensolver_requested = eigensolver
        if eigensolver == "auto":
            if lobpcg or pow_iter_momentum is not None:
                eigensolver = "power"
            elif rand_init or pow_iter_eps <= 5e-3:
                eigensolver = "lanczos_adaptive"
            else:
                eigensolver = "power"
        self.eigensolver = eigensolver
        if lanczos_m is None:
            if self.eigensolver_requested == "auto":
                import math

                lanczos_m = int(
                    min(16, max(4, 2 * math.ceil(math.log10(
                        1.0 / max(pow_iter_eps, 1e-12))) + 2))
                )
            else:
                lanczos_m = 16
        self.lanczos_m = int(lanczos_m)
        self.gradg_clip = gradg_clip
        self.best_h_val = best_h
        self.verbose = verbose
        self.test_func = test_func
        self.lobpcg = lobpcg
        self.kfac_rand = kfac_rand
        # In the reference's lobpcg mode the K-FAC ``steps`` counter
        # never increments, so kfac.py:52-56/63-66 RE-INITIALIZE the
        # factor buffers to identity on every hook call — its effective
        # factors at any refresh are 0.95*I + 0.05*cov(refresh batch),
        # never an EMA over history.  kfac_ema=False reproduces that
        # (parity default); kfac_ema=True carries the running EMA across
        # refreshes (the K-FAC paper's intended stat_decay semantics).
        self.kfac_ema = kfac_ema
        # LOBPCG mode: precondition the eigensolver residual through the
        # K-FAC factored inverse (opt.py:426-430, 491-493)
        if lobpcg and precond_builder is None:
            from optwboundeigenval_tpu.ops import kfac as kfac_ops

            precond_builder = kfac_ops.precond_apply
        self.precond_builder = precond_builder
        self.kfac_batch = kfac_batch
        self.mesh = mesh
        self.seed = seed
        self.log_dir = log_dir
        self.model_dir = model_dir

        # filename stem parity: header_OptName[_btchN]_muM_KX[_KminY]
        # (opt.py:290-302)
        mname = "Func" if callable(mu) else str(mu)
        self.header = header
        self.header2 = f"{header}_{optimizer.name}"
        self.header2 += f"_btch{batch_size}" if btch_h else ""
        self.header2 += f"_mu{mname}_K{K}"
        self.header2 += f"_Kmin{Kmin}" if Kmin > 0 else ""
        self.log_file = os.path.join(log_dir, self.header2 + ".log")
        self.verbose_log_file = os.path.join(log_dir, self.header2 + "_verbose.log")

        # mutable run state
        self.params = None
        self.model_state = None
        self.opt_state = None
        self.v = None
        self.rng = jax.random.PRNGKey(seed)
        self._np_rng = np.random.default_rng(seed)
        self.i = 0  # epoch counter
        self.f = 0.0
        self.g = 0.0
        self.h = 0.0
        self.rho = 0.0
        self.norm = 0.0
        self.val_acc = 0.0
        self.best_val_acc = 0.0
        self.best_h = 0.0
        self.best_rho = 0.0
        self.best_iter = 0
        self._precond_state = None
        self._kfac_iter = kfac_batch
        self._compiled: Dict[str, Any] = {}
        from optwboundeigenval_tpu.utils.timing import Timers

        self.timers = Timers()
        self.mem_track = mem_track
        self.mem_max = 0  # running max device memory (opt.py:318-322)
        # memory knobs for large models: remat wraps the loss in
        # jax.checkpoint (recompute activations in the backward/JVP
        # passes instead of storing them); hvp_micro > 1 accumulates
        # HVPs/grads over micro-batches (ops/curvature.hvp_microbatched)
        self.remat = remat
        self.hvp_micro = int(hvp_micro)
        # defer_metrics: skip the per-step metrics device_get (one
        # tunnel RTT each on a remote TPU; measured ~40% of a
        # small-model epoch); the NaN guard runs once per epoch with
        # the reference's own recovery point.  Ignored when verbose
        # (per-batch log lines need per-step values).
        self.defer_metrics = defer_metrics
        # scan_steps > 1: run chunks of k train steps as ONE compiled
        # lax.scan program (stacked batches, pre-split rng stream) — no
        # per-step XLA launch, no per-step host work at all.  Requires
        # defer_metrics (per-step host metrics would defeat it) and a
        # non-lobpcg recipe (the K-FAC refresh cadence is host-driven);
        # falls back to the per-step path otherwise.  Trajectory is
        # identical either way (test_trainer::test_scan_steps_*).
        self.scan_steps = int(scan_steps)
        # donate: alias the (params, model_state, opt_state, v) buffers
        # into the step program in place of fresh outputs — XLA then
        # updates them in-place, dropping one full copy of the
        # parameter + optimizer trees from peak HBM (the knob that fits
        # DenseNet121@224px at batch 96).  Trade-off: the pre-step
        # buffers no longer exist after the call, so the fetch=True
        # non-finite guard can no longer withhold the commit — recovery
        # falls back to checkpoint reload (the reference's own rollback,
        # opt.py:696-708) or, with defer_metrics, to the epoch-start
        # snapshot (deep-copied when donating).
        self.donate = donate
        # write a save_full checkpoint at every epoch end, enabling
        # exact mid-run resume (train() itself ends with the BEST model
        # loaded — reference test_set semantics, opt.py:868-871 — so a
        # save_full() after train() would checkpoint the best-epoch
        # params, not the final ones)
        self.full_ckpt = full_ckpt
        # --profile: capture a jax.profiler trace of the FIRST epoch
        # into this directory (viewable in TensorBoard/XProf/Perfetto) —
        # the trace-level upgrade of the reference's aTime0/1/2 stage
        # timers (opt.py:70, 188-190); the stage-time table itself is in
        # the verbose log (timers.report)
        self.profile_dir = profile_dir
        # epoch to trace: 0 captures compilation too; set 1+ for a
        # steady-state trace (all programs already compiled)
        self.profile_epoch = profile_epoch

    def mem_check(self):
        """Running max of device memory in use — the TPU equivalent of
        torch.cuda.memory_allocated tracking (opt.py:318-322)."""
        if not self.mem_track:
            return self.mem_max
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            used = int(stats.get("bytes_in_use", 0))
        except Exception:
            used = 0
        if used > self.mem_max:
            self.mem_max = used
            print(f"Running Max device memory used (in bytes): {used}")
        return self.mem_max

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------
    def init_state(self, example_batch: Dict[str, np.ndarray]) -> None:
        if self.params is not None:
            return
        self.rng, init_rng = jax.random.split(self.rng)
        self.params, self.model_state = self.task.init(
            init_rng, jnp.asarray(example_batch["x"])
        )
        # jitted: optimizer init builds large zero-trees; eager per-leaf
        # dispatch is slow over a tunneled device
        self.opt_state = jax.jit(self.optimizer.init)(self.params)
        # model-shape-dependent optimizer state (K-FAC factor buffers,
        # reference builds these at hook registration, kfac.py:67-79)
        if hasattr(self.optimizer, "build_extra_state"):
            self.rng, extra_rng = jax.random.split(self.rng)
            batch = {k: jnp.asarray(v) for k, v in example_batch.items()}
            self.opt_state = self.optimizer.build_extra_state(
                self.opt_state, self.task, self.params, self.model_state,
                batch, extra_rng,
            )
        self.v = jax.jit(tree_uniform_like)(self.params)
        if self.mesh is not None:
            self.params = meshlib.replicate(self.params, self.mesh)
            self.model_state = meshlib.replicate(self.model_state, self.mesh)
            self.opt_state = meshlib.replicate(self.opt_state, self.mesh)
            self.v = meshlib.replicate(self.v, self.mesh)

    @property
    def ndim(self) -> int:
        from optwboundeigenval_tpu.utils.tree import tree_size

        return tree_size(self.params)

    def _scalar_dtype(self):
        """Step-scalar dtype (mu): follows the param precision so f64
        parity runs keep exact hyperparameter values (f32 paths are
        unchanged — result_type(f32, f32) = f32)."""
        leaves = jax.tree_util.tree_leaves(self.params)
        return jnp.result_type(jnp.float32, *(l.dtype for l in leaves[:1]))

    def _put_batch(self, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            batch = meshlib.shard_batch(batch, self.mesh)
        return batch

    def _put_stacked(self, batches):
        """Stack a list of same-shape batch dicts along a new leading
        axis and place the stack on device in ONE transfer (scan path).
        Batches from a DeviceArrayLoader are already device-resident:
        those are stacked on device by a jitted program (np.stack would
        silently fetch them back through the tunnel).  Under a mesh the
        BATCH axis (axis 1) is the data-sharded one; the scan axis is
        unsharded."""
        stack_dev = self._get(
            "stack_dev", lambda: jax.jit(lambda *xs: jnp.stack(xs)))
        stacked = {
            k: (stack_dev(*[b[k] for b in batches])
                if isinstance(batches[0][k], jax.Array)
                else np.stack([np.asarray(b[k]) for b in batches]))
            for k in batches[0]
        }
        if self.mesh is not None:
            return meshlib.shard_stacked_batch(stacked, self.mesh)
        return {k: jnp.asarray(v) for k, v in stacked.items()}

    def _put_eval_batch(self, batch):
        """Batch placement for evaluation (test_model), single-process
        path: identical to ``_put_batch`` (data-sharded over the mesh).
        Multi-process evaluation never reaches this — it goes through
        :meth:`_eval_outputs_sharded` instead."""
        return self._put_batch(batch)

    def _eval_is_contributor(self) -> bool:
        """Whether this process contributes eval rows for its data
        shard (multi-process, host-sharded loaders).

        Under a dp x tp mesh whose ``model`` axis spans processes,
        several processes hold the SAME data-axis coordinate (their
        loaders feed identical host shards, matching
        ``shard_batch``'s replicate-along-model placement); only the
        lowest process index at each data coordinate contributes real
        rows to the output allgather — the replicas send ``w = 0`` so
        no example is double-counted.  Requires each process's devices
        to sit at a single data coordinate (true for contiguous
        ``make_mesh`` layouts)."""
        if self.mesh is None or jax.process_count() == 1:
            return True
        pid = jax.process_index()
        devs = self.mesh.devices
        data_axis = list(self.mesh.axis_names).index("data")
        grid = np.moveaxis(devs, data_axis, 0)
        grid = grid.reshape(grid.shape[0], -1)
        my_coords = set()
        owners = {}
        for i in range(grid.shape[0]):
            procs = {d.process_index for d in grid[i]}
            owners[i] = min(procs)
            if pid in procs:
                my_coords.add(i)
        if not my_coords:
            return False
        if len(my_coords) > 1:
            # devices span several data coords: every row this process
            # holds is unique to it, no tp replica to dedupe against
            return True
        return owners[my_coords.pop()] == pid

    def _eval_outputs_sharded(self, loader, crops: bool = False):
        """Data-sharded multi-process evaluation (SURVEY §2.9).

        Each process runs the forward pass on its LOCAL rows only,
        with a process-local jit (params/model_state are replicated
        over the global mesh, hence host-addressable — fetched once
        per call), and only per-example OUTPUTS (logits: C floats per
        example), labels, and weights cross hosts.  Total forward
        compute is O(dataset) instead of the replicate-everything
        placement's O(hosts x dataset), and the allgather traffic
        drops from input pixels to logits.

        Local rows: a ``host_shard`` loader's batches are already this
        process's shard (tp replicas are deduped via
        :meth:`_eval_is_contributor`); for an identical-data loader
        every process takes its own equal-size stripe of each batch
        (tail stripes are clamped + ``w = 0`` padded so allgather
        shapes match).  Padded rows are dropped host-side after the
        gather — metric math downstream is order-invariant (weighted
        means, accuracy, AUC, micro-F1) and identical on every host.
        """
        from jax.experimental import multihost_utils

        nproc = jax.process_count()
        counts = np.asarray(
            multihost_utils.process_allgather(np.asarray(len(loader)))
        )
        if int(counts.min()) != int(counts.max()):
            raise ValueError(
                f"eval loaders yield unequal batch counts {counts.tolist()} "
                "across processes; pad the dataset so every process yields "
                "the same number of (padded) batches"
            )
        sharded = getattr(loader, "host_shard", None) is not None
        contributes = self._eval_is_contributor() if sharded else True
        params = jax.tree.map(np.asarray, self.params)
        model_state = jax.tree.map(np.asarray, self.model_state)
        predict_local = self._get(
            "predict_local",
            lambda: jax.jit(
                lambda p, ms, b: self.task.predict(p, ms, b)
            ),
        )
        pid = jax.process_index()
        for data in loader:
            xb = np.asarray(data["x"])
            yb = np.asarray(data["y"])
            wb = np.asarray(data["w"], np.float32)
            if not sharded:
                # identical-data loader: evaluate this process's stripe
                chunk = -(-xb.shape[0] // nproc)
                idx = np.arange(pid * chunk, (pid + 1) * chunk)
                valid = idx < xb.shape[0]
                idx = np.minimum(idx, xb.shape[0] - 1)
                xb, yb = xb[idx], yb[idx]
                wb = wb[idx] * valid
            if not contributes:
                wb = np.zeros_like(wb)
            if crops and xb.ndim == 5:
                bc, nc = xb.shape[0], xb.shape[1]
                ops = predict_local(
                    params, model_state,
                    {"x": xb.reshape((-1,) + xb.shape[2:])},
                )
                ops = np.asarray(ops).reshape(bc, nc, -1).mean(axis=1)
            else:
                ops = np.asarray(
                    predict_local(params, model_state, {"x": xb})
                )
            g = multihost_utils.process_allgather(
                {"ops": np.asarray(ops, np.float32), "y": yb, "w": wb}
            )
            flat = {
                k: np.asarray(v).reshape((-1,) + np.asarray(v).shape[2:])
                for k, v in g.items()
            }
            keep = flat["w"] > 0
            yield {
                "ops": flat["ops"][keep],
                "y": flat["y"][keep],
                "w": np.ones(int(keep.sum()), np.float32),
            }

    # ------------------------------------------------------------------
    # jitted step builders
    # ------------------------------------------------------------------
    def _loss_fn(self, model_state, rng):
        loss_fn = self.task.loss_fn(model_state, rng)
        if self.remat:
            loss_fn = jax.checkpoint(loss_fn)
        return loss_fn

    def _step_body(self):
        """Build the pure per-batch step function: linearize -> power
        iteration -> gated grad-rho -> optimizer update.  Jitted
        standalone by ``_build_train_step`` and scanned over stacked
        batches by ``_build_scan_steps`` (the chunked-dispatch fast
        path)."""
        pow_iter = self.pow_iter

        def step(params, model_state, opt_state, v, batch, mu, rng, precond_state):
            rng_step, rng_opt = jax.random.split(rng)
            loss_fn = self._loss_fn(model_state, rng_step)

            if self.hvp_micro > 1:
                # memory-bounded path: O(B/micro) activations per pass;
                # every power-iteration step recomputes the micro
                # forward/backwards (no cached linearization)
                grads_f = curvature.grad_microbatched(
                    loss_fn, params, batch, self.hvp_micro
                )
                hvp_fn = lambda u: curvature.hvp_microbatched(
                    loss_fn, params, batch, u, self.hvp_micro
                )
            else:
                grads_f, hvp_fn = curvature.linearize_hvp(
                    loss_fn, params, batch
                )

            if pow_iter:
                v0 = tree_uniform_like(params) if self.rand_init else v
                precond = None
                if self.precond_builder is not None and precond_state is not None:
                    precond = lambda r: self.precond_builder(precond_state, r)
                eig = eigen.estimate_dominant_eig(
                    hvp_fn,
                    v0,
                    eps=self.pow_iter_eps,
                    max_iter=self.max_pow_iter,
                    alpha=self.pow_iter_alpha,
                    precond=precond,
                    ignore_bad_vals=self.ignore_bad_vals,
                    momentum=self.pow_iter_momentum,
                    method=self.eigensolver,
                    lanczos_m=self.lanczos_m,
                )
                sg = spectral.penalty_and_grad(
                    loss_fn,
                    params,
                    batch,
                    eig.v,
                    eig.rho,
                    K=self.K,
                    Kmin=self.Kmin,
                    gradg_clip=self.gradg_clip,
                    num_micro=self.hvp_micro,
                )
                direction = spectral.regularized_direction(grads_f, sg.grad_g, mu)
                new_v = eig.v
                metrics = {
                    "rho": eig.rho,
                    "norm": eig.norm,
                    "res_change": eig.res_change,
                    "pow_iters": eig.iters,
                    "converged": eig.converged,
                    "g": sg.g,
                    "gradf_norm": jnp.sqrt(tree_vdot(grads_f, grads_f)),
                    "gradg_norm": jnp.sqrt(tree_vdot(sg.grad_g, sg.grad_g)),
                }
            else:
                direction = grads_f
                new_v = v
                zero = jnp.asarray(0.0, jnp.float32)
                metrics = {
                    "rho": zero,
                    "norm": zero,
                    "res_change": zero,
                    "pow_iters": jnp.asarray(0, jnp.int32),
                    "converged": jnp.asarray(True),
                    "g": zero,
                    "gradf_norm": jnp.sqrt(tree_vdot(grads_f, grads_f)),
                    "gradg_norm": zero,
                }

            grad_fn = lambda p: jax.value_and_grad(loss_fn)(p, batch)
            err_fn = None
            if getattr(self.optimizer, "wants_err", False):
                # EntropySGD closure protocol (opt.py:673-687): report
                # (loss, err%) on the current batch alongside the step.
                # Documented deviations from the reference closure: the
                # multi-label threshold is logits > 0 == sigmoid > 0.5
                # (the reference thresholds the raw output at 0.5,
                # opt.py:677-679 — equivalent for its sigmoid-head CXR
                # models, different for raw-logit heads, where 0.5-on-
                # logits is the quirk, not the intent), and the forward
                # is eval-mode predict (frozen BN stats) rather than
                # reusing the train-mode outputs.  err% is diagnostics
                # only — it never feeds the update direction.
                def err_fn(p):
                    out = self.task.predict(p, model_state, batch)
                    loss_val = self.task.loss(out, batch["y"], batch.get("w"))
                    y, w = batch["y"], batch.get("w")
                    if out.ndim > 1 and y.ndim > 1:
                        # multi-label (W_BCE path, opt.py:677-681)
                        correct = jnp.mean(
                            ((out > 0) == (y > 0.5)).astype(jnp.float32), axis=-1
                        )
                    else:
                        correct = (jnp.argmax(out, -1) == y).astype(jnp.float32)
                    if w is not None:
                        acc = jnp.sum(correct * w) / jnp.maximum(jnp.sum(w), 1e-12)
                    else:
                        acc = jnp.mean(correct)
                    return loss_val, 100.0 * (1.0 - acc)

            stats_fn = None
            if getattr(self.optimizer, "needs_stats", False):
                from optwboundeigenval_tpu.ops import kfac as kfac_ops

                def stats_fn(p, r):
                    r1, r2 = jax.random.split(r)
                    _, caps = kfac_ops.capture(
                        self.task, p, model_state, batch, r1,
                        sample_targets=getattr(self.optimizer, "kfac_rand", True),
                        sample_rng=r2,
                    )
                    return caps

            opt_kwargs = dict(grad_fn=grad_fn, rng=rng_opt, stats_fn=stats_fn)
            if err_fn is not None:
                opt_kwargs["err_fn"] = err_fn
            new_params, new_opt_state = self.optimizer.step(
                direction, opt_state, params, **opt_kwargs
            )
            if hasattr(new_opt_state, "merr") and err_fn is not None:
                # surfaced per-batch: the closure loss / err% the
                # reference records (optim.py:24)
                metrics = {
                    **metrics,
                    "opt_mf": new_opt_state.mf,
                    "opt_merr": new_opt_state.merr,
                }

            # BN running stats update at the PRE-step params: the
            # reference's stats advance during comp_rho's prepare_grad
            # forward (train mode, opt.py:180-186, 421), which happens
            # BEFORE the optimizer step mutates the weights.
            if self.task.has_batch_stats:
                _, new_model_state = self.task.train_loss(
                    params, model_state, batch, rng_step
                )
            else:
                new_model_state = model_state

            return new_params, new_model_state, new_opt_state, new_v, metrics

        return step

    def _build_train_step(self):
        """The single compiled program per batch."""
        if self.donate:
            return jax.jit(self._step_body(), donate_argnums=(0, 1, 2, 3))
        return jax.jit(self._step_body())

    def _build_scan_steps(self):
        """Chunked-dispatch fast path: ``lax.scan`` the per-batch step
        over a stack of ``k`` batches inside ONE compiled program.

        The per-step XLA launch (one tunnel RTT each on a remote TPU)
        and the host-side rng split disappear from the epoch's critical
        path; with ``defer_metrics`` the whole chunk runs with zero
        host round-trips.  Trajectory-identical to ``k`` sequential
        ``train_step`` calls (same step body, same rng stream — keys
        are pre-split outside and fed as a scanned input).

        Only built for ``precond_builder is None``: the LOBPCG K-FAC
        refresh cadence is host-driven (``_refresh_precond``), so
        lobpcg recipes keep the per-step path."""
        body = self._step_body()

        def scan_steps(params, model_state, opt_state, v, batches, mu, rngs):
            def f(carry, xs):
                p, ms, os_, vv = carry
                b, r = xs
                np_, nms, nos, nv, m = body(p, ms, os_, vv, b, mu, r, None)
                return (np_, nms, nos, nv), m

            carry, metrics = jax.lax.scan(
                f, (params, model_state, opt_state, v), (batches, rngs)
            )
            return (*carry, metrics)

        if self.donate:
            # chunk commits are unconditional (defer protocol), so
            # donation is always safe here; the epoch-start snapshot is
            # deep-copied when donating (_iter_epoch_body)
            return jax.jit(scan_steps, donate_argnums=(0, 1, 2, 3))
        return jax.jit(scan_steps)

    def _build_rho_step(self):
        """comp_rho without an optimizer step (epoch-end h, rho_test).

        Returns ``(eig, new_model_state)``: the reference's comp_rho runs
        a train-mode forward (prepare_grad, opt.py:421), so BN running
        stats advance as a side effect of every rho evaluation — the
        epoch-end random-batch comp_g (opt.py:740) and rho_test
        (opt.py:882-910) included.  Mirrored here so eval-mode losses
        see the same running-stat trajectory."""

        def step(params, model_state, v, batch, rng, precond_state):
            loss_fn = self._loss_fn(model_state, rng)
            _, hvp_fn = curvature.linearize_hvp(loss_fn, params, batch)
            v0 = tree_uniform_like(params) if self.rand_init else v
            precond = None
            if self.precond_builder is not None and precond_state is not None:
                precond = lambda r: self.precond_builder(precond_state, r)
            eig = eigen.estimate_dominant_eig(
                hvp_fn,
                v0,
                eps=self.pow_iter_eps,
                max_iter=self.max_pow_iter,
                alpha=self.pow_iter_alpha,
                precond=precond,
                ignore_bad_vals=self.ignore_bad_vals,
                momentum=self.pow_iter_momentum,
                method=self.eigensolver,
                lanczos_m=self.lanczos_m,
            )
            if self.task.has_batch_stats:
                _, new_model_state = self.task.train_loss(
                    params, model_state, batch, rng
                )
            else:
                new_model_state = model_state
            return eig, new_model_state

        return jax.jit(step)

    def _build_eval_step(self):
        def step(params, model_state, batch):
            return self.task.eval_loss(params, model_state, batch)

        return jax.jit(step)

    def _build_scan_eval(self):
        """Epoch-end f recompute (opt.py:730-739) over a stack of
        batches in ONE compiled program (chunked-dispatch twin of
        ``_build_scan_steps``)."""

        def scan_eval(params, model_state, batches):
            def f(carry, b):
                loss, _ = self.task.eval_loss(params, model_state, b)
                return carry, loss

            _, losses = jax.lax.scan(f, 0, batches)
            return losses

        return jax.jit(scan_eval)

    def _build_split_chain(self):
        """k sequential ``jax.random.split`` calls as one program, so
        the scan path consumes the IDENTICAL rng stream the per-step
        path would (trajectory equality), without k host dispatches."""

        def split_chain(rng, k):
            def f(r, _):
                r, s = jax.random.split(r)
                return r, s

            rng, keys = jax.lax.scan(f, rng, None, length=k)
            return rng, keys

        return jax.jit(split_chain, static_argnums=1)

    def _get(self, name, builder):
        if name not in self._compiled:
            self._compiled[name] = builder()
        return self._compiled[name]

    # ------------------------------------------------------------------
    # epoch loop (reference iter(), opt.py:580-763)
    # ------------------------------------------------------------------
    def _refresh_precond(self, batch, rng):
        """LOBPCG: refresh K-FAC factors every ``kfac_batch`` batches
        (opt.py:426-430), carrying the running EMA stats across
        refreshes."""
        if self.precond_builder is None:
            return
        if self._kfac_iter >= self.kfac_batch:
            from optwboundeigenval_tpu.ops import kfac as kfac_ops

            if "fit_factors" not in self._compiled:
                self._compiled["fit_factors"] = jax.jit(
                    lambda p, ms, b, r, prev: kfac_ops.fit_factors(
                        self.task, p, ms, b, r, prev=prev,
                        sample_targets=self.kfac_rand,
                    )
                )
            prev = self._precond_state if self.kfac_ema else None
            self._precond_state = self._compiled["fit_factors"](
                self.params, self.model_state, batch, rng, prev
            )
            self._kfac_iter = 1
        else:
            self._kfac_iter += 1

    def train_step(
        self, batch: Dict[str, Any], mu: Optional[float] = None,
        fetch: bool = True,
    ) -> Dict[str, Any]:
        """Public single-step API: run ONE full spectral-regularized
        training step on ``batch`` — gradient linearization, power
        iteration, gated v^T(∇H)v penalty gradient, optimizer update —
        and commit the new ``(params, model_state, opt_state, v)``.

        This is exactly the per-batch body of the training loop
        (reference ``iter()``, opt.py:580-763): ``iter_epoch`` calls it,
        and so does the driver's multi-chip dryrun, so external checks
        exercise the identical compiled program ``train()`` runs.

        Returns the per-batch metrics as a host-side dict, with a
        ``step_ok`` bool.  On a non-finite gradient the step is NOT
        committed (the caller decides whether to reload a checkpoint —
        the reference's rollback, opt.py:696-708).

        ``fetch=False`` (the ``defer_metrics`` fast path) returns the
        metrics as DEVICE arrays without the blocking transfer — each
        host sync costs one tunnel RTT on a remote TPU — and commits
        the step unconditionally; the NaN guard then runs once per
        epoch (``_iter_epoch_body``), restoring the epoch-start
        snapshot (params AND optimizer buffers) if any step was
        non-finite.  That recovery is strictly stronger than the
        reference's rollback, which reloads the model but leaves the
        torch optimizer's poisoned momentum in place (opt.py:696-708).
        """
        if self.params is None:
            self.init_state(batch)
        if mu is None:
            mu = self.mu(self.i) if callable(self.mu) else self.mu
        step = self._get("train_step", self._build_train_step)
        dev_batch = self._put_batch(batch)
        self.rng, step_rng = jax.random.split(self.rng)
        self._refresh_precond(dev_batch, step_rng)
        new_params, new_model_state, new_opt_state, new_v, metrics = step(
            self.params,
            self.model_state,
            self.opt_state,
            self.v,
            dev_batch,
            jnp.asarray(mu, self._scalar_dtype()),
            step_rng,
            self._precond_state,
        )
        if not fetch:
            self.params = new_params
            self.model_state = new_model_state
            self.opt_state = new_opt_state
            self.v = new_v
            return metrics  # device arrays; caller syncs per epoch
        # ONE device->host transfer for all per-batch metrics
        # (scalar-by-scalar float() costs a tunnel round trip each on
        # the remote TPU)
        metrics = jax.device_get(metrics)
        # NaN guard: check BOTH gradient norms — a finite loss gradient
        # with a non-finite penalty gradient (overflowing v^T(∇H)v)
        # would otherwise poison params and then get checkpointed at
        # epoch end.
        step_ok = bool(
            np.isfinite(float(metrics["gradf_norm"]))
            and np.isfinite(float(metrics["gradg_norm"]))
        )
        if step_ok or self.donate:
            # with donated buffers the pre-step state no longer exists,
            # so a bad step commits anyway; recovery is the caller's
            # checkpoint reload (iter_epoch non-defer path — exactly the
            # reference's rollback, opt.py:696-708)
            self.params = new_params
            self.model_state = new_model_state
            self.opt_state = new_opt_state
            self.v = new_v
        if step_ok:
            self.rho = float(metrics["rho"])
            self.norm = float(metrics["norm"])
            self.g = float(metrics["g"])
        metrics["step_ok"] = step_ok
        return metrics

    def iter_epoch(self, train_loader: ArrayLoader) -> None:
        import contextlib

        trace_ctx = contextlib.nullcontext()
        if self.profile_dir and self.i == self.profile_epoch:
            try:
                trace_ctx = jax.profiler.trace(self.profile_dir)
            except Exception as e:  # pragma: no cover - platform-dependent
                print(f"profiler trace unavailable: {e}")
        with trace_ctx:
            self._iter_epoch_body(train_loader)

    def _iter_epoch_body(self, train_loader: ArrayLoader) -> None:
        mu = self.mu(self.i) if callable(self.mu) else self.mu
        eval_step = self._get("eval_step", self._build_eval_step)
        rho_step = self._get("rho_step", self._build_rho_step)

        rbatch = int(self._np_rng.integers(0, max(len(train_loader), 1)))
        rdata = None
        vlog: List[str] = []

        import time as _time

        istart = _time.perf_counter()
        defer = self.defer_metrics and not self.verbose
        deferred: List[Dict[str, Any]] = []
        if defer:
            # free snapshot (immutable device arrays): the recovery
            # point if any deferred step turns out non-finite.  This
            # restores MORE than the reference's rollback (which
            # reloads the model but leaves the torch optimizer's
            # poisoned momentum in place, opt.py:696-708) — the full
            # epoch-start state including optimizer buffers.
            # Include the preconditioner state: in lobpcg mode
            # _refresh_precond refits K-FAC factors mid-epoch from the
            # (unconditionally committed) params, so NaN-poisoned params
            # can poison the factors too — restore them together.
            snapshot = (self.params, self.model_state, self.opt_state,
                        self.v, self._precond_state, self._kfac_iter)
            if self.donate:
                # donated programs consume these exact buffers on the
                # first step — the recovery point must be a real copy
                snapshot = jax.tree.map(
                    lambda a: a.copy() if isinstance(a, jax.Array) else a,
                    snapshot,
                )
        use_scan = (
            self.scan_steps > 1 and defer and self.precond_builder is None
        )
        if use_scan:
            rdata = self._scan_epoch_steps(train_loader, mu, rbatch, deferred)
            batch_iter = ()
        else:
            batch_iter = enumerate(train_loader)
        for j, data in batch_iter:
            if j == rbatch:
                rdata = data
            with self.timers("G"):
                metrics = self.train_step(data, mu=mu, fetch=not defer)
            if defer:
                deferred.append(
                    {"gradf_norm": metrics["gradf_norm"],
                     "gradg_norm": metrics["gradg_norm"],
                     "pow_iters": metrics["pow_iters"]}
                )
                self.mem_check()
                continue
            gradf_norm = float(metrics["gradf_norm"])
            # NaN rollback: the reference reloads the last epoch
            # checkpoint when the optimizer step blows up or KFAC emits
            # NaNs (opt.py:696-708).
            if not metrics["step_ok"]:
                ckpt = os.path.join(
                    self.model_dir, self.header2 + "_trained_model.msgpack"
                )
                if os.path.exists(ckpt):
                    self.model_load(ckpt)
                continue
            self.mem_check()
            if self.verbose:
                vlog.append(
                    f"{j}\t {self.rho:f}\t {self.norm:f}\t "
                    f"{gradf_norm:f}\t "
                    f"{float(metrics['gradg_norm']):f}"
                )
        if defer and deferred:
            # ONE host sync per epoch; on any non-finite step restore
            # the epoch-start snapshot (params AND optimizer buffers —
            # the unconditional commits may have poisoned both)
            norms = jax.device_get(deferred)
            # per-epoch power-iteration count (the reference logs
            # per-batch iters in verbose mode, opt.py:439-443); kept on
            # the instance so callers (bench_epoch_wallclock) don't need
            # an extra fetched step just to read it
            self.mean_pow_iters = float(
                np.mean([np.mean(np.asarray(m["pow_iters"])) for m in norms])
            )
            # entries are scalars (per-step path) or (k,) arrays (scan
            # chunks) — np.all handles both
            if not all(
                np.all(np.isfinite(np.asarray(m["gradf_norm"])))
                and np.all(np.isfinite(np.asarray(m["gradg_norm"])))
                for m in norms
            ):
                (self.params, self.model_state, self.opt_state,
                 self.v, self._precond_state, self._kfac_iter) = snapshot

        if self.verbose:
            os.makedirs(self.log_dir, exist_ok=True)
            mode = "w" if self.i == 0 else "a"
            with open(self.verbose_log_file, mode) as fh:
                if self.i == 0:
                    fh.write("batch\t rho\t norm\t gradf\t gradg\n")
                fh.write("\n".join(vlog) + "\n")

        # epoch-end: weighted-mean f over all batches in eval mode
        # (opt.py:730-739), g on one random batch (opt.py:740).
        # Accumulate on device; one host transfer per epoch.
        with self.timers("Test"):
            if use_scan:
                self.f = self._scan_epoch_eval(train_loader)
            else:
                f_sum, w_sum = jnp.zeros(()), 0.0
                for data in train_loader:
                    batch = self._put_batch(data)
                    loss, _ = eval_step(self.params, self.model_state, batch)
                    bw = float(np.sum(data["w"]))
                    f_sum = f_sum + loss * bw
                    w_sum += bw
                self.f = float(f_sum) / max(w_sum, 1.0)

        if self.pow_iter and rdata is not None:
            batch = self._put_batch(rdata)
            self.rng, r_rng = jax.random.split(self.rng)
            # the reference's kfac_batch counter ticks on EVERY comp_rho
            # call, including this epoch-end one (opt.py:426-430 sits at
            # the top of comp_rho) — so the refresh cadence shifts by
            # one slot per epoch; mirror that here
            if self.precond_builder is not None:
                self.rng, p_rng = jax.random.split(self.rng)
                self._refresh_precond(batch, p_rng)
            eig, self.model_state = rho_step(
                self.params, self.model_state, self.v, batch, r_rng,
                self._precond_state,
            )
            self.v = eig.v
            self.rho = float(eig.rho)
            self.norm = float(eig.norm)
            self.g = float(
                spectral.penalty(jnp.asarray(self.rho), self.K, self.Kmin)
            )
        self.h = self.f + mu * self.g

        # scheduler (ReduceLROnPlateau gets f — opt.py:760-763)
        if self.scheduler is not None:
            lr = self.scheduler.step(self.f)
            self.opt_state = self.optimizer.set_learning_rate(self.opt_state, lr)

        # per-epoch stage timing readout in timeHMS format
        # (opt.py:745-757) appended to the verbose log
        self.timers.totals["Iteration"] = (
            self.timers.totals.get("Iteration", 0.0)
            + (_time.perf_counter() - istart)
        )
        if self.verbose:
            with open(self.verbose_log_file, "a") as fh:
                fh.write(self.timers.report(["G", "Test", "Iteration"]) + "\n")

    # ------------------------------------------------------------------
    # chunked-dispatch (scan) epoch helpers
    # ------------------------------------------------------------------
    def _scan_epoch_steps(self, train_loader, mu, rbatch, deferred):
        """Run the epoch's train steps in chunks of ``scan_steps``
        batches, each chunk ONE compiled ``lax.scan`` program (one
        stacked host->device transfer, one XLA launch, zero per-step
        host work).  Returns the captured random batch for the
        epoch-end comp_g.  A short final chunk reuses the same jitted
        callable (jax re-traces per distinct chunk length, so at most
        two programs per loader)."""
        rdata = None
        buf: List[Dict[str, Any]] = []
        mu_arr = jnp.asarray(mu, self._scalar_dtype())
        for j, data in enumerate(train_loader):
            if j == rbatch:
                rdata = data
            buf.append(data)
            if len(buf) == self.scan_steps:
                self._run_scan_chunk(buf, mu_arr, deferred)
                buf = []
        if buf:
            self._run_scan_chunk(buf, mu_arr, deferred)
        return rdata

    def _run_scan_chunk(self, buf, mu_arr, deferred):
        if self.params is None:
            self.init_state(buf[0])
        scan_prog = self._get("scan_steps", self._build_scan_steps)
        split_chain = self._get("split_chain", self._build_split_chain)
        stacked = self._put_stacked(buf)
        self.rng, keys = split_chain(self.rng, len(buf))
        with self.timers("G"):
            (self.params, self.model_state, self.opt_state, self.v,
             metrics) = scan_prog(
                self.params, self.model_state, self.opt_state, self.v,
                stacked, mu_arr, keys,
            )
        deferred.append(
            {"gradf_norm": metrics["gradf_norm"],
             "gradg_norm": metrics["gradg_norm"],
             "pow_iters": metrics["pow_iters"]}
        )
        self.mem_check()

    def _scan_epoch_eval(self, train_loader) -> float:
        """Epoch-end weighted-mean f, chunk-scanned: one XLA launch per
        ``scan_steps`` batches, host syncs only after every chunk has
        been dispatched."""
        scan_eval = self._get("scan_eval", self._build_scan_eval)
        chunks = []  # (device losses per batch, host batch weights)
        buf, bws = [], []

        def flush():
            nonlocal buf, bws
            losses = scan_eval(
                self.params, self.model_state, self._put_stacked(buf)
            )
            chunks.append((losses, np.asarray(bws)))
            buf, bws = [], []

        for data in train_loader:
            buf.append(data)
            bws.append(float(np.sum(data["w"])))
            if len(buf) == self.scan_steps:
                flush()
        if buf:
            flush()
        f_sum = sum(float(np.sum(np.asarray(l) * b)) for l, b in chunks)
        w_sum = sum(float(np.sum(b)) for _, b in chunks)
        return f_sum / max(w_sum, 1.0)

    # ------------------------------------------------------------------
    # full training (reference train(), opt.py:771-871)
    # ------------------------------------------------------------------
    def train(
        self,
        inputs=None,
        target=None,
        inputs_valid=None,
        target_valid=None,
        train_loader: Optional[ArrayLoader] = None,
        valid_loader: Optional[ArrayLoader] = None,
        train_loader_na: Optional[ArrayLoader] = None,
        crops: bool = False,
    ):
        start = time.time()
        if train_loader is None:
            if inputs is None or target is None:
                raise ValueError("No input data")
            train_loader = _as_loader((inputs, target), self.batch_size)
        if valid_loader is None and inputs_valid is not None:
            valid_loader = _as_loader((inputs_valid, target_valid), self.batch_size)

        first = next(iter(train_loader))
        self.init_state(first)

        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.model_dir, exist_ok=True)
        has_valid = valid_loader is not None
        # resume(): continue the epoch loop (and append to the existing
        # log) instead of restarting — the reference has no resume at
        # all (SURVEY.md §5); this pairs with save_full/resume
        start_epoch = getattr(self, "_resume_epoch", 0)
        self._resume_epoch = 0
        if start_epoch == 0 or not os.path.exists(self.log_file):
            with open(self.log_file, "w") as fh:
                if has_valid:
                    fh.write("epoch\t f\t rho\t h\t norm\t val_acc\t val_f1\n")
                else:
                    fh.write("epoch\t f\t rho\t h\t norm\n")

        # instance-held so save_full/resume preserves the CoV window —
        # a resumed run must stop at the same epoch a straight-through
        # run would (fresh list when starting from epoch 0)
        if start_epoch == 0 or not hasattr(self, "_h_hist"):
            self._h_hist = []
        h_hist = self._h_hist
        for self.i in range(start_epoch, self.max_iter):
            self.iter_epoch(train_loader)
            self.save()

            row = (
                f"{self.i}\t {self.f:f}\t {self.rho:f}\t {self.h:f}\t "
                f"{self.norm:f}"
            )
            if has_valid:
                _, self.val_acc, val_f1 = self.test_model(loader=valid_loader)
                if self.val_acc is None:
                    # 'conf' test_func yields no accuracy (confusion
                    # matrix only, opt.py:1029-1033) — no best tracking
                    self.val_acc, val_f1 = float("nan"), float("nan")
                # best-model rule parity: best_h compares with `>` even
                # though h is minimized — a documented reference quirk
                # (opt.py:821-825); default tracks best val accuracy.
                if self.best_h_val and self.h > self.best_h:
                    self.best_h = self.h
                    self.best_rho = self.rho
                    self.best_iter = self.i
                    self.save("_trained_model_best.msgpack")
                elif not self.best_h_val and self.val_acc > self.best_val_acc:
                    self.best_val_acc = self.val_acc
                    self.best_rho = self.rho
                    self.best_iter = self.i
                    self.save("_trained_model_best.msgpack")
                row += f"\t {self.val_acc:f}\t {val_f1:f}"
            with open(self.log_file, "a") as fh:
                fh.write(row + "\n")

            if self.full_ckpt:
                # after the valid eval so the checkpointed best-model
                # tracking includes this epoch's update
                self.save_full()

            h_hist.append(float(self.h))
            # CoV early stop (opt.py:841-845); eps defaults to -1 (inert)
            if self.i >= self.min_iter - 1 and len(h_hist) >= 2:
                window = h_hist[-10:]
                coef_var = float(np.std(window) / np.abs(np.mean(window)))
                if coef_var <= self.eps:
                    break

        elapsed = time.time() - start
        with open(self.log_file, "a") as fh:
            fh.write(
                f"Time elapsed: {elapsed // 3600:2.0f} hrs, "
                f"{(elapsed % 3600) // 60:2.0f} min, {elapsed % 60:4.2f} sec\n"
            )
            fh.write(f"Best Iterate: {self.best_iter}\n")
            if self.best_h_val:
                fh.write(f"Best H: {self.best_h}\n")
            else:
                fh.write(f"Best Validation Accuracy: {self.best_val_acc}\n")
            fh.write(f"Rho: {self.best_rho}\n")

        # final train-set evaluation of the best model (opt.py:868-871)
        eval_loader = train_loader_na if train_loader_na is not None else train_loader
        if has_valid:
            self.test_set(loader=eval_loader, label="Train", crops=crops)

    # ------------------------------------------------------------------
    # evaluation (reference test_model, opt.py:912-1039)
    # ------------------------------------------------------------------
    def test_model(
        self,
        x=None,
        y=None,
        loader=None,
        classes=None,
        model_classes=None,
        other_classes=None,
        crops: bool = False,
    ):
        from sklearn.metrics import confusion_matrix, f1_score, roc_auc_score

        if loader is None:
            loader = _as_loader((x, y), self.batch_size)
        predict_step = self._get(
            "predict_step",
            lambda: jax.jit(
                lambda p, ms, b: self.task.predict(p, ms, b)
            ),
        )

        if other_classes is not None and isinstance(other_classes, int):
            other_classes = [other_classes]

        if self.mesh is not None and jax.process_count() > 1:
            # multi-process: forward passes run on each process's local
            # rows only; per-example OUTPUTS are allgathered (never the
            # input pixels) and padding is already dropped
            loader = self._eval_outputs_sharded(loader, crops=crops)

        f_list, acc_list, f1_list, sizes = [], [], [], []
        outputs_all, labels_all, oc = [], [], []
        for data in loader:
            w = np.asarray(data["w"])
            nreal = int(np.sum(w > 0))

            if "ops" in data:
                # precomputed by _eval_outputs_sharded (all rows real)
                ops = np.asarray(data["ops"])
            else:
                batch = self._put_eval_batch(data)
                xb = batch["x"]
                if crops and xb.ndim == 5:
                    # TenCrop averaging: (B, ncrops, H, W, C) -> mean
                    # logits
                    bc, nc = xb.shape[0], xb.shape[1]
                    flat = {"x": xb.reshape((-1,) + xb.shape[2:]),
                            "y": batch["y"], "w": batch["w"]}
                    ops = predict_step(
                        self.params, self.model_state, flat
                    ).reshape(bc, nc, -1).mean(axis=1)
                else:
                    ops = predict_step(self.params, self.model_state, batch)
                ops = np.asarray(ops)

            ops = ops[:nreal]
            target = np.asarray(data["y"])[:nreal]
            sizes.append(nreal)

            if other_classes is not None and classes is not None:
                rest = [i for i in range(target.shape[1]) if i not in classes]
                oc.extend(np.nansum(target[:, rest], axis=1))

            # class subsetting happens BEFORE the loss, matching
            # reference comp_f (opt.py:558-563): cross-dataset
            # evaluation restricts both output and target columns
            if classes is not None and target.ndim > 1:
                target = target[:, classes]
                ops = ops[:, model_classes if model_classes is not None else classes]
            f_list.append(
                float(
                    self.task.loss(
                        jnp.asarray(ops), jnp.asarray(target), None
                    )
                )
            )

            if any(t in self.test_func for t in ("sigmoid", "logit")):
                ops = 1.0 / (1.0 + np.exp(-ops))

            if "max" in self.test_func:
                predicted = np.argmax(ops, axis=1)
            else:
                predicted = (ops > 0.5).astype(np.float32)

            if "acc" in self.test_func:
                acc_list.append(float(np.mean(predicted == target)) * 100)

            if "auc" in self.test_func or "conf" in self.test_func:
                outputs_all.append(ops if "auc" in self.test_func else predicted)
                labels_all.append(target)
            else:
                f1_list.append(
                    f1_score(target, predicted, average="micro")
                )

        if "auc" in self.test_func:
            labels = np.concatenate(labels_all)
            outputs = np.concatenate(outputs_all)
            ncls = outputs.shape[1]
            roc, f1s = np.zeros(ncls), np.zeros(ncls)
            for i in range(ncls):
                o2, l2 = outputs[:, i], labels[:, i]
                if other_classes is not None:
                    keep = np.asarray([o in other_classes for o in oc])
                    o2, l2 = o2[keep], l2[keep]
                good = l2 == l2  # NaN-label masking (opt.py:1015-1017)
                o2, l2 = o2[good], l2[good]
                try:
                    roc[i] = roc_auc_score(l2, o2)
                except ValueError:
                    roc[i] = np.nan
                f1s[i] = f1_score(l2, (o2 > 0.5).astype(np.float32), average="micro")
            test_acc, test_f1 = float(np.nanmean(roc)), float(f1s.mean())
        elif "conf" in self.test_func:
            labels = np.concatenate(labels_all)
            outputs = np.concatenate(outputs_all)
            conf = confusion_matrix(labels, outputs)
            os.makedirs(self.log_dir, exist_ok=True)
            np.savetxt(
                os.path.join(self.log_dir, self.header2 + "_conf_matrix.csv"),
                conf,
                delimiter=",",
            )
            test_acc, test_f1 = None, None
        else:
            test_acc = float(np.average(acc_list, weights=sizes))
            test_f1 = float(np.average(f1_list, weights=sizes))
        test_loss = float(np.average(f_list, weights=sizes))
        return test_loss, test_acc, test_f1

    def test_model_best(self, x=None, y=None, loader=None, fname=None, **kw):
        self.model_load(fname)
        return self.test_model(x, y, loader, **kw)

    def test_set(self, x=None, y=None, loader=None, fname=None, label="Train", **kw):
        loss, acc, f1 = self.test_model_best(x, y, loader, fname, **kw)
        with open(self.log_file, "a") as fh:
            fh.write(f"{label} Loss: {loss}\n")
            fh.write(f"{label} Accuracy: {acc}\n")
            fh.write(f"{label} F1: {f1}\n")
        return loss, acc, f1

    # ------------------------------------------------------------------
    # rho_test (opt.py:882-910)
    # ------------------------------------------------------------------
    def rho_test(self, x=None, y=None, loader=None, fname=None):
        if fname is not None:
            self.model_load(fname)
        if loader is None:
            loader = _as_loader((x, y), self.batch_size)
        rho_step = self._get("rho_step", self._build_rho_step)
        stats, sizes = [], []
        for j, data in enumerate(loader):
            batch = self._put_batch(data)
            self.rng, r_rng = jax.random.split(self.rng)
            # timing: ``block_until_ready`` does not reliably block over
            # the tunneled TPU — force a host materialization instead.
            # The measured time still includes one fixed device->host
            # RTT (~25-45 ms on the tunnel); it cancels when comparing
            # rows and is negligible off-tunnel.
            t0 = time.perf_counter()
            eig, self.model_state = rho_step(
                self.params, self.model_state, self.v, batch, r_rng,
                self._precond_state,
            )
            host = jax.device_get(
                {"rho": eig.rho, "norm": eig.norm, "iters": eig.iters,
                 "res_change": eig.res_change}
            )
            dt = time.perf_counter() - t0
            self.v = eig.v
            stats.append(
                [
                    j,
                    float(host["rho"]),
                    float(host["norm"]),
                    int(host["iters"]),
                    float(host["res_change"]),
                    dt,
                ]
            )
            sizes.append(float(np.sum(data["w"])))
        arr = np.asarray(stats, dtype=float)
        means = np.average(arr, axis=0, weights=sizes)[1:]
        os.makedirs(self.log_dir, exist_ok=True)
        np.savetxt(
            os.path.join(self.log_dir, self.header2 + "_rho_test.csv"),
            arr,
            delimiter=",",
        )
        return means

    def rho_test_fused(self, x=None, y=None, loader=None, fname=None,
                       batches_per_call: int = 32):
        """All-batch rho audit in ONE device call — a TPU-native
        capability upgrade over the sequential protocol.

        The reference's rho_test (opt.py:882-910) eigensolves batch by
        batch; here every (padded, static-shape) batch is stacked and
        the whole power iteration runs ``jax.vmap``-ed over the batch
        axis, so the audit costs one compile + one dispatch + one
        device->host transfer regardless of dataset size (the per-call
        tunnel RTT otherwise dominates small-model audits).  Lane-wise
        the solve is bit-identical to a sequential solve from the same
        start (the while-loop body is masked on stopped lanes,
        ops/eigen.power_iteration).

        Protocol difference vs :meth:`rho_test` (documented, not
        hidden): every batch starts from the deterministic uniform
        vector (the reference's ``random_v``, opt.py:324-325) instead
        of carrying the previous batch's eigenvector, and BN running
        stats are NOT advanced (no sequential state exists).  The
        LOBPCG-preconditioned mode keeps the sequential path.  Writes
        the same ``*_rho_test.csv`` schema; the per-row time column is
        the batched wall time / n_batches.

        ``batches_per_call`` bounds device memory: the stacked audit
        holds that many batches' activations live at once, so large
        test sets run as a few fused calls instead of one giant one.
        """
        if self.precond_builder is not None:
            # the K-FAC preconditioner is sequential state (factor
            # refresh between batches) — dispatch to the sequential
            # audit so preconditioned results stay comparable
            return self.rho_test(x=x, y=y, loader=loader, fname=fname)
        if fname is not None:
            self.model_load(fname)
        if loader is None:
            loader = _as_loader((x, y), self.batch_size)
        datas = list(loader)

        if "rho_fused" not in self._compiled:

            def one(params, model_state, batch, rng):
                loss_fn = self._loss_fn(model_state, rng)
                _, hvp_fn = curvature.linearize_hvp(loss_fn, params, batch)
                return eigen.estimate_dominant_eig(
                    hvp_fn,
                    tree_uniform_like(params),
                    eps=self.pow_iter_eps,
                    max_iter=self.max_pow_iter,
                    alpha=self.pow_iter_alpha,
                    ignore_bad_vals=self.ignore_bad_vals,
                    momentum=self.pow_iter_momentum,
                    method=self.eigensolver,
                    lanczos_m=self.lanczos_m,
                )

            self._compiled["rho_fused"] = jax.jit(
                jax.vmap(one, in_axes=(None, None, 0, 0))
            )

        self.rng, r = jax.random.split(self.rng)
        rngs = jax.random.split(r, len(datas))
        rows: List[List[float]] = []
        for c0 in range(0, len(datas), batches_per_call):
            chunk = datas[c0:c0 + batches_per_call]
            stacked = {
                k: jnp.stack([jnp.asarray(d[k]) for d in chunk])
                for k in chunk[0]
            }
            t0 = time.perf_counter()
            res = self._compiled["rho_fused"](
                self.params, self.model_state, stacked,
                rngs[c0:c0 + len(chunk)],
            )
            host = jax.device_get(
                {"rho": res.rho, "norm": res.norm, "iters": res.iters,
                 "res_change": res.res_change}
            )
            dt = (time.perf_counter() - t0) / len(chunk)
            rows.extend(
                [c0 + j, float(host["rho"][j]), float(host["norm"][j]),
                 int(host["iters"][j]), float(host["res_change"][j]), dt]
                for j in range(len(chunk))
            )
        arr = np.asarray(rows, dtype=float)
        sizes = [float(np.sum(d["w"])) for d in datas]
        means = np.average(arr, axis=0, weights=sizes)[1:]
        os.makedirs(self.log_dir, exist_ok=True)
        np.savetxt(
            os.path.join(self.log_dir, self.header2 + "_rho_test.csv"),
            arr,
            delimiter=",",
        )
        return means

    # ------------------------------------------------------------------
    # spectrum_test — top-k eigenvalues per batch (capability upgrade
    # over the reference's top-1 rho_test, opt.py:882-910)
    # ------------------------------------------------------------------
    def spectrum_test(self, x=None, y=None, loader=None, k: int = 4,
                      eps: float = 1e-4, max_iter: int = 200,
                      method: str = "subspace", lanczos_m: int = 0):
        """Leading |eigenvalues| of the mini-batch Hessians; writes
        ``<header2>_spectrum_test.csv`` with one row per batch.

        ``method="subspace"`` (default) runs block power iteration to
        ``eps`` (ops/eigen.subspace_iteration); ``method="lanczos"``
        gets all k Ritz values from ONE ``lanczos_m``-step Krylov
        build (default ``max(4k, 16)`` HVPs total — far fewer than
        block iteration's k per sweep; per-value accuracy is reported
        in the resid columns, ops/eigen.lanczos_spectrum).  ``eps`` and
        ``max_iter`` apply to the subspace method only and are ignored
        under lanczos (whose depth is fixed by ``lanczos_m``)."""
        from optwboundeigenval_tpu.utils.tree import (
            tree_axpy as _axpy,
            tree_random_like as _rand,
            tree_uniform_like as _u,
        )

        if loader is None:
            loader = _as_loader((x, y), self.batch_size)
        if method not in ("subspace", "lanczos"):
            raise ValueError(f"spectrum_test method {method!r}")
        m_lz = int(lanczos_m) or max(4 * k, 16)

        # Cache key holds only the knobs the chosen method consumes
        # (re-jitting on an unused eps/max_iter/m_lz change would be a
        # multi-second recompile for nothing).
        if method == "lanczos":
            cache_key = ("spectrum_step", method, k, m_lz)
        else:
            cache_key = ("spectrum_step", method, k, eps, max_iter)
        if cache_key not in self._compiled:
            def step(params, model_state, batch, rng):
                loss_fn = self._loss_fn(model_state, rng)
                _, hvp_fn = curvature.linearize_hvp(loss_fn, params, batch)
                if method == "lanczos":
                    # A single-vector Krylov build cannot resolve
                    # eigenvalue multiplicity, and the deterministic
                    # uniform start can span an invariant subspace
                    # (breakdown -> dead Ritz pairs).  Perturb the
                    # start slightly; top-k accuracy is unaffected
                    # (resid columns report per-value error).
                    r = _rand(rng, params)
                    from optwboundeigenval_tpu.utils.tree import tree_norm
                    v0 = _axpy(1e-2 / tree_norm(r), r, _u(params))
                    return eigen.lanczos_spectrum(
                        hvp_fn, v0, k=k, m=m_lz
                    )
                return eigen.subspace_iteration(
                    hvp_fn, _u(params), k=k, eps=eps, max_iter=max_iter
                )

            self._compiled[cache_key] = jax.jit(step)

        rows = []
        for data in loader:
            batch = self._put_batch(data)
            self.rng, r = jax.random.split(self.rng)
            res = self._compiled[cache_key](
                self.params, self.model_state, batch, r
            )
            res = jax.device_get(res)
            rows.append(
                list(np.asarray(res.eigenvalues))
                + list(np.asarray(res.resid))
                + [int(res.iters)]
            )
        arr = np.asarray(rows, dtype=float)
        os.makedirs(self.log_dir, exist_ok=True)
        np.savetxt(
            os.path.join(self.log_dir, self.header2 + "_spectrum_test.csv"),
            arr, delimiter=",",
        )
        return arr

    # ------------------------------------------------------------------
    # checkpointing (opt.py:765-769, 1041-1071)
    # ------------------------------------------------------------------
    def save(self, tail: str = "_trained_model.msgpack"):
        payload = {
            "params": self.params,
            "model_state": self.model_state,
            "v": self.v,
            "epoch": np.asarray(self.i),
        }
        checkpoints.save_checkpoint(
            os.path.join(self.model_dir, self.header2 + tail), payload
        )

    def save_full(self, tail: str = "_full.msgpack"):
        """Full-state checkpoint for exact resume: params + BN stats +
        optimizer state + warm-started eigenvector + rng + epoch.  The
        reference never checkpoints optimizer state (SURVEY.md §5) —
        this is the TPU-era upgrade."""
        payload = {
            "params": self.params,
            "model_state": self.model_state,
            "opt_state": self.opt_state,
            "v": self.v,
            "rng": self.rng,
            "epoch": np.asarray(self.i),
            # best-model tracking survives resume (the reference's
            # best_acc lives only in process memory, opt.py:821-825)
            "best": np.asarray(
                [self.best_val_acc, self.best_h, self.best_rho,
                 float(self.best_iter)]
            ),
            # CoV early-stop window (opt.py:841-845): without it a
            # resumed run evaluates a truncated window and can stop at
            # a different epoch than the straight-through run
            "h_hist": np.asarray(getattr(self, "_h_hist", []), np.float64),
        }
        checkpoints.save_checkpoint(
            os.path.join(self.model_dir, self.header2 + tail), payload
        )

    def resume(self, fname: Optional[str] = None):
        """Restore a save_full checkpoint (requires init_state first so
        the pytree templates exist)."""
        if fname is None:
            fname = os.path.join(self.model_dir, self.header2 + "_full.msgpack")
        payload = checkpoints.load_checkpoint(fname)
        self.params = checkpoints.restore_like(self.params, payload["params"])
        self.model_state = checkpoints.restore_like(
            self.model_state, payload["model_state"]
        )
        self.opt_state = checkpoints.restore_like(
            self.opt_state, payload["opt_state"]
        )
        self.v = checkpoints.restore_like(self.v, payload["v"])
        self.rng = jnp.asarray(payload["rng"])
        self.i = int(payload["epoch"])
        if "best" in payload:
            b = np.asarray(payload["best"])
            self.best_val_acc, self.best_h = float(b[0]), float(b[1])
            self.best_rho, self.best_iter = float(b[2]), int(b[3])
        if "h_hist" in payload:
            self._h_hist = [float(h) for h in np.asarray(payload["h_hist"])]
        # a subsequent train() continues from the epoch AFTER the
        # checkpointed one instead of restarting at 0
        self._resume_epoch = self.i + 1
        if self.mesh is not None:
            self.params = meshlib.replicate(self.params, self.mesh)
            self.model_state = meshlib.replicate(self.model_state, self.mesh)
            self.opt_state = meshlib.replicate(self.opt_state, self.mesh)
            self.v = meshlib.replicate(self.v, self.mesh)

    def model_load(self, fname: Optional[str] = None):
        if fname is None:
            fname = os.path.join(
                self.model_dir, self.header2 + "_trained_model_best.msgpack"
            )
            if not os.path.exists(fname):
                # no best checkpoint exists (e.g. test_func='conf' has
                # no accuracy to track) — fall back to the last epoch
                fname = os.path.join(
                    self.model_dir, self.header2 + "_trained_model.msgpack"
                )
        payload = checkpoints.load_checkpoint(fname)
        self.params = checkpoints.restore_like(self.params, payload["params"])
        self.model_state = checkpoints.restore_like(
            self.model_state, payload["model_state"]
        )
        if "v" in payload:
            self.v = checkpoints.restore_like(self.v, payload["v"])
        if self.mesh is not None:
            self.params = meshlib.replicate(self.params, self.mesh)
            self.model_state = meshlib.replicate(self.model_state, self.mesh)
            self.v = meshlib.replicate(self.v, self.mesh)

    # ------------------------------------------------------------------
    # log summary (reference parse(), opt.py:1244-1257)
    # ------------------------------------------------------------------
    def parse(self) -> Dict[str, str]:
        with open(self.log_file) as fh:
            lines = fh.readlines()[-10:]
        out: Dict[str, str] = {}
        for ln in lines:
            if ":" in ln:
                k, _, val = ln.partition(":")
                out[k.strip().replace(" ", "_")] = val.strip()
        os.makedirs(self.log_dir, exist_ok=True)
        summary = os.path.join(self.log_dir, self.header2 + "_summary.tsv")
        with open(summary, "w") as fh:
            fh.write("\t".join(out.keys()) + "\n")
            fh.write("\t".join(out.values()) + "\n")
        return out
