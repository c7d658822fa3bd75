"""Full spectral train-step throughput at the tuned configuration.

One step = linearize -> power iteration to pow_iter_eps -> gated vGHv
penalty gradient -> optimizer update, all inside the one jitted
``SpectralTrainer.train_step`` (the reference's per-batch ``iter()``
protocol, opt.py:580-763).  This measures the number users feel —
steps/s of REGULARIZED training — at the knobs the MFU study
(bench_densenet_hvp.py) found optimal: bf16 compute, jax.checkpoint
remat, batch at the per-model sweet spot.

Timing: queue ``n`` asynchronous steps and force one host
materialization at the end (tunnel-safe marginal timing between two
step counts, same method as bench.py).

Usage: python benchmarks/bench_spectral_step.py [--model dn40|dn121]
                                                [--batch 128] [--remat]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_T0 = time.perf_counter()


def _mark(msg: str) -> None:
    """Progress marker on stderr — the parent bench (bench.py) captures
    and surfaces these when a bounded subprocess times out or dies, so
    a fallback-to-recorded is diagnosable from the driver log alone."""
    print(f"# sstep t={time.perf_counter() - _T0:.0f}s {msg}",
          file=sys.stderr, flush=True)


def build_trainer(model_name, batch, remat, defer=False, px=None,
                  hvp_micro=0, scan_steps=1, donate=False,
                  rand_init=False, momentum=None, pow_eps=0.05,
                  lanczos=0, auto_solver=False, device_data=False,
                  workdir="/tmp/bench_sstep"):
    import jax.numpy as jnp

    from optwboundeigenval_tpu.data.device import DeviceArrayLoader
    from optwboundeigenval_tpu.data.loaders import ArrayLoader
    from optwboundeigenval_tpu.data.synthetic import make_images
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.train import SpectralTrainer, Task

    if model_name == "dn40":
        from optwboundeigenval_tpu.models import DenseNet3

        task = Task(model=DenseNet3(dtype=jnp.bfloat16), has_batch_stats=True)
        shape, n_classes = (32, 32, 3), 10
    else:
        from optwboundeigenval_tpu.models.cxr import CXRModel
        from optwboundeigenval_tpu.train.task import weighted_bce_with_logits

        task = Task(
            model=CXRModel(backbone="densenet121", outnum=14,
                           dtype=jnp.bfloat16),
            loss=weighted_bce_with_logits,
            has_batch_stats=True,
        )
        shape, n_classes = (px or 64, px or 64, 3), 14

    x, y = make_images(batch * 4, shape=shape, n_classes=n_classes, seed=0)
    # device_data: place the (small, cycled) bench dataset in HBM once
    # (DeviceArrayLoader) so the scan-chunk path's stacked batches are
    # built by an on-device program — the measurement is device-bound,
    # not tunnel-transfer-bound (the epoch bench's recipe)
    loader_cls = DeviceArrayLoader if device_data else ArrayLoader
    if model_name == "dn121":
        # multilabel targets for the CXR head's W-BCE-compatible CE path
        y = np.eye(14, dtype=np.float32)[y % 14]
        loader = loader_cls(x.astype(np.float32), y, batch_size=batch)
    else:
        loader = loader_cls(
            x.astype(np.float32), y.astype(np.int32), batch_size=batch
        )

    # cifar10_DenseNet recipe knobs (SGD momentum, pow_iter_eps 0.05,
    # binding band K=0 so the vGHv path runs EVERY step — worst case)
    tr = SpectralTrainer(
        task, sgd(0.1, momentum=0.9), mu=0.01, K=0.0, pow_iter_eps=pow_eps,
        batch_size=batch, max_pow_iter=100, ignore_bad_vals=False,
        remat=remat, defer_metrics=defer, hvp_micro=hvp_micro,
        scan_steps=scan_steps, donate=donate,
        rand_init=rand_init, pow_iter_momentum=momentum,
        eigensolver=("auto" if auto_solver
                     else "lanczos" if lanczos else "power"),
        lanczos_m=(None if auto_solver else lanczos or 16),
        header="BENCH_SSTEP", seed=0,
        log_dir=os.path.join(workdir, "logs"),
        model_dir=os.path.join(workdir, "models"),
    )
    batches = list(loader)
    _mark("init_state (first device op: opens TPU client, jits init)")
    tr.init_state(batches[0])
    _mark("init_state done")
    return tr, batches


def measure(model_name="dn40", batch=128, remat=True, defer=False,
            px=None, hvp_micro=0, scan_steps=1, donate=False,
            rand_init=False, momentum=None, pow_eps=0.05,
            lanczos=0, auto_solver=False, device_data=False,
            n_small=5, n_large=20):
    tr, batches = build_trainer(model_name, batch, remat, defer, px=px,
                                hvp_micro=hvp_micro, scan_steps=scan_steps,
                                donate=donate, rand_init=rand_init,
                                momentum=momentum, pow_eps=pow_eps,
                                lanczos=lanczos, auto_solver=auto_solver,
                                device_data=device_data)

    last_deferred = []  # scan mode: per-chunk metrics of the last run()

    if scan_steps > 1:
        import jax.numpy as jnp

        mu_arr = jnp.asarray(0.01, jnp.float32)

        def run(n):
            # chunked-dispatch path: chunks of k steps fused into one
            # lax.scan program (incl. the realistic host-side batch
            # stacking + single stacked transfer per chunk; with
            # --device_data the stack is built on device and the chunk
            # dispatch carries no pixels)
            deferred = []
            data = [batches[i % len(batches)] for i in range(n)]
            for s in range(0, n, scan_steps):
                tr._run_scan_chunk(data[s : s + scan_steps], mu_arr,
                                   deferred)
            np.asarray(deferred[-1]["gradf_norm"])
            last_deferred[:] = deferred

    else:

        def run(n):
            # train_step device_gets its metrics dict, so every step is
            # host-synchronized — the realistic cost of the public API.
            # With --defer, steps are dispatched without the per-step
            # sync (the defer_metrics epoch protocol) and materialized
            # once.
            m = None
            for i in range(n):
                m = tr.train_step(batches[i % len(batches)], fetch=not defer)
            if defer:
                np.asarray(m["rho"])

    _mark("warm/compile the step program (cold: minutes; cached: secs)")
    if scan_steps > 1:
        # time whole chunks only (no remainder re-traces mid-timing)
        n_small = max(scan_steps, (n_small // scan_steps) * scan_steps)
        n_large = max(2 * n_small, (n_large // scan_steps) * scan_steps)
        run(scan_steps)  # warm/compile the chunk-length program
    else:
        run(3)  # warm/compile
    # snapshot the post-warm-up state and restore it before EVERY timed
    # run: the eigensolve's while_loop trip count is state-dependent,
    # so letting training advance across reps times DIFFERENT work
    # (measured: per-rep marginals spread 2.2x from trip-count drift
    # alone) — from a fixed state each run(n) is identical work and
    # the marginal differencing is exact.  Skipped under donate (the
    # step consumes its input buffers, so restoring stale references
    # would crash); no flagship leg donates.
    snap = None
    if not donate:
        snap = (tr.params, tr.model_state, tr.opt_state, tr.v, tr.rng)

    def restore():
        if snap is not None:
            (tr.params, tr.model_state, tr.opt_state, tr.v,
             tr.rng) = snap
            tr._np_rng = np.random.default_rng(tr.seed)

    _mark("compile done; timing loops")
    times = {}
    all_times = {}
    for n in (n_small, n_large):
        reps = []
        for _ in range(3):
            restore()
            t0 = time.perf_counter()
            run(n)
            reps.append(time.perf_counter() - t0)
        times[n] = min(reps)
        all_times[n] = reps
        _mark(f"timed n={n}: best {min(reps):.1f}s")
    steps = (n_large - n_small) / max(times[n_large] - times[n_small], 1e-9)
    # per-rep marginal estimates (pair rep i of each n): a same-session
    # dispersion for the VERDICT's max/min <= 1.25 device-boundedness
    # criterion, without re-running the whole measurement 3x
    steps_reps = [
        round((n_large - n_small)
              / max(all_times[n_large][i] - all_times[n_small][i], 1e-9), 4)
        for i in range(3)
    ]

    # end-to-end MFU via XLA's cost model: one spectral step =
    # (pow_iters + 3) HVP-equivalents (SURVEY.md §3.1 — gradient, power
    # iterations, gated vGHv ≈ 2 HVPs), with the per-HVP flop count
    # from the compiled program's cost analysis
    if scan_steps > 1:
        # scan mode: pow_iters from the timed run's own deferred
        # metrics — calling the per-batch train_step here would
        # cold-compile a SECOND whole-step program just to read it
        pow_iters = float(np.mean([
            np.mean(np.asarray(d["pow_iters"])) for d in last_deferred
        ]))
        rho = float("nan")  # per-step rho is deferred out of scan chunks
    else:
        m = tr.train_step(batches[0], fetch=True)
        pow_iters = float(np.asarray(m["pow_iters"]))
        rho = float(np.asarray(m["rho"]))
    mfu = None
    try:
        import jax

        from benchmarks.bench_densenet_hvp import (
            V5E_BF16_PEAK,
            hvp_flops,
        )

        loss_fn = tr.task.loss_fn(tr.model_state, None)
        if remat:
            loss_fn = jax.checkpoint(loss_fn)
        from optwboundeigenval_tpu.utils.tree import tree_uniform_like

        f_hvp = hvp_flops(
            loss_fn, tr.params, tr._put_batch(batches[0]),
            tree_uniform_like(tr.params),
        )
        mfu = (
            100.0 * steps * (pow_iters + 3.0) * f_hvp / V5E_BF16_PEAK
        )
    except Exception as e:  # cost analysis platform-dependent
        print(f"# mfu estimate unavailable: {e}", flush=True)

    return dict(
        model=model_name, batch=batch, remat=remat, defer=defer,
        px=px, hvp_micro=hvp_micro, scan_steps=scan_steps, donate=donate,
        rand_init=rand_init, momentum=momentum, pow_eps=pow_eps,
        lanczos=lanczos, auto_solver=auto_solver,
        device_data=device_data,
        eigensolver=tr.eigensolver, lanczos_m=tr.lanczos_m,
        steps_per_sec=round(steps, 4),
        steps_per_sec_reps=steps_reps,
        examples_per_sec=round(steps * batch, 1),
        mean_pow_iters=pow_iters,
        rho=None if np.isnan(rho) else round(rho, 6),
        mfu_pct_bf16_peak=round(mfu, 2) if mfu is not None else None,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dn40", choices=["dn40", "dn121"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--defer", action="store_true")
    ap.add_argument("--px", type=int, default=None,
                    help="dn121 input resolution (default 64; the "
                    "reference's CXR pipeline is 224, dcnn.py:86-89)")
    ap.add_argument("--hvp_micro", type=int, default=0)
    ap.add_argument("--scan_steps", type=int, default=1,
                    help="fuse chunks of k steps into one lax.scan "
                         "program (implies the defer protocol)")
    ap.add_argument("--rand_init", action="store_true",
                    help="fresh eigenvector every batch (the chestxray "
                         "best_reg recipe, params/chestxray_best_reg.py) "
                         "— the many-power-iterations regime")
    ap.add_argument("--pow_eps", type=float, default=0.05,
                    help="pow_iter_eps (reference default 1e-3; the "
                         "cifar recipe's 0.05 is the bench default)")
    ap.add_argument("--auto", action="store_true", dest="auto_solver",
                    help="eigensolver='auto' (the shipped policy: "
                         "early-exit Krylov under rand_init / tight "
                         "eps, eps-scaled depth cap)")
    ap.add_argument("--lanczos", type=int, default=0,
                    help="use the m-step Lanczos eigensolve instead of "
                         "power iteration (ops/eigen.py lanczos_dominant)")
    ap.add_argument("--momentum", type=float, default=None,
                    help="pow_iter_momentum: heavy-ball accelerated "
                         "eigensolve (ops/eigen.py)")
    ap.add_argument("--donate", action="store_true",
                    help="donate params/opt_state/v into the step "
                         "program (in-place update, ~1 param+opt tree "
                         "less peak HBM)")
    ap.add_argument("--device_data", action="store_true",
                    help="device-resident bench dataset "
                         "(DeviceArrayLoader): with --scan_steps the "
                         "chunk dispatch carries no pixels, so the "
                         "measurement is device-bound (tight), not "
                         "host-dispatch/VM-load-bound")
    ap.add_argument("--n_small", type=int, default=5)
    ap.add_argument("--n_large", type=int, default=20)
    args = ap.parse_args()
    print(json.dumps(measure(args.model, args.batch, args.remat,
                             args.defer, px=args.px,
                             hvp_micro=args.hvp_micro,
                             scan_steps=args.scan_steps,
                             donate=args.donate,
                             rand_init=args.rand_init,
                             momentum=args.momentum,
                             pow_eps=args.pow_eps,
                             lanczos=args.lanczos,
                             auto_solver=args.auto_solver,
                             device_data=args.device_data,
                             n_small=args.n_small,
                             n_large=args.n_large)), flush=True)
