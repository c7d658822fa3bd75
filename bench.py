"""Headline benchmark: big-model Hessian-vector-product throughput with
measured MFU.

HVPs dominate spectral training cost (SURVEY.md §3.1: one batch with
active regularizer = #pow_iters + 3 backwards).  Round 1 headlined a
tiny-CNN number that was pure dispatch overhead; the headline is now
DenseNet-40-12 (the reference's CIFAR workhorse, densenet.py) at its
throughput-optimal configuration on this chip (batch 128, bf16 compute
with f32 params, jax.checkpoint remat — recomputing forward residuals
in the tangent pass beats round-tripping them through HBM by 1.30x;
the SpectralTrainer(remat=True) knob), with FLOPs from XLA's cost model of the compiled
program and MFU against the chip's bf16 MXU peak — a roofline
statement, not a wall-clock anecdote.

Baseline: the reference implementation pattern (PyTorch CPU float64,
cached create-graph gradient, repeated ``autograd.grad`` products,
opt.py:77-108) measured on this machine for the SAME model:
**0.16 HVPs/sec** at batch 32 (benchmarks/
measure_torch_densenet_baseline.py).  ``vs_baseline`` compares
per-EXAMPLE curvature throughput (HVPs/sec x batch), which normalizes
the batch-size difference.

Measurement: on the tunneled TPU ``block_until_ready`` does not
reliably block and device->host transfers pay a fixed tunnel RTT, so
throughput is the *marginal* cost between two scan lengths with forced
host materialization.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}
(extra keys: mfu_pct_bf16_peak, tflops_per_sec, usps_hvps_per_sec for
round-1 continuity).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# measured 2026-08-16 (see module docstring / benchmarks/)
TORCH_CPU_DENSENET40_HVPS_PER_SEC = 0.16
TORCH_CPU_DENSENET40_BATCH = 32
TORCH_CPU_USPS_BASELINE_HVPS_PER_SEC = 24.27

BATCH = 128


def usps_hvps_per_sec() -> float:
    """Round-1 continuity metric: tiny-CNN HVP/s (dispatch-bound)."""
    from optwboundeigenval_tpu.models import CNNUSPS
    from optwboundeigenval_tpu.ops import curvature
    from optwboundeigenval_tpu.train import Task
    from optwboundeigenval_tpu.utils.tree import tree_uniform_like

    task = Task(model=CNNUSPS())
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.normal(size=(128, 16, 16, 1)).astype(np.float32)),
        "y": jnp.asarray(rng.integers(0, 10, size=128).astype(np.int32)),
        "w": jnp.ones(128, jnp.float32),
    }
    params, _ = task.init(jax.random.PRNGKey(0), batch["x"])
    loss_fn = task.loss_fn({}, None)

    def make_run(n):
        @jax.jit
        def run(params, batch, v):
            _, hvp_fn = curvature.linearize_hvp(loss_fn, params, batch)

            def body(v, _):
                hv = hvp_fn(v)
                nrm = jnp.sqrt(
                    sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(hv))
                )
                return jax.tree.map(lambda x: x / nrm, hv), nrm

            return jax.lax.scan(body, v, None, length=n)

        return run

    v0 = tree_uniform_like(params)
    times = {}
    for n in (400, 1600):
        run = make_run(n)
        np.asarray(run(params, batch, v0)[1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(params, batch, v0)[1])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return 1200 / max(times[1600] - times[400], 1e-9)


def _run_bounded(cmd, timeout_s, tag):
    """Run one bench subprocess with a wall-clock bound; return its
    parsed JSON line or None.  On ANY failure the child's stage markers
    (bench_spectral_step._mark lines on stderr) are surfaced on OUR
    stderr, so a fallback-to-recorded is diagnosable from the driver
    log alone — r03 shipped recorded values for its two flagship keys
    with no trace of why."""
    import subprocess
    import sys

    err_tail = ""
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout_s)
        err_tail = (out.stderr or "")[-2000:]
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        print(f"# {tag}: no JSON from subprocess (rc={out.returncode}); "
              f"stderr tail:\n{err_tail}", file=sys.stderr, flush=True)
    except subprocess.TimeoutExpired as e:
        err_tail = ((e.stderr.decode(errors="replace") if e.stderr else "")
                    )[-2000:]
        print(f"# {tag}: timed out after {timeout_s}s; stderr tail:\n"
              f"{err_tail}", file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover - subprocess plumbing
        print(f"# {tag}: subprocess failed: {e}", file=sys.stderr,
              flush=True)
    return None


def ensure_warm_cache(budget_s: int = 7200):
    """Wipe-proof pre-stage: if the repo-local XLA cache is missing any
    of the programs the bench's stages compile (the marker
    .xla_cache/.owb_warmed.json lives INSIDE the cache dir, so a wipe
    clears it too), run benchmarks/warm_cache.py for the missing stages
    UNBOUNDED (well, with a very generous OWB_BENCH_WARM_BUDGET backstop)
    BEFORE any budgeted subprocess.  The per-stage budgets downstream
    stay as backstops, not as the plan — this environment has wiped
    .xla_cache three times (r03 shipped recorded values because of it).
    """
    import os
    import subprocess
    import sys

    from benchmarks import warm_cache

    warmed = warm_cache.read_marker()
    missing = [name for name, _ in warm_cache.STAGES if name not in warmed]
    if not missing:
        print("# warm pre-stage: cache marker complete, skipping",
              file=sys.stderr, flush=True)
        return "marker_complete"
    budget_s = int(os.environ.get("OWB_BENCH_WARM_BUDGET", budget_s))
    here = os.path.dirname(os.path.abspath(__file__))
    print(f"# warm pre-stage: cold/partial cache, warming {missing} "
          f"(budget {budget_s}s)", file=sys.stderr, flush=True)
    try:
        subprocess.run(
            [sys.executable,
             os.path.join(here, "benchmarks", "warm_cache.py")] + missing,
            timeout=budget_s, stdout=sys.stderr, stderr=subprocess.STDOUT,
        )
        return f"warmed:{','.join(missing)}"
    except subprocess.TimeoutExpired:
        print("# warm pre-stage: budget exhausted; remaining stages "
              "self-heal via their own retries", file=sys.stderr,
              flush=True)
        return "budget_exhausted"
    except Exception as e:  # pragma: no cover - subprocess plumbing
        print(f"# warm pre-stage failed: {e}", file=sys.stderr, flush=True)
        return "failed"


def _measure_sidecar_bounded(cmd, budget_s, tag, sidecar, seed_fixture):
    """Bounded-subprocess measurement with one retry (attempt 1 on a
    cold cache pays/populates the compile; attempt 2 measures warm) and
    sidecar/seed-fixture fallback labeled as recorded."""
    import os

    res = None
    for attempt in (1, 2):
        res = _run_bounded(cmd, budget_s, f"{tag} attempt {attempt}")
        if res is not None:
            res[f"{tag}_attempts"] = attempt
            break
    if res is not None:
        res[f"{tag}_source"] = "live"
        try:
            with open(sidecar, "w") as fh:
                json.dump(res, fh)
        except OSError:
            pass
        return res
    for fallback in (sidecar, seed_fixture):
        if not os.path.exists(fallback):
            continue
        try:
            with open(fallback) as fh:
                res = json.load(fh)
            res[f"{tag}_source"] = "recorded"
            return res
        except (json.JSONDecodeError, OSError, ValueError):
            continue
    return None


def measure_s224_scan_bounded(budget_s: int = 1500):
    """DenseNet121@224px spectral step, DEVICE-BOUND leg: scan_steps=8
    chunked dispatch over a device-resident dataset (one XLA launch per
    8 steps, no per-chunk pixel transfer), in a bounded subprocess.
    This is the flagship headline key since r05 — the former per-step
    measurement (kept as the *_dispatch secondary key) is
    host-dispatch-bound and rides the shared VM's load (0.56-1.76
    steps/s live with identical code, BENCH_r02-r04); chunked dispatch
    makes the number a property of the CHIP (VERDICT r04 #2; the
    acceptance bar is rep dispersion max/min <= 1.25)."""
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    budget_s = int(os.environ.get("OWB_BENCH_S224_BUDGET", budget_s))
    cmd = [
        sys.executable,
        os.path.join(here, "benchmarks", "bench_spectral_step.py"),
        "--model", "dn121", "--px", "224", "--batch", "64",
        "--remat", "--defer", "--scan_steps", "8", "--device_data",
        "--n_small", "8", "--n_large", "24",
    ]
    return _measure_sidecar_bounded(
        cmd, budget_s, "s224_scan",
        os.path.join(here, "benchmarks", "last_s224_scan.json"),
        os.path.join(here, "benchmarks", "s224_scan_seed.json"),
    )


def measure_s224_bounded(budget_s: int = 1500):
    """DenseNet121@224px spectral step, in a BOUNDED subprocess.

    The 224px step program's cold compile is ~12-28 min on the tunneled
    chip and can exceed any one attempt's budget; the compiled
    executable persists in the repo-local XLA cache (.xla_cache/ — a
    ~300 MB entry), so the stage SELF-HEALS a cold cache by retrying
    once: attempt 1 pays the compile (XLA writes the cache entry even
    when the measuring process is killed right after compilation;
    verified 2026-08-19 — a 900 s-killed cold run left a cache entry
    the immediate rerun loaded in ~190 s and measured live in ~500 s
    total).  Attempt budgets: OWB_BENCH_S224_BUDGET per attempt
    (default 1500 s — an uncontended cold compile measured 891 s on
    2026-08-19, one VM-load fluctuation away from the former 900 s
    bound, and a kill mid-compile writes NO cache entry, defeating the
    self-heal), so the stage's worst case is 2x that plus the retry's
    measurement.  Must run BEFORE the parent touches the TPU:
    the tunneled chip serves one client at a time, so the child gets
    exclusive access and exits before the parent's first device op."""
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    sidecar = os.path.join(here, "benchmarks", "last_s224.json")
    seed_fixture = os.path.join(here, "benchmarks", "s224_seed.json")
    budget_s = int(os.environ.get("OWB_BENCH_S224_BUDGET", budget_s))
    cmd = [
        sys.executable,
        os.path.join(here, "benchmarks", "bench_spectral_step.py"),
        "--model", "dn121", "--px", "224", "--batch", "64",
        "--remat", "--defer",
    ]
    # best-ever live measurement on this chip: the tunneled VM's load
    # varies run to run (measured 5.6-10.9% MFU for identical code/
    # config), so alongside today's live number the sidecar carries the
    # best previously completed one — monotone, never synthetic
    prev_best = {}
    for prior in (sidecar, seed_fixture):
        if not os.path.exists(prior):
            continue
        # a truncated/corrupt sidecar (killed mid-write) must degrade to
        # "no prior measurement", never crash the bench before the live
        # run that would rewrite it
        try:
            with open(prior) as fh:
                prev = json.load(fh)
            prev_best = {
                k: prev[k]
                for k in ("best_steps_per_sec", "best_examples_per_sec",
                          "best_mfu_pct")
                if k in prev
            }
            if prev.get("s224_source") == "live" and (
                prev.get("steps_per_sec", 0.0)
                > prev_best.get("best_steps_per_sec", 0.0)
            ):
                prev_best = {
                    "best_steps_per_sec": prev["steps_per_sec"],
                    "best_examples_per_sec": prev.get("examples_per_sec"),
                    "best_mfu_pct": prev.get("mfu_pct_bf16_peak"),
                }
            break
        except (json.JSONDecodeError, OSError, ValueError):
            prev_best = {}
    res = None
    for attempt in (1, 2):
        res = _run_bounded(cmd, budget_s, f"s224 attempt {attempt}")
        if res is not None:
            res["s224_attempts"] = attempt
            break
        # attempt 1 usually dies on a COLD cache mid/just-after compile;
        # the cache entry it wrote makes attempt 2 a warm ~500 s measure
    if res is not None:
        res["s224_source"] = "live"
        res.update(prev_best)
        if res["steps_per_sec"] > res.get("best_steps_per_sec", 0.0):
            res["best_steps_per_sec"] = res["steps_per_sec"]
            res["best_examples_per_sec"] = res["examples_per_sec"]
            res["best_mfu_pct"] = res["mfu_pct_bf16_peak"]
        try:
            with open(sidecar, "w") as fh:
                json.dump(res, fh)
        except OSError:
            pass
        return res
    # both attempts failed: fall back to the last completed measurement
    # on this same chip (gitignored live sidecar, then the committed
    # seed fixture), labeled as recorded rather than silently live
    for fallback in (sidecar, seed_fixture):
        if not os.path.exists(fallback):
            continue
        try:
            with open(fallback) as fh:
                res = json.load(fh)
        except (json.JSONDecodeError, OSError, ValueError):
            continue
        res["s224_source"] = "recorded"
        # pre-best-schema sidecars lack the best_* keys; carry over the
        # best derived from the sidecar's own live entry above
        res.update({k: v for k, v in prev_best.items() if k not in res})
        return res
    return None


def measure_eigensolve_bounded(leg_budget_s: int = 900):
    """Reference-protocol eigensolve comparison, in BOUNDED subprocesses.

    The regime is the reference's own: its default ``pow_iter_eps=1e-3``
    and the CXR flagship's ``rand_init=True`` (fresh eigenvector every
    batch, params/chestxray_best_reg.py) — the many-power-iterations
    case where the eigensolve dominates the step.  Three full spectral
    train-step measurements on dn40/b128/bf16+remat+defer:

      * ``power``  — plain power iteration (the reference's protocol,
        opt.py:418-533): the policy-OFF baseline;
      * ``lanczos`` — the fixed m=8 Krylov solve (ops/eigen.py
        lanczos_dominant, a capability the reference does not have);
      * ``auto``   — the SHIPPED ``eigensolver='auto'`` policy (what
        the best_reg config family actually runs: early-exit Krylov,
        eps-scaled depth cap): the policy-ON number.

    Each leg gets its OWN wall-clock budget (``OWB_BENCH_EIG_BUDGET``
    per leg, default 900 s — r03's single shared 300 s budget killed
    the power leg mid-measure and shipped a recorded value, and the
    measured COLD compiles are 508 s (power) / 685 s (lanczos), so the
    earlier 480 s default could not even self-heal a wiped cache) and
    retries once like the s224 stage (attempt 1's compile populates
    .xla_cache when it finishes inside the budget, making attempt 2 a
    warm measure), so the stage worst case is 6x the leg budget — but
    the warm-cache common case is ~90 s/leg.  Legs are ratio keys
    measured in the SAME session, so VM load variance cancels in the
    speedup.
    Subprocesses run BEFORE the parent touches the TPU (one tunneled
    client at a time).  Fallback order on failure: the gitignored live
    sidecar (benchmarks/last_eigsolve.json) from a previous run on this
    machine, then the committed seed fixture
    (benchmarks/eigsolve_seed.json)."""
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    sidecar = os.path.join(here, "benchmarks", "last_eigsolve.json")
    seed_fixture = os.path.join(here, "benchmarks", "eigsolve_seed.json")
    leg_budget_s = int(os.environ.get("OWB_BENCH_EIG_BUDGET", leg_budget_s))
    base = [
        sys.executable,
        os.path.join(here, "benchmarks", "bench_spectral_step.py"),
        "--model", "dn40", "--batch", "128",
        "--remat", "--defer", "--rand_init", "--pow_eps", "1e-3",
    ]
    legs = (("power", []), ("lanczos", ["--lanczos", "8"]),
            ("auto", ["--auto"]))
    res = {}
    for name, extra in legs:
        m = None
        for attempt in (1, 2):
            m = _run_bounded(base + extra, leg_budget_s,
                             f"eigensolve {name} attempt {attempt}")
            if m is not None:
                break
        if m is None:
            res = None
            break
        res[f"{name}_steps_per_sec"] = m["steps_per_sec"]
    if res is not None:
        res["eigsolve_source"] = "live"
        try:
            with open(sidecar, "w") as fh:
                json.dump(res, fh)
        except OSError:
            pass
        return res
    for fallback in (sidecar, seed_fixture):
        if os.path.exists(fallback):
            try:
                with open(fallback) as fh:
                    res = json.load(fh)
                res["eigsolve_source"] = "recorded"
                return res
            except (json.JSONDecodeError, OSError, ValueError):
                continue
    return None


def measure_eigensolve_loose_bounded(leg_budget_s: int = 900):
    """Eigensolver policy at the LOOSE-eps warm-start regime — the
    half of the policy the refproto legs cannot see (VERDICT r04 #4).

    Regime: the cifar10_DenseNet recipe's ``pow_iter_eps=0.05`` with
    warm-started eigenvectors (``v`` persists across steps — the
    reference default, opt.py:447-455), where the power iteration
    converges in ~1-2 HVPs per step.  Here a fixed-m Krylov build
    (m=8 HVPs per step) MUST lose, and ``eigensolver='auto'`` must
    decline Lanczos and match plain power.  Three legs measured in the
    same session so VM-load variance cancels in the ratios:

      * ``power``   — plain power iteration (also the dn40_defer
        dispatch program: warm-cached);
      * ``lanczos`` — fixed m=8 Krylov solve, policy-OFF worst case;
      * ``auto``    — the shipped policy (must track power here).

    Pass criterion (recorded in PERF.md, not enforced here):
    auto/power >= 0.9 and lanczos/power < 1."""
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    sidecar = os.path.join(here, "benchmarks", "last_eigsolve_loose.json")
    seed_fixture = os.path.join(here, "benchmarks",
                                "eigsolve_loose_seed.json")
    leg_budget_s = int(os.environ.get("OWB_BENCH_EIG_BUDGET", leg_budget_s))
    base = [
        sys.executable,
        os.path.join(here, "benchmarks", "bench_spectral_step.py"),
        "--model", "dn40", "--batch", "128", "--remat", "--defer",
    ]
    legs = (("power", []), ("lanczos", ["--lanczos", "8"]),
            ("auto", ["--auto"]))
    res = {}
    for name, extra in legs:
        m = None
        for attempt in (1, 2):
            m = _run_bounded(base + extra, leg_budget_s,
                             f"eigensolve-loose {name} attempt {attempt}")
            if m is not None:
                break
        if m is None:
            res = None
            break
        res[f"{name}_steps_per_sec"] = m["steps_per_sec"]
        res[f"{name}_mean_pow_iters"] = m.get("mean_pow_iters")
    if res is not None:
        res["loose_source"] = "live"
        try:
            with open(sidecar, "w") as fh:
                json.dump(res, fh)
        except OSError:
            pass
        return res
    for fallback in (sidecar, seed_fixture):
        if os.path.exists(fallback):
            try:
                with open(fallback) as fh:
                    res = json.load(fh)
                res["loose_source"] = "recorded"
                return res
            except (json.JSONDecodeError, OSError, ValueError):
                continue
    return None


def _session_meta():
    """Chip-session metadata stamped into every bench line, so numbers
    from different rounds are comparable (or visibly not: the shared
    tunneled VM's load varies up to ~2x between sessions)."""
    import datetime

    meta = {
        "utc": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        ),
    }
    try:
        d = jax.devices()[0]
        meta["device"] = f"{d.device_kind} ({d.platform})"
        meta["jax"] = jax.__version__
    except Exception:
        pass
    return meta


def _median3(values):
    """Median + spread of a small list of repeated measurements.

    The tunneled VM's load varies up to ~2x run-to-run (RESULTS.md),
    so every absolute throughput key carries {median, min, max} of 3
    same-session repeats — a single draw is not a measurement
    protocol.  Ratio keys (eigensolve speedups) instead cancel the
    variance by measuring both legs in the same session."""
    vs = sorted(float(v) for v in values)
    return {
        "value": vs[len(vs) // 2],
        "min": vs[0],
        "max": vs[-1],
        "n_reps": len(vs),
    }


DN40_ROOFLINE_CEILING_MFU = 8.65  # flop-weighted standalone per-shape
# conv ceiling, measured benchmarks/dn40_conv_roofline.py (r04; the k3
# 12-out-channel convs cap MXU lane occupancy — RESULTS.md roofline)


def write_perf_md(res: dict, path: str = "PERF.md") -> None:
    """One-page authoritative perf contract (VERDICT r04 #8): a single
    regenerated table per bench run, so regressions are one diff away
    instead of archaeology across RESULTS.md sections."""

    def disp(key):
        d = res.get(key)
        if not d:
            return "—"
        return f"{d['min']:.4g}–{d['max']:.4g} (n={d['n_reps']})"

    def f(key, fmt="{:.4g}"):
        v = res.get(key)
        return fmt.format(v) if v is not None else "—"

    sess = res.get("session", {})
    mfu_dn40 = res.get("mfu_pct_dn40_defer")
    pct_ceil = (f"{100*mfu_dn40/DN40_ROOFLINE_CEILING_MFU:.0f}%"
                if mfu_dn40 else "—")
    hvp_mfu = res.get("mfu_pct_bf16_peak")
    hvp_ceil = (f"{100*hvp_mfu/DN40_ROOFLINE_CEILING_MFU:.0f}%"
                if hvp_mfu else "—")
    lines = [
        "# PERF — authoritative per-workload contract",
        "",
        f"Regenerated by every `python bench.py` run "
        f"(this one: {sess.get('utc', '?')}, {sess.get('device', '?')}, "
        f"jax {sess.get('jax', '?')}).  Device-bound keys are the "
        "contract (scan-chunked dispatch, chip-resident data, "
        "state-restored timing reps — a property of the CHIP); "
        "`dispatch` keys are what a remote per-step loop feels and "
        "ride the shared VM's load (up to ~3x same-code spread, "
        "BENCH_r02–r04).",
        "",
        "| workload | value | dispersion (min–max) | MFU % | roofline "
        "ceiling | % of ceiling | source |",
        "|---|---|---|---|---|---|---|",
        f"| dn40 HVP (b128 bf16 remat) | {f('hvps_per_sec')} HVP/s | "
        f"{disp('hvps_per_sec_dispersion')} | {f('mfu_pct_bf16_peak')} | "
        f"{DN40_ROOFLINE_CEILING_MFU}% (conv roofline) | {hvp_ceil} | "
        f"live |",
        f"| dn40 spectral step, scan32 device-data | "
        f"{f('spectral_steps_per_sec_dn40_defer')} steps/s | "
        f"{disp('spectral_steps_per_sec_dn40_defer_dispersion')} | "
        f"{f('mfu_pct_dn40_defer')} | {DN40_ROOFLINE_CEILING_MFU}% | "
        f"{pct_ceil} | live |",
        f"| dn40 spectral step, per-step dispatch | "
        f"{f('spectral_steps_per_sec_dn40_defer_dispatch')} steps/s | "
        f"{disp('spectral_steps_per_sec_dn40_defer_dispatch_dispersion')}"
        f" | — | — | — | live (VM-load-sensitive) |",
        f"| dn121@224 spectral step, scan8 device-data | "
        f"{f('spectral_steps_per_sec_dn121_224')} steps/s "
        f"({f('examples_per_sec_dn121_224')} ex/s) | "
        f"{disp('spectral_steps_per_sec_dn121_224_dispersion')} | "
        f"{f('mfu_pct_dn121_224')} | — | — | "
        f"{res.get('s224_source') or '—'} |",
        f"| dn121@224 spectral step, per-step dispatch | "
        f"{f('spectral_steps_per_sec_dn121_224_dispatch')} steps/s | "
        f"— | {f('mfu_pct_dn121_224_dispatch')} | — | — | "
        f"{res.get('s224_dispatch_source') or '—'} "
        f"(best ever: {f('examples_per_sec_dn121_224_best')} ex/s, "
        f"{f('mfu_pct_dn121_224_best')}% MFU) |",
        f"| CIFAR-50k epoch (391 steps + eval + rho) | "
        f"{f('epoch_wallclock_s_cifar50k')} s | — | — | — | — | live "
        f"({f('epoch_speedup_vs_torch_cpu', '{:.0f}')}x vs torch-CPU "
        f"projection) |",
        f"| eigensolve refproto (eps=1e-3, rand_init): lanczos vs "
        f"power | {f('eigensolve_speedup_lanczos')}x | — | — | — | — | "
        f"{res.get('eigsolve_source') or '—'} |",
        f"| eigensolve refproto: auto policy vs power | "
        f"{f('eigensolve_speedup_auto_policy')}x | — | — | — | — | "
        f"{res.get('eigsolve_source') or '—'} |",
        f"| eigensolve LOOSE (eps=0.05, warm v): auto vs power "
        f"(must be ≈1) | {f('eigensolve_loose_auto_vs_power')}x | — | — "
        f"| — | — | {res.get('loose_source') or '—'} |",
        f"| eigensolve LOOSE: lanczos vs power (must be <1 — auto "
        f"declines it) | {f('eigensolve_loose_lanczos_vs_power')}x | — "
        f"| — | — | — | {res.get('loose_source') or '—'} |",
        f"| USPS tiny-CNN HVP (dispatch-bound continuity key) | "
        f"{f('usps_hvps_per_sec')} HVP/s | — | — | — | — | live "
        f"({f('usps_vs_torch_cpu')}x vs torch CPU) |",
        "",
        f"Headline vs reference pattern: "
        f"{f('value')} curvature examples/s/chip = "
        f"{f('vs_baseline')}x the torch-CPU reference protocol "
        f"(0.16 HVP/s x batch 32, BASELINE.md).  Warm pre-stage: "
        f"{res.get('warm_prestage', '—')}.",
        "",
    ]
    try:
        with open(path, "w") as fh:
            fh.write("\n".join(lines))
    except OSError:
        pass


def main() -> None:
    import sys

    t_start = time.perf_counter()

    def _stage(name):
        print(f"# bench stage {name} at t={time.perf_counter() - t_start:.0f}s",
              file=sys.stderr, flush=True)

    # ZEROTH: if the cache was wiped, warm every stage program
    # unbounded before any budgeted subprocess runs (VERDICT r04 #3)
    _stage("warm_cache_prestage")
    warm_status = ensure_warm_cache()
    # FIRST, before this process opens the TPU client (one client at a
    # time through the tunnel): the heavyweight 224px measures, bounded.
    # The scan8 device-bound leg is the r05+ flagship key; the per-step
    # dispatch leg stays as the *_dispatch secondary (what a remote
    # user's per-step loop feels).
    _stage("dn121_224_scan_subprocess")
    s224s = measure_s224_scan_bounded()
    _stage("dn121_224_sstep_subprocess")
    s224 = measure_s224_bounded()
    # reference-protocol eigensolve speedup (also pre-client subprocesses)
    _stage("eigensolve_refproto_subprocess")
    eig = measure_eigensolve_bounded()
    # loose-eps warm-start regime: the policy's must-decline half
    _stage("eigensolve_loose_subprocess")
    eig_loose = measure_eigensolve_loose_bounded()

    from benchmarks.bench_densenet_hvp import measure
    from benchmarks.bench_spectral_step import measure as measure_step

    # 3 same-session repeats per absolute key (dispersion protocol —
    # the spectral_steps_per_sec_dn40_defer key moved 28.1 -> 17.7
    # between r02 and r03 with nothing but VM load to blame; median +
    # min/max makes that attributable from the JSON alone)
    _stage("dn40_hvp")
    dn_reps = [measure(batch=BATCH, dtype=jnp.bfloat16, remat=True)
               for _ in range(3)]
    dn_disp = _median3([r["hvps_per_sec"] for r in dn_reps])
    dn = next(r for r in dn_reps
              if r["hvps_per_sec"] == dn_disp["value"])
    # end-to-end regularized training: full train_step (power iter +
    # vGHv + SGD) with the defer_metrics epoch protocol — the
    # host-dispatch-bound secondary key (VM-load-sensitive)
    _stage("dn40_sstep_dispatch")
    sstep_reps = [
        measure_step("dn40", batch=BATCH, remat=True, defer=True)
        for _ in range(3)
    ]
    sstep_disp = _median3([r["steps_per_sec"] for r in sstep_reps])
    # the DEVICE-BOUND flagship leg: scan_steps=32 chunked dispatch
    # over a device-resident dataset (one XLA launch per 32 steps; the
    # epoch bench's recipe) — tight across reps and sessions because
    # the number is a property of the chip, not of the shared VM's
    # dispatch latency (VERDICT r04 #2)
    _stage("dn40_sstep_scan32")
    scan_reps = [
        measure_step("dn40", batch=BATCH, remat=True, defer=True,
                     scan_steps=32, device_data=True,
                     n_small=64, n_large=192)
        for _ in range(3)
    ]
    scan_disp = _median3([r["steps_per_sec"] for r in scan_reps])
    # reference-scale heavy workload: DenseNet121 at the CXR pipeline's
    # 224px (dcnn.py:86-89), end-to-end spectral step at the swept
    # sweet spot (RESULTS.md round-3 224px table)
    # north-star: one COMPLETE CIFAR-10-scale epoch (50k images, 391
    # spectral steps + epoch-end full-train-set eval + random-batch
    # rho) with the device-resident dataset (DeviceArrayLoader: pixels
    # live in HBM, per-step host->device traffic is a 512 B index
    # vector — the tunneled-TPU epoch is transfer-bound otherwise)
    from benchmarks.bench_epoch_wallclock import main as measure_epoch

    # scan_steps=32 is the fastest full-epoch config (16.66 s measured
    # vs 17.58 s at scan8, RESULTS.md epoch table — 12 full chunks + a
    # 7-step remainder program); its chunk-length scan programs are
    # multi-minute compiles the FIRST time ever, but the repo-local
    # persistent cache (.xla_cache/) holds them afterwards, so this
    # stage loads in seconds on the machine the driver benches on
    _stage("epoch_wallclock")
    epoch = measure_epoch(device_data=True, scan_steps=32, verbose=False)
    examples_per_sec = dn["hvps_per_sec"] * BATCH
    baseline_examples = (
        TORCH_CPU_DENSENET40_HVPS_PER_SEC * TORCH_CPU_DENSENET40_BATCH
    )
    _stage("usps_hvp")
    usps = usps_hvps_per_sec()
    _stage("done")

    s224s_disp = (
        _median3(s224s["steps_per_sec_reps"])
        if s224s and s224s.get("steps_per_sec_reps") else None
    )
    out = {
                "metric": "densenet40_hvp_example_throughput_bf16_remat_batch128",
                "value": round(examples_per_sec, 1),
                "unit": "curvature examples/sec/chip",
                "vs_baseline": round(examples_per_sec / baseline_examples, 1),
                "hvps_per_sec": dn["hvps_per_sec"],
                "hvps_per_sec_dispersion": dn_disp,
                "tflops_per_sec": dn["tflops_per_sec"],
                "mfu_pct_bf16_peak": dn["mfu_pct_bf16_peak"],
                # DEVICE-BOUND flagship: scan32 chunked dispatch over a
                # device-resident dataset (r05+; the per-step dispatch
                # measurement survives as the *_dispatch secondary)
                "spectral_steps_per_sec_dn40_defer": scan_disp["value"],
                "spectral_steps_per_sec_dn40_defer_dispersion": scan_disp,
                "mfu_pct_dn40_defer": next(
                    r["mfu_pct_bf16_peak"] for r in scan_reps
                    if r["steps_per_sec"] == scan_disp["value"]
                ),
                "spectral_steps_per_sec_dn40_defer_dispatch":
                    sstep_disp["value"],
                "spectral_steps_per_sec_dn40_defer_dispatch_dispersion":
                    sstep_disp,
                "epoch_wallclock_s_cifar50k": epoch["epoch_wallclock_s"],
                "epoch_speedup_vs_torch_cpu": epoch["speedup_vs_torch_cpu"],
                # DEVICE-BOUND flagship: scan8 chunked dispatch,
                # device-resident data (dispersion = per-rep marginals
                # inside the one subprocess measurement)
                "spectral_steps_per_sec_dn121_224":
                    s224s["steps_per_sec"] if s224s else None,
                "spectral_steps_per_sec_dn121_224_dispersion": s224s_disp,
                "examples_per_sec_dn121_224":
                    s224s["examples_per_sec"] if s224s else None,
                "mfu_pct_dn121_224":
                    s224s["mfu_pct_bf16_peak"] if s224s else None,
                "s224_source":
                    s224s["s224_scan_source"] if s224s else None,
                "spectral_steps_per_sec_dn121_224_dispatch":
                    s224["steps_per_sec"] if s224 else None,
                "examples_per_sec_dn121_224_dispatch":
                    s224["examples_per_sec"] if s224 else None,
                "mfu_pct_dn121_224_dispatch":
                    s224["mfu_pct_bf16_peak"] if s224 else None,
                "s224_dispatch_source":
                    s224["s224_source"] if s224 else None,
                # best completed live DISPATCH measurement on this chip
                # (the shared VM's load varies 2x run-to-run; sidecar)
                "examples_per_sec_dn121_224_best":
                    s224.get("best_examples_per_sec") if s224 else None,
                "mfu_pct_dn121_224_best":
                    s224.get("best_mfu_pct") if s224 else None,
                # reference-protocol regime (pow_iter_eps=1e-3 +
                # rand_init): plain power iteration (policy OFF) vs the
                # fixed m=8 Lanczos solve vs the SHIPPED
                # eigensolver='auto' policy (what the best_reg configs
                # run) — all same-session, so the ratios cancel VM load
                "spectral_steps_per_sec_dn40_refproto_power":
                    eig.get("power_steps_per_sec") if eig else None,
                "spectral_steps_per_sec_dn40_refproto_lanczos":
                    eig.get("lanczos_steps_per_sec") if eig else None,
                "spectral_steps_per_sec_dn40_refproto_auto":
                    eig.get("auto_steps_per_sec") if eig else None,
                "eigensolve_speedup_lanczos": (
                    round(eig["lanczos_steps_per_sec"]
                          / eig["power_steps_per_sec"], 2)
                    if eig and eig.get("power_steps_per_sec")
                    and eig.get("lanczos_steps_per_sec") else None
                ),
                "eigensolve_speedup_auto_policy": (
                    round(eig["auto_steps_per_sec"]
                          / eig["power_steps_per_sec"], 2)
                    if eig and eig.get("power_steps_per_sec")
                    and eig.get("auto_steps_per_sec") else None
                ),
                "eigsolve_source":
                    eig.get("eigsolve_source") if eig else None,
                # loose-eps warm-start regime (cifar recipe eps=0.05):
                # the policy's OTHER half — auto must DECLINE Lanczos
                # here (expect auto ≈ power, lanczos < power)
                "spectral_steps_per_sec_dn40_loose_power":
                    eig_loose.get("power_steps_per_sec")
                    if eig_loose else None,
                "spectral_steps_per_sec_dn40_loose_lanczos":
                    eig_loose.get("lanczos_steps_per_sec")
                    if eig_loose else None,
                "spectral_steps_per_sec_dn40_loose_auto":
                    eig_loose.get("auto_steps_per_sec")
                    if eig_loose else None,
                "eigensolve_loose_auto_vs_power": (
                    round(eig_loose["auto_steps_per_sec"]
                          / eig_loose["power_steps_per_sec"], 2)
                    if eig_loose and eig_loose.get("power_steps_per_sec")
                    and eig_loose.get("auto_steps_per_sec") else None
                ),
                "eigensolve_loose_lanczos_vs_power": (
                    round(eig_loose["lanczos_steps_per_sec"]
                          / eig_loose["power_steps_per_sec"], 2)
                    if eig_loose and eig_loose.get("power_steps_per_sec")
                    and eig_loose.get("lanczos_steps_per_sec") else None
                ),
                "loose_source":
                    eig_loose.get("loose_source") if eig_loose else None,
                "s224_attempts":
                    s224s.get("s224_scan_attempts") if s224s else None,
                "warm_prestage": warm_status,
                "session": _session_meta(),
                "usps_hvps_per_sec": round(usps, 1),
                "usps_vs_torch_cpu": round(
                    usps / TORCH_CPU_USPS_BASELINE_HVPS_PER_SEC, 1
                ),
    }
    write_perf_md(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
