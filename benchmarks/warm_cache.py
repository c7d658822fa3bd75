"""Pre-warm the repo-local XLA compilation cache (.xla_cache/) with
every program the driver bench (bench.py) compiles, UNBOUNDED.

bench.py's heavyweight stages run in bounded subprocesses so a driver
run can never hang; the flip side is that on a completely cold cache a
long compile can eat the stage budget and force a recorded fallback
(exactly round 3's failure mode).  Running this script once after any
cache wipe makes every subsequent bench.py run measure live and fast.

Order: the dn121@224px step first (the ~300 MB / 12-28 min entry),
its scan8 device-bound variant, then the dn40 spectral-step variants
(defer + scan32 device-bound + the three reference-protocol eigensolve
legs + the two loose-regime policy legs), the dn40 HVP program, the
CIFAR-50k epoch scan32 programs, and the USPS scan programs.  Each
stage is a fresh subprocess so the tunneled chip always has exactly
one client.

On success each stage is recorded in a marker INSIDE the cache
directory (.xla_cache/.owb_warmed.json) — bench.py's pre-stage reads
the marker to decide which stages still need warming; a cache wipe
takes the marker with it, which is exactly the signal we want.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
BSS = os.path.join(HERE, "bench_spectral_step.py")
MARKER = os.path.join(REPO, ".xla_cache", ".owb_warmed.json")

STAGES = [
    ("s224", [BSS, "--model", "dn121", "--px", "224", "--batch", "64",
              "--remat", "--defer"]),
    ("s224_scan8", [BSS, "--model", "dn121", "--px", "224", "--batch",
                    "64", "--remat", "--defer", "--scan_steps", "8",
                    "--device_data", "--n_small", "8",
                    "--n_large", "24"]),
    ("dn40_defer", [BSS, "--model", "dn40", "--batch", "128",
                    "--remat", "--defer"]),
    ("dn40_scan32", [BSS, "--model", "dn40", "--batch", "128",
                     "--remat", "--defer", "--scan_steps", "32",
                     "--device_data", "--n_small", "64",
                     "--n_large", "192"]),
    ("eig_power", [BSS, "--model", "dn40", "--batch", "128", "--remat",
                   "--defer", "--rand_init", "--pow_eps", "1e-3"]),
    ("eig_lanczos", [BSS, "--model", "dn40", "--batch", "128", "--remat",
                     "--defer", "--rand_init", "--pow_eps", "1e-3",
                     "--lanczos", "8"]),
    ("eig_auto", [BSS, "--model", "dn40", "--batch", "128", "--remat",
                  "--defer", "--rand_init", "--pow_eps", "1e-3",
                  "--auto"]),
    # loose regime (cifar recipe eps=0.05, warm-start v): the power leg
    # is the dn40_defer program itself; lanczos/auto are new programs
    ("loose_lanczos", [BSS, "--model", "dn40", "--batch", "128",
                       "--remat", "--defer", "--lanczos", "8"]),
    ("loose_auto", [BSS, "--model", "dn40", "--batch", "128",
                    "--remat", "--defer", "--auto"]),
    ("dn40_hvp", ["-c",
                  "from benchmarks.bench_densenet_hvp import measure\n"
                  "import jax.numpy as jnp\n"
                  "print(measure(batch=128, dtype=jnp.bfloat16, "
                  "remat=True))"]),
    ("epoch_scan32", ["-c",
                      "from benchmarks.bench_epoch_wallclock import main\n"
                      "print(main(device_data=True, scan_steps=32, "
                      "verbose=False))"]),
    ("usps", ["-c",
              "import bench; print(bench.usps_hvps_per_sec())"]),
]


def read_marker() -> set:
    """Set of stage names already warmed into the CURRENT cache (empty
    if the cache/marker is gone — i.e. after a wipe)."""
    try:
        with open(MARKER) as fh:
            return set(json.load(fh).get("stages", []))
    except (OSError, json.JSONDecodeError, ValueError):
        return set()


def _record(name: str) -> None:
    stages = read_marker() | {name}
    os.makedirs(os.path.dirname(MARKER), exist_ok=True)
    tmp = MARKER + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"stages": sorted(stages), "ts": time.time()}, fh)
    os.replace(tmp, MARKER)


def main() -> int:
    only = set(sys.argv[1:])
    known = {name for name, _ in STAGES}
    unknown = only - known
    if unknown:
        print(f"# unknown stage(s): {sorted(unknown)}; "
              f"valid: {sorted(known)}", file=sys.stderr)
        return 2
    rc = 0
    for name, args in STAGES:
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        print(f"# warm {name} ...", flush=True)
        out = subprocess.run([sys.executable] + args, cwd=REPO)
        dt = time.perf_counter() - t0
        print(f"# warm {name}: rc={out.returncode} in {dt:.0f}s",
              flush=True)
        if out.returncode == 0:
            _record(name)
        rc = rc or out.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
