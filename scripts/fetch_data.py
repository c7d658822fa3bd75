"""Real-dataset ingest kit (readiness for the day egress exists).

This environment is zero-egress, so every demonstration run uses the
synthetic stand-ins (`RESULTS.md`).  The loaders already read REAL
files from a ``root`` directory when present:

  * USPS   — ``<root>/usps.bz2`` + ``<root>/usps.t.bz2``
             (LIBSVM bz2 format; data/usps.py:49-56)
  * CIFAR  — ``<root>/cifar-10-batches-py/`` / ``cifar-100-python/``
             (python pickle batches; data/cifar.py:31-52)
  * Forest — ``<root>/covtype.data`` or ``covtype.csv``
             (UCI covtype; data/forest.py:24-36)

This script downloads, verifies (sha256), and unpacks them into place
with ONE command, so the moment the environment allows network access
the real-data parity gate (``run_parity.py --real``, BASELINE.md's
±0.3 pp accuracy target vs /root/reference/cov_shift_plots.R:13-18)
runs without any further wiring.  ``--stub`` writes tiny synthetic
stand-ins in the EXACT on-disk formats instead (no network), which is
how the dry-run test exercises the full ingest + gate path today.

Usage:
  python scripts/fetch_data.py [--root ./data] [--only usps cifar forest]
  python scripts/fetch_data.py --stub        # offline format-exact stubs
  python scripts/fetch_data.py --verify-only # checksum what's on disk
"""

from __future__ import annotations

import argparse
import bz2
import gzip
import hashlib
import os
import pickle
import sys
import tarfile

import numpy as np

# (name, url, filename, sha256-or-None)
# cifar's archive hash is the canonical published one; the usps/covtype
# hashes are pinned to the copies served at the URLs below on first
# verified fetch — until then they are None and the script PRINTS the
# downloaded file's sha256 so it can be pinned in-place.
SOURCES = {
    "usps": [
        ("https://www.csie.ntu.edu.tw/~cjlin/libsvmtools/datasets/"
         "multiclass/usps.bz2", "usps.bz2", None),
        ("https://www.csie.ntu.edu.tw/~cjlin/libsvmtools/datasets/"
         "multiclass/usps.t.bz2", "usps.t.bz2", None),
    ],
    "cifar": [
        ("https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
         "cifar-10-python.tar.gz",
         "6d958be074577803d12ecdefd02955f39262c83c16fe9348329d7fe0b5c001ce"),
    ],
    "forest": [
        ("https://archive.ics.uci.edu/ml/machine-learning-databases/"
         "covtype/covtype.data.gz", "covtype.data.gz", None),
    ],
}


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch(url: str, dest: str) -> None:
    import urllib.request

    print(f"# fetching {url} -> {dest}", flush=True)
    urllib.request.urlretrieve(url, dest)


def unpack(name: str, root: str, fname: str) -> None:
    path = os.path.join(root, fname)
    if fname.endswith(".tar.gz"):
        with tarfile.open(path) as tf:
            tf.extractall(root)
    elif fname == "covtype.data.gz":
        with gzip.open(path, "rb") as src, \
                open(os.path.join(root, "covtype.data"), "wb") as dst:
            dst.write(src.read())
    # usps bz2 files are read compressed by the loader — leave as-is


def run_fetch(root: str, only, verify_only: bool) -> int:
    os.makedirs(root, exist_ok=True)
    rc = 0
    for name, files in SOURCES.items():
        if only and name not in only:
            continue
        for url, fname, digest in files:
            path = os.path.join(root, fname)
            if not os.path.exists(path):
                if verify_only:
                    print(f"# {name}: MISSING {path}")
                    rc = 1
                    continue
                try:
                    fetch(url, path)
                except Exception as e:
                    print(f"# {name}: fetch failed ({e}) — zero-egress "
                          f"environment? use --stub for offline stand-ins")
                    rc = 1
                    continue
            got = sha256(path)
            if digest is None:
                print(f"# {name}: {fname} sha256={got} (unpinned — pin "
                      f"this value in SOURCES after one verified fetch)")
            elif got != digest:
                print(f"# {name}: CHECKSUM MISMATCH {fname}: {got} != "
                      f"{digest}")
                rc = 1
                continue
            else:
                print(f"# {name}: {fname} sha256 OK")
            if not verify_only:
                unpack(name, root, fname)
    return rc


# ---------------------------------------------------------------------------
# offline stubs: tiny synthetic datasets in the EXACT on-disk formats
# ---------------------------------------------------------------------------
def write_stubs(root: str) -> None:
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)

    def libsvm_bz2(path, n):
        # LIBSVM multiclass rows: "<label> 1:<v> 2:<v> ... 256:<v>"
        # (usps labels are 1..10; data/usps.py:32-46 parses this)
        with bz2.open(path, "wt") as fh:
            for _ in range(n):
                lab = int(rng.integers(1, 11))
                vals = rng.normal(size=256)
                feats = " ".join(
                    f"{j + 1}:{v:.6f}" for j, v in enumerate(vals)
                )
                fh.write(f"{lab} {feats}\n")

    libsvm_bz2(os.path.join(root, "usps.bz2"), 64)
    libsvm_bz2(os.path.join(root, "usps.t.bz2"), 32)

    d = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    for fname, n in [(f"data_batch_{i}", 20) for i in range(1, 6)] + [
            ("test_batch", 20)]:
        batch = {
            b"data": rng.integers(
                0, 256, size=(n, 3072), dtype=np.uint8
            ).astype(np.uint8),
            b"labels": rng.integers(0, 10, size=n).tolist(),
        }
        with open(os.path.join(d, fname), "wb") as fh:
            pickle.dump(batch, fh)

    # covtype.data: 54 features + 1-based class label, CSV, no header
    n = 256
    x = rng.normal(size=(n, 54))
    y = rng.integers(1, 8, size=n)
    rows = np.concatenate([x, y[:, None]], axis=1)
    with open(os.path.join(root, "covtype.data"), "w") as fh:
        for r in rows:
            fh.write(",".join(f"{v:.6f}" for v in r[:-1])
                     + f",{int(r[-1])}\n")
    print(f"# stubs written under {root} (usps.bz2/usps.t.bz2, "
          f"cifar-10-batches-py/, covtype.data)")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./data")
    ap.add_argument("--only", nargs="*", choices=list(SOURCES))
    ap.add_argument("--verify-only", action="store_true")
    ap.add_argument("--stub", action="store_true",
                    help="write tiny offline synthetic stand-ins in the "
                         "exact on-disk formats (no network)")
    args = ap.parse_args()
    if args.stub:
        write_stubs(args.root)
        return 0
    return run_fetch(args.root, args.only, args.verify_only)


if __name__ == "__main__":
    sys.exit(main())
