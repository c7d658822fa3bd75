"""Real-data readiness kit (VERDICT r04 #7): scripts/fetch_data.py's
offline stubs must be format-exact for the real loaders, and the
run_parity --real Forest accuracy gate must execute end to end on the
stub (reporting STUB, not enforcing the ±0.3 pp bound)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_stubs(root):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from fetch_data import write_stubs

    write_stubs(str(root))


def test_stubs_are_format_exact(tmp_path):
    """The stub files parse through the REAL-file branches of every
    loader (usps LIBSVM bz2, cifar pickle batches, covtype CSV) —
    the exact code paths real data will take (data/usps.py:49-56,
    data/cifar.py:31-52, data/forest.py:24-36)."""
    _write_stubs(tmp_path)
    from optwboundeigenval_tpu.data.cifar import load_cifar
    from optwboundeigenval_tpu.data.forest import load_covtype
    from optwboundeigenval_tpu.data.usps import load_usps

    x, y = load_usps(str(tmp_path), train=True)
    assert x.shape == (64, 16, 16, 1) and y.min() >= 0 and y.max() <= 9
    xt, yt = load_usps(str(tmp_path), train=False)
    assert xt.shape == (32, 16, 16, 1)

    xc, yc = load_cifar(str(tmp_path), train=True)
    assert xc.shape == (100, 32, 32, 3)
    xct, _ = load_cifar(str(tmp_path), train=False)
    assert xct.shape == (20, 32, 32, 3)

    xf, yf = load_covtype(str(tmp_path))
    assert xf.shape == (256, 54)
    assert yf.min() >= 0 and yf.max() <= 6  # 0-based after load


def test_fetch_cli_stub_and_verify(tmp_path):
    """CLI round trip: --stub writes the files, --verify-only reports
    the (expected) missing archives without crashing."""
    script = os.path.join(REPO, "scripts", "fetch_data.py")
    out = subprocess.run(
        [sys.executable, script, "--stub", "--root", str(tmp_path)],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    assert os.path.exists(tmp_path / "covtype.data")
    # verify-only on a root with no archives: nonzero + MISSING report,
    # never an exception
    out = subprocess.run(
        [sys.executable, script, "--verify-only", "--root",
         str(tmp_path / "empty")],
        capture_output=True, text=True,
    )
    assert out.returncode == 1
    assert "MISSING" in out.stdout


def test_real_forest_gate_on_stub(tmp_path, capsys):
    """The full --real gate path (ingest root -> forest_config ->
    driver.run cascade -> test_model -> verdict) executes on the stub
    dataset and exits 0 with verdict STUB (the ±0.3 pp bound only
    gates genuine covtype, detected by its 581012-row count)."""
    _write_stubs(tmp_path)
    sys.path.insert(0, os.path.join(REPO, "benchmarks", "parity"))
    import run_parity

    prev = os.getcwd()
    os.chdir(tmp_path)  # trainer logs/models land in the tmp dir
    try:
        rc = run_parity.real_forest_gate(str(tmp_path), epochs=1)
    finally:
        os.chdir(prev)
    assert rc == 0
    out = capsys.readouterr().out
    assert "STUB" in out and "real_covtype=False" in out
