"""optwboundeigenval_tpu — TPU-native spectral-radius-regularized training.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
"Optimization with Bounded Eigenvalues" codebase (single-device PyTorch):
training neural networks under the objective ``h = f + mu * g`` where
``g = max(0, rho - K, Kmin - rho)`` penalizes the dominant Hessian
eigenvalue ``rho`` outside a band.  The dominant eigenpair is estimated
matrix-free every mini-batch by power iteration over Hessian-vector
products (Pearlmutter R-op), optionally K-FAC-preconditioned (inexact
LOBPCG), and ``grad rho = v^T (grad H) v`` comes from a second R-op.

Reference behavior map (see SURVEY.md): curvature kernel
``opt.py:48-192``; eigensolver ``opt.py:418-533``; training driver
``opt.py:238-1855``.

TPU-first architecture (NOT a port):
  * curvature: ``jax.linearize(jax.grad(loss))`` — one linearization per
    batch reused by every power-iteration step, jitted to XLA.
  * eigensolver: ``lax.while_loop`` with the reference's stopping
    semantics, compiled into the train step.
  * parallelism: batch sharded over a ``data`` mesh axis via
    ``jax.sharding``; XLA inserts psums over ICI.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the spectral train step for a large
# model (linearize + power-iteration while_loop + third-order branch)
# is a big graph; caching makes every run after the first start fast
# (measured: DenseNet121@224px train_step compiles ~12-28 min on the
# tunneled v5e, then loads from its ~300 MB cache entry in seconds).
#
# Location: when the package runs from a source checkout, the cache
# lives IN the checkout (<repo>/.xla_cache, gitignored) — the working
# tree survives environment resets that wipe ~/.cache, so the one big
# compile is paid once per (program, jax version), not once per
# session.  Installed-package runs fall back to ~/.cache.


def _default_cache_dir() -> str:
    pkg_parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    # .git is a FILE in git worktrees — exists(), not isdir()
    if _os.path.exists(_os.path.join(pkg_parent, ".git")):
        return _os.path.join(pkg_parent, ".xla_cache")
    return _os.path.expanduser("~/.cache/optwboundeigenval_tpu/xla")


if not _os.environ.get("JAX_DISABLE_COMPILATION_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", _default_cache_dir()
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from optwboundeigenval_tpu.ops import curvature, eigen, spectral  # noqa: F401
