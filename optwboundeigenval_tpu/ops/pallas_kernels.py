"""Pallas TPU kernels used by the curvature hot path.

One production primitive:

  * :func:`axpy_accumulate` — in-place ``acc += alpha * delta`` over a
    flat vector with the output aliased to the accumulator buffer, used
    by the micro-batched HVP accumulation (no extra HBM round trip per
    micro-batch; ops/curvature.py hvp_microbatched).

The kernel tiles the flat vector into (8, 128)-aligned blocks and runs
the grid sequentially (TPU grid semantics).  On CPU (tests) it executes
in interpreter mode.

A fused power-iteration epilogue (one Pallas pass over (hv, v, r_old)
producing every stopping-rule scalar, plus ``eigen.power_iteration_fused``
built on it) was measured slower than XLA's reduction codegen twice —
2026-08 round 2: 1.4 ms vs 0.6 ms/call; 2026-08-20 round 5 re-measure on
jax 0.9/Mosaic: 0.864 ms vs 0.650 ms (0.75x) at 16M elements — and was
RETIRED; see RESULTS.md "Pallas decision".  XLA's fused pytree
eigensolver is the only power-iteration path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK_ROWS = 512  # (512, 128) f32 block = 256 KiB in VMEM


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_to_tiles(x: jax.Array) -> Tuple[jax.Array, int]:
    """Flatten and zero-pad to a (rows, 128) layout with rows a
    multiple of BLOCK_ROWS."""
    n = x.size
    per_block = BLOCK_ROWS * LANES
    blocks = -(-max(n, 1) // per_block)
    padded = blocks * per_block
    flat = jnp.ravel(x)
    flat = jnp.pad(flat, (0, padded - n))
    return flat.reshape(blocks * BLOCK_ROWS, LANES), n


# ---------------------------------------------------------------------------
# axpy accumulate
# ---------------------------------------------------------------------------


def _axpy_kernel(alpha_ref, acc_ref, delta_ref, out_ref):
    out_ref[:] = acc_ref[:] + alpha_ref[0, 0] * delta_ref[:]


def axpy_accumulate(acc: jax.Array, delta: jax.Array,
                    alpha: float | jax.Array = 1.0) -> jax.Array:
    """acc + alpha * delta over same-shaped arrays.  Traceable; jit at
    the call site (with the accumulator donated for in-place updates
    when used standalone)."""
    a2, n = _pad_to_tiles(acc)
    d2, _ = _pad_to_tiles(delta)
    grid = a2.shape[0] // BLOCK_ROWS
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        _axpy_kernel,
        out_shape=jax.ShapeDtypeStruct(a2.shape, a2.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(alpha_arr, a2, d2)
    return out.reshape(-1)[:n].reshape(acc.shape)
