"""EXPERIMENTAL (archived, not on any production path): fully-fused
Pallas HVP kernel for the USPS CNN workload.

Status (round-2 Pallas decision, RESULTS.md): math validated against
autodiff in interpret mode, but the Mosaic toolchain OOMs compiling the
unrolled kernel, and every other measured Pallas candidate in this repo
(fused epilogue, micro-batch axpy accumulate) LOSES to XLA's fusion on
realistic shapes — so Pallas investment is stopped here and this file
is kept solely as the fusion blueprint for a future toolchain.

Why it was attempted: the USPS CNN HVP is the reference's hottest operation (every
power-iteration step, SURVEY.md §3.1), and at this model size it is
pure per-op overhead on TPU — ~12 us per non-fusing conv/pool op,
~155 us per HVP, <1% of compute roofline.  This kernel computes the
ENTIRE Hessian-vector product in one Pallas program with every
intermediate resident in VMEM.

Math: forward-over-reverse differentiation of the gradient program,
exact almost everywhere.  The network is piecewise linear in its
*input* but bilinear across layers in the *parameters*, so the true
Hessian is GGN + cross-layer curvature:

  tangent-forward:   u_l  (tangent activations of J v)
  middle:            dt5 = H_z u5,  H_z = w/W (diag(s) - s s^T)
  tangent-backward:  dt_l = (dt_{l+1} W^T + d_{l+1} V^T) * mask
  per-parameter HVP: dV_l = t_{in,l}^T d_l + a_{in,l}^T dt_l

where d_l are the PRIMAL backward deltas (gradient program residuals).
ReLU masks and pool argmax selections are locally constant (their
second-order terms vanish a.e.).  The primal pass — activations,
masks, pool one-hots, softmax, and the primal deltas — is computed
ONCE per batch in plain JAX (:func:`prepare`), the analog of the
reference caching ``stored_grad`` (opt.py:86-91); every HVP iteration
runs only the fused tangent passes.

Status: the math is exact — validated against
``curvature.linearize_hvp`` on CPU (interpret mode) including padded
zero-weight rows and scan usage (tests/test_fused_cnn_hvp.py).  Two
kernel formulations were attempted on the current toolchain's remote
Mosaic compiler: the 9-shifted-matmul version is OOM-killed, and the
im2col single-dot-per-conv version (this file) did not finish
compiling within 20 minutes.  The autodiff HVP therefore remains the
production path; this module stands as the fusion blueprint — the
per-op overhead analysis that motivates it (155 us/HVP, <1% of
roofline, invariant from batch 8 to 1024) is recorded in RESULTS.md.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# primal preparation (once per batch, plain JAX)
# ---------------------------------------------------------------------------


class Primals(NamedTuple):
    xpad: jax.Array  # (B, 18, 18, 1) zero-padded input
    m1: jax.Array  # (B, 16, 16, 8) relu mask
    P1: jax.Array  # (B, 16, 16, 8) pool-argmax one-hot
    p1pad: jax.Array  # (B, 10, 10, 8) pooled act, padded
    m2: jax.Array  # (B, 8, 8, 16)
    P2: jax.Array  # (B, 8, 8, 16)
    p2pad: jax.Array  # (B, 6, 6, 16)
    m3: jax.Array  # (B, 4, 4, 32)
    P3: jax.Array  # (B, 4, 4, 32)
    p3f: jax.Array  # (B, 128) flattened pooled act
    m4: jax.Array  # (B, 64)
    h4: jax.Array  # (B, 64) post-relu fc1
    s: jax.Array  # (B, 10) softmax
    wrow: jax.Array  # (B,) example weight / sum(w)
    # primal backward deltas (gradient-program residuals)
    d5: jax.Array  # (B, 10)  = (s - onehot(y)) * wrow
    d4: jax.Array  # (B, 64)
    d3: jax.Array  # (B, 4, 4, 32)
    d2: jax.Array  # (B, 8, 8, 16)


def _pool_argmax_onehot(a):
    """One-hot of the 2x2-window argmax (first max wins; ties are
    measure-zero for real activations)."""
    b, h, w, c = a.shape
    # window-major layout: (B, h/2, w/2, 4, C)
    win = a.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    flat = win.reshape(b, h // 2, w // 2, 4, c)
    mx = flat.max(axis=3, keepdims=True)
    eq = (flat == mx).astype(a.dtype)
    first = eq * (jnp.cumsum(eq, axis=3) == 1.0)
    return (
        first.reshape(b, h // 2, w // 2, 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h, w, c)
    )


def _pool_select(t, P):
    """Pooled tangent: sum over each window of t * P."""
    b, h, w, c = t.shape
    return (t * P).reshape(b, h // 2, 2, w // 2, 2, c).sum(axis=(2, 4))


def _unpool(d, P):
    """Transpose of _pool_select: broadcast d over windows, mask by P."""
    b, hh, ww, c = d.shape
    up = jnp.broadcast_to(
        d[:, :, None, :, None, :], (b, hh, 2, ww, 2, c)
    ).reshape(b, hh * 2, ww * 2, c)
    return up * P


def _pad1(a):
    return jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))


def prepare(params, batch) -> Primals:
    """Primal forward pass collecting every residual the fused HVP
    needs.  ``params`` is the CNNUSPS flax param tree (default 'lax'
    naming: Conv_0..2, Dense_0..1)."""
    x = batch["x"]
    if x.ndim == 2:
        x = x.reshape(-1, 16, 16, 1)
    w = batch.get("w")
    B = x.shape[0]
    if w is None:
        w = jnp.ones((B,), x.dtype)
    wrow = w / jnp.maximum(jnp.sum(w), 1e-12)

    def conv(a, kernel, bias):
        return jax.lax.conv_general_dilated(
            a, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias

    k1, b1 = params["Conv_0"]["kernel"], params["Conv_0"]["bias"]
    k2, b2 = params["Conv_1"]["kernel"], params["Conv_1"]["bias"]
    k3, b3 = params["Conv_2"]["kernel"], params["Conv_2"]["bias"]
    f1k, f1b = params["Dense_0"]["kernel"], params["Dense_0"]["bias"]
    f2k, f2b = params["Dense_1"]["kernel"], params["Dense_1"]["bias"]

    z1 = conv(x, k1, b1)
    m1 = (z1 > 0).astype(x.dtype)
    a1 = z1 * m1
    P1 = _pool_argmax_onehot(a1)
    p1 = _pool_select(a1, P1)

    z2 = conv(p1, k2, b2)
    m2 = (z2 > 0).astype(x.dtype)
    a2 = z2 * m2
    P2 = _pool_argmax_onehot(a2)
    p2 = _pool_select(a2, P2)

    z3 = conv(p2, k3, b3)
    m3 = (z3 > 0).astype(x.dtype)
    a3 = z3 * m3
    P3 = _pool_argmax_onehot(a3)
    p3 = _pool_select(a3, P3)
    p3f = p3.reshape(B, -1)

    z4 = p3f @ f1k + f1b
    m4 = (z4 > 0).astype(x.dtype)
    h4 = z4 * m4
    z5 = h4 @ f2k + f2b
    s = jax.nn.softmax(z5, axis=-1)

    # primal backward deltas of the weighted-mean CE gradient
    y = batch["y"].astype(jnp.int32)
    onehot = jax.nn.one_hot(y, s.shape[-1], dtype=x.dtype)
    d5 = (s - onehot) * wrow[:, None]
    d4 = (d5 @ f2k.T) * m4
    dp3 = (d4 @ f1k.T).reshape(B, 2, 2, 32)
    d3 = _unpool(dp3, P3) * m3
    # transpose conv of d3 through k3 back to the pooled-2 level
    dtp2 = jax.lax.conv_general_dilated(
        d3, jnp.flip(k3, (0, 1)).swapaxes(2, 3), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    d2 = _unpool(dtp2, P2) * m2

    return Primals(
        xpad=_pad1(x), m1=m1, P1=P1, p1pad=_pad1(p1),
        m2=m2, P2=P2, p2pad=_pad1(p2), m3=m3, P3=P3,
        p3f=p3f, m4=m4, h4=h4, s=s, wrow=wrow,
        d5=d5, d4=d4, d3=d3, d2=d2,
    )


# ---------------------------------------------------------------------------
# the fused kernel
# ---------------------------------------------------------------------------


def _kernel(
    # primals
    xpad, m1, P1, p1pad, m2, P2, p2pad, m3, P3, p3f, m4, h4, s, wrow,
    pd5, pd4, pd3, pd2,
    # frozen weights for the J / J^T passes
    W2, W3, F1, F2,
    # tangent params v
    V1, Vb1, V2, Vb2, V3, Vb3, VF1, VbF1, VF2, VbF2,
    # outputs: Hv
    dV1, dVb1, dV2, dVb2, dV3, dVb3, dVF1, dVbF1, dVF2, dVbF2,
):
    f32 = jnp.float32

    def _patches(apad_v, H, W):
        """im2col inside VMEM: (B, H+2, W+2, C) -> (B*H*W, 9C) with
        flatten order (dy, dx, c)."""
        B = apad_v.shape[0]
        cin = apad_v.shape[-1]
        cols = []
        for dy in range(3):
            for dx in range(3):
                cols.append(
                    apad_v[:, dy : dy + H, dx : dx + W, :].reshape(
                        B * H * W, cin
                    )
                )
        return jnp.concatenate(cols, axis=-1)

    def conv_shift(apad_v, kernel_v, H, W):
        """SAME 3x3 conv as ONE matmul over im2col patches;
        kernel_v (3, 3, cin, cout) flattens to (9*cin, cout) in the
        same (dy, dx, c) order."""
        B = apad_v.shape[0]
        cin = apad_v.shape[-1]
        cout = kernel_v.shape[-1]
        p = _patches(apad_v, H, W)
        kflat = kernel_v.reshape(9 * cin, cout)
        out = jax.lax.dot_general(
            p, kflat, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        return out.reshape(B, H, W, cout)

    def conv_weight_grad(apad_v, delta_v, cin, cout, H, W):
        """dK = patches^T @ delta as ONE matmul -> (9*cin, cout) ->
        (3, 3, cin, cout)."""
        B = apad_v.shape[0]
        d2 = delta_v.reshape(B * H * W, cout)
        p = _patches(apad_v, H, W)  # (BHW, 9*cin)
        flat = jax.lax.dot_general(
            p, d2, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )  # (9*cin, cout)
        return flat.reshape(3, 3, cin, cout)

    def conv_transpose(delta_v, kernel_v, H, W):
        """d a[p,q] = sum_{dy,dx} delta[p-dy+1, q-dx+1] @ K[dy,dx]^T as
        ONE matmul over delta-patches with the flipped kernel."""
        B = delta_v.shape[0]
        cout = delta_v.shape[-1]
        cin = kernel_v.shape[2]
        dpad = jnp.pad(delta_v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        # patch order (dy, dx) pairs with kernel[2-dy, 2-dx]^T; build
        # the (9*cout, cin) matrix from static slices (mosaic has no
        # rev/flip primitive)
        blocks = []
        for dy in range(3):
            for dx in range(3):
                blocks.append(kernel_v[2 - dy, 2 - dx].T)  # (cout, cin)
        kmat = jnp.concatenate(blocks, axis=0)
        p = _patches(dpad, H, W)  # (BHW, 9*cout) in (dy, dx, cout) order
        out = jax.lax.dot_general(
            p, kmat, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        return out.reshape(B, H, W, cin)

    # the module-level pool helpers operate on plain values and work
    # unchanged inside the kernel
    pool_select = _pool_select
    unpool = _unpool

    B = xpad.shape[0]

    # ---------------- tangent forward: u = J v ----------------------------
    # layer 1: input tangent is zero, so only the V1 path contributes
    u1 = conv_shift(xpad[:], V1[:], 16, 16) + Vb1[:]
    t1 = u1 * m1[:]
    tp1 = pool_select(t1, P1[:])

    tp1pad = jnp.pad(tp1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    u2 = (
        conv_shift(tp1pad, W2[:], 8, 8)
        + conv_shift(p1pad[:], V2[:], 8, 8)
        + Vb2[:]
    )
    t2 = u2 * m2[:]
    tp2 = pool_select(t2, P2[:])

    tp2pad = jnp.pad(tp2, ((0, 0), (1, 1), (1, 1), (0, 0)))
    u3 = (
        conv_shift(tp2pad, W3[:], 4, 4)
        + conv_shift(p2pad[:], V3[:], 4, 4)
        + Vb3[:]
    )
    t3 = u3 * m3[:]
    tp3_sp = pool_select(t3, P3[:])  # (B, 2, 2, 32) — lane dim stays 32

    # FC1 boundary without a cross-lane reshape: treat F1 (128, 64) as
    # four (32, 64) blocks in (h, w, c) flatten order and contract each
    # spatial position separately (mosaic cannot shape-cast 2x2x32->128)
    def fc1_fwd(t_sp, M):
        acc = jnp.zeros((B, 64), f32)
        for py in range(2):
            for px in range(2):
                blk = t_sp[:, py, px, :]
                i0 = (py * 2 + px) * 32
                acc = acc + jax.lax.dot_general(
                    blk, M[i0 : i0 + 32, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
        return acc

    u4 = (
        fc1_fwd(tp3_sp, F1[:])
        + jax.lax.dot_general(p3f[:], VF1[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
        + VbF1[:]
    )
    t4 = u4 * m4[:]
    u5 = (
        jax.lax.dot_general(t4, F2[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
        + jax.lax.dot_general(h4[:], VF2[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
        + VbF2[:]
    )

    # ---------------- middle: dt5 = H_z u5 ---------------------------------
    sv = s[:]
    su = jnp.sum(sv * u5, axis=1, keepdims=True)
    dt5 = (sv * u5 - sv * su) * wrow[:].reshape(B, 1)

    # ---------------- tangent backward + per-parameter HVP -----------------
    # dV_l = t_in^T d_l  +  a_in^T dt_l   (primal deltas d_l from prepare)
    d5 = pd5[:]
    d4 = pd4[:]
    d3 = pd3[:]
    d2 = pd2[:]

    dVF2[:] = (
        jax.lax.dot_general(t4, d5, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
        + jax.lax.dot_general(h4[:], dt5, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    )
    dVbF2[:] = jnp.sum(dt5, axis=0)

    dt4 = (
        jax.lax.dot_general(dt5, F2[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=f32)
        + jax.lax.dot_general(d5, VF2[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    ) * m4[:]
    # block-structured FC1 transpose terms (same (h, w, c) block order)
    blocks = []
    for py in range(2):
        for px in range(2):
            blocks.append(
                jax.lax.dot_general(
                    tp3_sp[:, py, px, :], d4, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
            )
    dVF1[:] = jnp.concatenate(blocks, axis=0) + jax.lax.dot_general(
        p3f[:], dt4, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    dVbF1[:] = jnp.sum(dt4, axis=0)

    def fc1_bwd(dvec, M):
        """(B, 64) -> (B, 2, 2, 32) without cross-lane reshape."""
        rows = []
        for py in range(2):
            cols = []
            for px in range(2):
                i0 = (py * 2 + px) * 32
                blk = jax.lax.dot_general(
                    dvec, M[i0 : i0 + 32, :], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )  # (B, 32)
                cols.append(blk[:, None, None, :])
            rows.append(jnp.concatenate(cols, axis=2))
        return jnp.concatenate(rows, axis=1)

    dtp3 = fc1_bwd(dt4, F1[:]) + fc1_bwd(d4, VF1[:])
    dt3 = unpool(dtp3, P3[:]) * m3[:]
    dV3[:] = (
        conv_weight_grad(tp2pad, d3, 16, 32, 4, 4)
        + conv_weight_grad(p2pad[:], dt3, 16, 32, 4, 4)
    )
    dVb3[:] = jnp.sum(dt3, axis=(0, 1, 2))

    dtp2 = conv_transpose(dt3, W3[:], 4, 4) + conv_transpose(d3, V3[:], 4, 4)
    dt2 = unpool(dtp2, P2[:]) * m2[:]
    dV2[:] = (
        conv_weight_grad(tp1pad, d2, 8, 16, 8, 8)
        + conv_weight_grad(p1pad[:], dt2, 8, 16, 8, 8)
    )
    dVb2[:] = jnp.sum(dt2, axis=(0, 1, 2))

    dtp1 = conv_transpose(dt2, W2[:], 8, 8) + conv_transpose(d2, V2[:], 8, 8)
    dt1 = unpool(dtp1, P1[:]) * m1[:]
    # input tangent is zero, so only the a_in^T dt_1 term survives
    dV1[:] = conv_weight_grad(xpad[:], dt1, 1, 8, 16, 16)
    dVb1[:] = jnp.sum(dt1, axis=(0, 1, 2))


def make_fused_hvp(params, batch):
    """Returns ``hvp_fn(v_tree) -> Hv_tree`` for the CNNUSPS param tree,
    with primals prepared once (jit-compatible; usable inside
    lax.scan/while_loop)."""
    primals = prepare(params, batch)
    W2 = params["Conv_1"]["kernel"]
    W3 = params["Conv_2"]["kernel"]
    F1 = params["Dense_0"]["kernel"]
    F2 = params["Dense_1"]["kernel"]

    shapes = {
        "Conv_0": {"kernel": (3, 3, 1, 8), "bias": (8,)},
        "Conv_1": {"kernel": (3, 3, 8, 16), "bias": (16,)},
        "Conv_2": {"kernel": (3, 3, 16, 32), "bias": (32,)},
        "Dense_0": {"kernel": (128, 64), "bias": (64,)},
        "Dense_1": {"kernel": (64, 10), "bias": (10,)},
    }

    def hvp_fn(v):
        out_shapes = tuple(
            jax.ShapeDtypeStruct(shapes[layer][kind], jnp.float32)
            for layer in ("Conv_0", "Conv_1", "Conv_2", "Dense_0", "Dense_1")
            for kind in ("kernel", "bias")
        )
        args = (
            primals.xpad, primals.m1, primals.P1, primals.p1pad,
            primals.m2, primals.P2, primals.p2pad, primals.m3, primals.P3,
            primals.p3f, primals.m4, primals.h4, primals.s, primals.wrow,
            primals.d5, primals.d4, primals.d3, primals.d2,
            W2, W3, F1, F2,
            v["Conv_0"]["kernel"], v["Conv_0"]["bias"],
            v["Conv_1"]["kernel"], v["Conv_1"]["bias"],
            v["Conv_2"]["kernel"], v["Conv_2"]["bias"],
            v["Dense_0"]["kernel"], v["Dense_0"]["bias"],
            v["Dense_1"]["kernel"], v["Dense_1"]["bias"],
        )
        outs = pl.pallas_call(
            _kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM)
                for _ in out_shapes
            ),
            interpret=_interpret(),
        )(*args)
        names = [("Conv_0", "kernel"), ("Conv_0", "bias"),
                 ("Conv_1", "kernel"), ("Conv_1", "bias"),
                 ("Conv_2", "kernel"), ("Conv_2", "bias"),
                 ("Dense_0", "kernel"), ("Dense_0", "bias"),
                 ("Dense_1", "kernel"), ("Dense_1", "bias")]
        tree = {}
        for (layer, kind), val in zip(names, outs):
            tree.setdefault(layer, {})[kind] = val
        return tree

    return hvp_fn
