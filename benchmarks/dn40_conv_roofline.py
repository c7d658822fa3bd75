"""Per-shape conv roofline for the DenseNet-40-12 HVP pipeline.

The headline dn40 HVP bench sits at ~8% MFU against a ~30% flop-
weighted lane-utilization ceiling (RESULTS.md).  This script settles
whether the gap is pipeline overhead (attackable with a fused kernel)
or the per-shape efficiency XLA actually achieves on this chip for
DenseNet-40's narrow convolutions (intrinsic — the blueprint should be
retired).

Method: enumerate every distinct conv shape in DenseNet-40-12 (BC,
growth 12: the 1x1 bottlenecks at C_out=48, the 3x3 growers at
C_out=12, the transitions, conv0 — reference topology densenet.py:
70-121), and for each measure THREE standalone jitted primitives at
batch 128 bf16 — the forward conv, the input-gradient conv
(conv_transpose data path), and the weight-gradient conv — timed by
the same marginal-scan method as bench.py.  An HVP evaluates exactly
these primitives (fwd + JVP reuse fwd shapes; VJP passes use the two
backward shapes), so the flop-weighted mean of their measured
efficiencies IS the pipeline's per-shape ceiling: no fusion, remat, or
dispatch costs included.

Output: one JSON line with per-shape TF/s + the flop-weighted
predicted MFU ceiling, to compare against the measured end-to-end
`mfu_pct_bf16_peak`.  predicted ~= measured  =>  the pipeline already
runs at XLA's per-shape speed and ~8% is the real cap for this
architecture; predicted >> measured  =>  there is pipeline overhead a
fused kernel could recover.
"""

import json
import time

import numpy as np

BATCH = 128


def dn40_conv_shapes():
    """(H, W, C_in, C_out, k) for every conv in DenseNet-40-12 BC,
    with multiplicity.  Topology: conv0 3->24 @32; per block 6 layers
    of [1x1 C_in->48, 3x3 48->12] with C_in growing by 12; transitions
    halve channels and the spatial dims (reference densenet.py)."""
    shapes = {}  # (h, c_in, c_out, k) -> count

    def add(h, cin, cout, k):
        key = (h, cin, cout, k)
        shapes[key] = shapes.get(key, 0) + 1

    add(32, 3, 24, 3)  # conv0
    in_planes, h = 24, 32
    for b in range(3):
        for _ in range(6):
            add(h, in_planes, 48, 1)  # bottleneck
            add(h, 48, 12, 3)  # grower
            in_planes += 12
        if b < 2:
            out_planes = in_planes // 2
            add(h, in_planes, out_planes, 1)  # transition
            in_planes, h = out_planes, h // 2
    return shapes


def dn121_conv_shapes(px=224):
    """(H, W, C_in, C_out, k) for every conv in DenseNet-121 at the CXR
    pipeline resolution (dnet.py densenet121: growth 32, bottleneck
    width 128, blocks (6, 12, 24, 16), 7x7-s2 conv0 + 3x3-s2 maxpool,
    transitions halve channels and spatial dims).  Stride-2 conv0 is
    represented at its OUTPUT resolution with the input-pixel flops —
    the script's s1 SAME measurement at out-res is a close (slightly
    conservative) stand-in for the s2 conv's achievable efficiency."""
    shapes = {}

    def add(h, cin, cout, k):
        key = (h, cin, cout, k)
        shapes[key] = shapes.get(key, 0) + 1

    add(px // 2, 3, 64, 7)  # conv0 (7x7 s2) at its 112px output res
    h = px // 4  # after the 3x3-s2 maxpool
    in_planes = 64
    for b, n_layers in enumerate((6, 12, 24, 16)):
        for _ in range(n_layers):
            add(h, in_planes, 128, 1)  # bottleneck
            add(h, 128, 32, 3)  # grower
            in_planes += 32
        if b < 3:
            out_planes = in_planes // 2
            add(h, in_planes, out_planes, 1)  # transition
            in_planes, h = out_planes, h // 2
    return shapes


def measure_primitive(fn, args, target_s=1.5, flops=None):
    """Per-call time of ``fn`` via the marginal-scan method, with the
    scan lengths CALIBRATED to the primitive's actual speed: dn40's
    convs are microseconds each, so fixed small lengths would vanish
    under the ~25-45 ms tunnel RTT — a probe scan sizes n_large to
    ~``target_s`` seconds of device time (n_small = n_large/4).

    ``flops`` (optional) bounds the PROBE itself: dn121@224's conv0 is
    ~15 GFLOP/call at cin=3 lane efficiency, so the dn40-tuned fixed
    probe_n=2000 alone would run tens of minutes — cap the probe scan
    near ~0.2 TFLOP (assume >=1% MFU) and let the calibrated pass do
    the accurate timing."""
    import jax
    import jax.numpy as jnp

    def make_run(n):
        @jax.jit
        def run(*a):
            def body(x, _):
                y = fn(*([x] + list(a[1:])))
                # live data dependence so XLA cannot dead-code the conv:
                # the carry folds in a runtime scalar from y, scaled so
                # the bf16 add rounds back to x exactly (x is stable
                # across iterations; the conv stays the only O(flops)
                # op in the loop body)
                s = (jnp.mean(y.astype(jnp.float32)) * 1e-12).astype(
                    x.dtype
                )
                return x + s, s

            return jax.lax.scan(body, a[0], None, length=n)

        return run

    probe_n = 2000
    if flops:
        probe_n = int(min(probe_n, max(8, 2e11 / flops)))
    run = make_run(probe_n)
    np.asarray(run(*args)[1])  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(*args)[1])
    probe_t = time.perf_counter() - t0
    per_probe = max(probe_t / probe_n, 1e-9)
    n_large = int(min(max(probe_n, target_s / per_probe), 400_000))
    n_small = max(n_large // 4, 1)

    times = {}
    for n in (n_small, n_large):
        run = make_run(n)
        np.asarray(run(*args)[1])  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(*args)[1])
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_call = max(times[n_large] - times[n_small], 1e-9) / (
        n_large - n_small
    )
    return per_call


def main(model="dn40", px=224, batch=None):
    import jax
    import jax.numpy as jnp

    V5E_BF16_PEAK = 394e12

    global BATCH
    if model == "dn121":
        shapes = dn121_conv_shapes(px)
        BATCH = batch or 64  # the 224px flagship config's batch
    else:
        shapes = dn40_conv_shapes()
        BATCH = batch or 128
    rows = []
    total_flops = 0.0
    total_time = 0.0
    rng = np.random.default_rng(0)
    for (h, cin, cout, k), count in sorted(shapes.items()):
        x = jnp.asarray(
            rng.normal(size=(BATCH, h, h, cin)), jnp.bfloat16
        )
        w = jnp.asarray(
            rng.normal(size=(k, k, cin, cout)) / np.sqrt(k * k * cin),
            jnp.bfloat16,
        )
        dy = jnp.asarray(
            rng.normal(size=(BATCH, h, h, cout)), jnp.bfloat16
        )

        fwd = lambda x_, w_: jax.lax.conv_general_dilated(
            x_, w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # input-gradient and weight-gradient convs via VJP (exactly the
        # primitives the HVP's backward passes lower to)
        _, vjp = jax.vjp(fwd, x, w)

        flops = 2.0 * BATCH * h * h * cin * cout * k * k

        def _retry(f, a, tries=3):
            # the tunneled chip's remote-compile endpoint drops
            # connections transiently; a plain retry recovers
            for attempt in range(tries):
                try:
                    return measure_primitive(f, a, flops=flops)
                except Exception as e:
                    if attempt == tries - 1:
                        raise
                    print(f"# retrying after: {e}", flush=True)
                    time.sleep(5)
        t_fwd = _retry(fwd, (x, w))
        t_dx = _retry(lambda d: vjp(d)[0], (dy,))
        t_dw = _retry(lambda d: vjp(d)[1], (dy,))
        for tag, t in (("fwd", t_fwd), ("dx", t_dx), ("dw", t_dw)):
            eff = flops / t / V5E_BF16_PEAK * 100
            # lane-cap prediction: output channels fill min(C,128) of
            # the MXU's 128 lanes (dx's output has C_in channels)
            lane_c = cin if tag == "dx" else cout
            rows.append({
                "shape": f"{h}x{h}x{cin}->{cout} k{k} {tag}",
                "count": count,
                "gflops": round(flops / 1e9, 2),
                "tflops_per_sec": round(flops / t / 1e12, 2),
                "mfu_pct": round(eff, 2),
                "lane_cap_pct": round(min(lane_c, 128) / 128 * 100, 1),
            })
            total_flops += count * flops
            total_time += count * t
        print(f"# {h}x{h} {cin}->{cout} k{k} x{count}: "
              f"fwd {flops/t_fwd/1e12:.2f} dx {flops/t_dx/1e12:.2f} "
              f"dw {flops/t_dw/1e12:.2f} TF/s", flush=True)

    predicted_mfu = total_flops / total_time / V5E_BF16_PEAK * 100
    print(json.dumps({
        "metric": f"{model}_conv_per_shape_roofline",
        "batch": BATCH,
        "predicted_pipeline_mfu_pct": round(predicted_mfu, 2),
        "note": ("flop-weighted mean of standalone per-shape conv "
                 "efficiencies (fwd+dx+dw equally weighted per layer) "
                 "— the ceiling a perfectly-fused HVP pipeline could "
                 "reach on this chip"),
        "shapes": rows,
    }), flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dn40", choices=["dn40", "dn121"])
    ap.add_argument("--px", type=int, default=224)
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()
    main(args.model, args.px, args.batch)
