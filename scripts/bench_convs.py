"""A/B-benchmark the UNet's conv shapes against alternative formulations.

Round-4 profiling (scripts/profile_bench.py, ROADMAP matrix) measured the
UNet's convs at ~38-50% MXU while the VAE's (128-multiple channels) run at
84-98%. This isolates WHERE the loss is: each distinct (input, kernel) shape
the serving UNet executes at batch 16 is timed standalone under jit, against
candidate rewrites:

  conv    jax.lax.conv_general_dilated NHWC/HWIO (the shipped path)
  im2col  9 shifted slices -> [B*H*W, 9C] @ [9C, Cout] matmul
  tapmm   sum of 9 shifted [B*H*W, C] @ [C, Cout] matmuls (no patch tensor)

Timing notes (ROADMAP "Environment lessons"): the axon runtime DEDUPES
identical executions AND adds ~3-5 ms of per-dispatch overhead — so ALL
timed iterations run inside ONE jitted lax.scan (i-perturbed inputs defeat
both dedup and loop-invariant hoisting; a y.mean() consumer defeats DCE),
and the scan's wall time is compared against an empty-scan control.
Estimated MXU% assumes PROFILE_PEAK_TFLOPS (default 197, v5e bf16).

Usage: python scripts/bench_convs.py [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# (name, input NHWC, kernel HWIO, stride) — every distinct 3x3/1x1 conv shape
# on the serving UNet hot path at batch 16 (SD2.1-base channels 320/640/1280),
# plus two VAE control shapes that profiled at roofline.
B = int(os.environ.get("BENCH_CONV_BATCH", "16"))
SHAPES = [
    ("unet64.320->320", (B, 64, 64, 320), (3, 3, 320, 320), 1),
    ("unet64.640->320", (B, 64, 64, 640), (3, 3, 640, 320), 1),  # up concat
    ("unet64.960->320", (B, 64, 64, 960), (3, 3, 960, 320), 1),  # up concat (skip 640)
    ("unet32.640->640", (B, 32, 32, 640), (3, 3, 640, 640), 1),
    ("unet32.320->640", (B, 32, 32, 320), (3, 3, 320, 640), 1),
    ("unet32.1280->640", (B, 32, 32, 1280), (3, 3, 1280, 640), 1),
    ("unet32.1920->640", (B, 32, 32, 1920), (3, 3, 1920, 640), 1),
    ("unet16.1280->1280", (B, 16, 16, 1280), (3, 3, 1280, 1280), 1),
    ("unet16.640->1280", (B, 16, 16, 640), (3, 3, 640, 1280), 1),
    ("unet16.2560->1280", (B, 16, 16, 2560), (3, 3, 2560, 1280), 1),
    ("unet8.1280->1280", (B, 8, 8, 1280), (3, 3, 1280, 1280), 1),
    ("unet8.2560->1280", (B, 8, 8, 2560), (3, 3, 2560, 1280), 1),
    ("unet.down64s2", (B, 64, 64, 320), (3, 3, 320, 320), 2),
    ("unet64.1x1.640->320", (B, 64, 64, 640), (1, 1, 640, 320), 1),
    ("vae128.512->512", (B, 128, 128, 512), (3, 3, 512, 512), 1),
    ("vae512.128->128", (B, 512, 512, 128), (3, 3, 128, 128), 1),
    # edge convs: tiny C_in or C_out, where native conv profiles at ~2% MXU
    ("enc.conv_in.3->128", (B, 512, 512, 3), (3, 3, 3, 128), 1),
    ("unet.conv_in.4->320", (B, 64, 64, 4), (3, 3, 4, 320), 1),
    ("unet.conv_out.320->4", (B, 64, 64, 320), (3, 3, 320, 4), 1),
    ("dec.conv_in.4->512", (B, 64, 64, 4), (3, 3, 4, 512), 1),
    ("dec.conv_out.128->3", (B, 512, 512, 128), (3, 3, 128, 3), 1),
]

DN = ("NHWC", "HWIO", "NHWC")


def conv_ref(x, w, stride):
    pad = [(1, 1), (1, 1)] if w.shape[0] == 3 else [(0, 0), (0, 0)]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad, dimension_numbers=DN
    )


def conv_im2col(x, w, stride):
    if w.shape[0] == 1 or stride != 1:
        return conv_ref(x, w, stride)
    b, h, ww, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        xp[:, dy : dy + h, dx : dx + ww, :] for dy in range(3) for dx in range(3)
    ]
    patches = jnp.concatenate(cols, axis=-1).reshape(b * h * ww, 9 * c)
    y = patches @ w.reshape(9 * c, w.shape[3])
    return y.reshape(b, h, ww, w.shape[3])


def conv_tapmm(x, w, stride):
    if w.shape[0] == 1 or stride != 1:
        return conv_ref(x, w, stride)
    b, h, ww, c = x.shape
    co = w.shape[3]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, ww, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = xp[:, dy : dy + h, dx : dx + ww, :].reshape(b * h * ww, c)
            acc = acc + (sl @ w[dy, dx]).reshape(b, h, ww, co)
    return acc.astype(x.dtype)


def conv_s2d(x, w, stride):
    # the repo's gated space-to-depth rewrite (primitives._conv3x3_s2d)
    from instantrestore_tpu.ops.primitives import _conv3x3_s2d

    if w.shape[0] == 1 or stride != 1 or x.shape[1] % 2 or x.shape[2] % 2:
        return conv_ref(x, w, stride)
    return _conv3x3_s2d({"kernel": w}, x)


VARIANTS = {
    "conv": conv_ref,
    "im2col": conv_im2col,
    "tapmm": conv_tapmm,
    "s2d": conv_s2d,
}


def timed_scan(fn, iters, *args):
    """Wall-time `fn(*args)` run `iters` times inside ONE jitted lax.scan
    dispatch (amortizes the tunnel's multi-ms per-call overhead). Each step
    perturbs the first arg by the step index (defeats dedup/hoisting) and
    folds y.mean() into a carried scalar (defeats DCE). Returns ms/iter."""

    @jax.jit
    def many(seed, *a):
        def body(c, i):
            y = fn(a[0] + (seed + i).astype(a[0].dtype), *a[1:])
            return c + y.mean().astype(jnp.float32), ()

        return jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(iters, dtype=jnp.float32)
        )[0]

    # distinct seeds: the axon runtime would dedupe a repeated identical call
    out = many(jnp.float32(0.0), *args)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = many(jnp.float32(1.0), *args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def bench_projections(iters, peak, dev):
    """Reproduce the in-situ 4.3%-MXU [65536,320]@[320,320] projections.

    profile_bench round 4 measured five dense() instances at 1569 us
    (13.4 GFLOP -> 4.3% MXU) while sibling same-shape dots run ~100 us.
    Hypothesis: those five consume the attention output through a FUSED
    head-merge transpose ([B,h,S,d] -> [B,S,h*d]) — strided lhs reads starve
    the MXU. A/B: contiguous lhs vs transposed lhs vs transpose +
    optimization_barrier (forces a materialized copy before the dot).
    """
    b, h, s, d = 16, 5, 4096, 64
    key = jax.random.PRNGKey(0)
    lhs_heads = (jax.random.normal(key, (b, h, s, d), jnp.float32) * 0.1).astype(
        jnp.bfloat16
    )
    w = (jax.random.normal(key, (h * d, h * d), jnp.float32) * 0.05).astype(
        jnp.bfloat16
    )
    lhs_heads, w = jax.device_put((lhs_heads, w), dev)
    fl = 2 * b * s * (h * d) * (h * d)

    def merged(x):
        return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    lhs_merged = jax.device_put(merged(lhs_heads), dev)
    cases = {
        # contiguous lhs, no transpose at all (the ceiling)
        "contig": (lambda x: x @ w, lhs_merged),
        # transpose inside: XLA free to fuse it into the dot
        "fused-T": (lambda x: merged(x) @ w, lhs_heads),
        # transpose + barrier: forced materialization, then a clean dot
        "barrier-T": (
            lambda x: jax.lax.optimization_barrier(merged(x)) @ w,
            lhs_heads,
        ),
        # multi-dim contraction straight off [B,h,S,d] (no explicit merge)
        "einsum": (
            lambda x: jnp.einsum("bhsd,hdc->bsc", x, w.reshape(h, d, h * d)),
            lhs_heads,
        ),
    }
    print(f"\nprojection lhs-layout A/B ([{b},{h},{s},{d}] -> [{b*s},{h*d}] @ [{h*d},{h*d}]):")
    for name, (fn, lhs) in cases.items():
        ms = timed_scan(fn, iters, lhs)
        print(f"{name:>12} {ms:8.3f} ms  {fl/(ms/1e3)/peak*100:5.1f}% MXU")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    assert jax.default_backend() == "tpu", jax.default_backend()
    peak = float(os.environ.get("PROFILE_PEAK_TFLOPS", "197")) * 1e12
    dev = jax.devices()[0]
    only = os.environ.get("BENCH_CONV_ONLY", "")
    if os.environ.get("BENCH_CONV_PROJ", "1") == "1" and not only:
        bench_projections(iters, peak, dev)

    print(f"{'shape':>22} {'variant':>8} {'ms':>8} {'MXU%':>6}  (batch {B})")
    for name, xs, ws, stride in SHAPES:
        if only and only not in name:
            continue
        key = jax.random.PRNGKey(0)
        x = (jax.random.normal(key, xs, jnp.float32) * 0.1).astype(jnp.bfloat16)
        w = (jax.random.normal(key, ws, jnp.float32) * 0.02).astype(jnp.bfloat16)
        x, w = jax.device_put((x, w), dev)
        out_h = xs[1] // stride
        fl = 2 * B * out_h * out_h * ws[3] * (ws[0] * ws[1] * ws[2])
        base = None
        for vname, fn in VARIANTS.items():
            if vname != "conv" and (ws[0] == 1 or stride != 1):
                continue
            try:
                ms = timed_scan(
                    functools.partial(lambda x, w, fn: fn(x, w, stride), fn=fn),
                    iters, x, w,
                )
            except Exception as e:
                print(f"{name:>22} {vname:>8}  FAILED {type(e).__name__}: {e}"[:120])
                continue
            mxu = fl / (ms / 1e3) / peak * 100
            marker = ""
            if vname == "conv":
                base = ms
            elif base:
                marker = f"  ({base / ms:.2f}x vs conv)"
            print(f"{name:>22} {vname:>8} {ms:8.3f} {mxu:6.1f}{marker}")


if __name__ == "__main__":
    main()
