"""In-situ micro-experiments for the 3-channel boundary convs.

The VAE encoder's conv_in ([B,512,512,3] -> 128ch) and the decoder's
conv_out (128ch -> 3) run at ~2% MXU because XLA lane-pads the 3-channel
contraction/output dim to 128 (profiled round 2: ~14 ms combined at batch
16). XLA-side im2col was measured a REGRESSION (ops/primitives.py
_conv3x3_im2col docstring) because the [B*H*W, 27] patch matrix
materializes through HBM. This script measures the remaining candidates
with DISTINCT inputs per iter (the axon runtime dedupes identical
executions, ROADMAP "environment lessons"):

  a) baseline: lax.conv as the model runs it today
  b) channel-pad: C_in 3 -> 8 zeros (does XLA pick a deeper-K algorithm?)
  c) space-to-depth sparse conv: the k=3 s=1 SAME conv on [512,512,3] is
     EXACTLY a k=2 s=1 VALID conv over the 2x2-block image [257,257,12]
     producing 4*cout channels, + depth-to-space. Contraction 48 vs 3
     (37.5% vs 2.3% MXU feed) at 1.78x FLOPs -> ~9x less MXU time; risk is
     the s2d/d2s relayouts (decoder-upsample d2s measured ~10 ms round 3).
  d) conv_out as N=27 tap-matmul + 9 shifted 3-channel adds (output-side
     analogue: the matmul runs at 21% feed instead of 3/128 output lanes).

Usage: python scripts/conv_experiments.py  (requires the TPU backend)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, H, W = 16, 512, 512
CIN, COUT = 3, 128
DT = jnp.bfloat16


def timeit(fn, args_list, warm=2, iters=8):
    for a in args_list[:warm]:
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list[warm : warm + iters]]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@jax.jit
def a_baseline(x, w):
    return conv_ref(x, w)


@jax.jit
def b_chanpad(x, w):
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 5), (0, 0)))
    return conv_ref(xp, wp)


def s2d_weights(w):
    """[3,3,cin,cout] -> [2,2,4*cin,4*cout] sparse block-conv weights.

    Derivation: out(2i+a, 2j+b) = sum_{dy,dx} xp(2i+a+dy, 2j+b+dx) W[dy,dx]
    with xp the SAME-padded input (xp row y' = in row y'-1). Writing
    y' = 2(i+kh)+u: kh = (a+dy)//2, u = (a+dy)%2 — kh in {0,1}, a k=2 block
    conv over the 257x257 block image. Each output sub-pixel (a,b) uses 9 of
    the 2*2*4*cin taps; the rest stay zero.
    """
    wn = np.asarray(w, np.float32)
    cin, cout = wn.shape[2], wn.shape[3]
    out = np.zeros((2, 2, 4 * cin, 4 * cout), np.float32)
    for a in range(2):
        for b in range(2):
            for dy in range(3):
                for dx in range(3):
                    kh, u = divmod(a + dy, 2)
                    kw, v = divmod(b + dx, 2)
                    out[kh, kw, (u * 2 + v) * cin : (u * 2 + v + 1) * cin,
                        (a * 2 + b) * cout : (a * 2 + b + 1) * cout] += wn[dy, dx]
    return jnp.asarray(out, DT)


@jax.jit
def c_s2d(x, w4):
    b_, h, wdt, cin = x.shape
    hb, wb = h // 2 + 1, wdt // 2 + 1  # 257 blocks from the 514-padded image
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xb = xp.reshape(b_, hb, 2, wb, 2, cin).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(b_, hb, wb, 4 * cin)
    y = jax.lax.conv_general_dilated(
        xb, w4, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, 256, 256, 4*cout]
    cout = y.shape[-1] // 4
    y = y.reshape(b_, h // 2, wdt // 2, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b_, h, wdt, cout)


@jax.jit
def d_convout_taps(x128, wn):
    # conv_out analogue: [B,512,512,128] -> 3ch. Tap-matmul: N = 27
    # (9 taps x 3 out ch), then 9 shifted adds of 3-wide slices.
    y = jnp.einsum("bhwc,cn->bhwn", x128, wn)  # [B,512,512,27]
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((*x128.shape[:3], 3), y.dtype)
    for t in range(9):
        dy, dx = divmod(t, 3)
        # out(h,w) needs tap t at input (h+dy-1, w+dx-1) = yp row h+dy
        out = out + yp[:, dy : dy + x128.shape[1], dx : dx + x128.shape[2],
                       t * 3 : t * 3 + 3]
    return out


@jax.jit
def d_convout_base(x128, w_out):
    return jax.lax.conv_general_dilated(
        x128, w_out, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((B, H, W, CIN)), DT) for _ in range(12)]
    w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)) * 0.05, DT)
    w4 = s2d_weights(w)

    ref = np.asarray(a_baseline(xs[0], w), np.float32)
    got = np.asarray(c_s2d(xs[0], w4), np.float32)
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
    print(f"s2d rel err {err:.2e}")

    print(f"a) baseline conv_in : {timeit(lambda x: a_baseline(x, w), [(x,) for x in xs]):7.2f} ms")
    print(f"b) chan-pad 3->8    : {timeit(lambda x: b_chanpad(x, w), [(x,) for x in xs]):7.2f} ms")
    print(f"c) s2d sparse conv  : {timeit(lambda x: c_s2d(x, w4), [(x,) for x in xs]):7.2f} ms")

    x128s = [jnp.asarray(rng.standard_normal((B, H, W, 128)), DT) for _ in range(12)]
    w_out = jnp.asarray(rng.standard_normal((3, 3, 128, 3)) * 0.05, DT)
    wn = jnp.asarray(
        np.asarray(w_out, np.float32).reshape(9, 128, 3).transpose(1, 0, 2).reshape(128, 27),
        DT,
    )
    ref = np.asarray(d_convout_base(x128s[0], w_out), np.float32)
    got = np.asarray(d_convout_taps(x128s[0], wn), np.float32)
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
    print(f"tap-matmul rel err {err:.2e}")
    print(f"d0) baseline conv_out: {timeit(lambda x: d_convout_base(x, w_out), [(x,) for x in x128s]):7.2f} ms")
    print(f"d1) tap-matmul       : {timeit(lambda x: d_convout_taps(x, wn), [(x,) for x in x128s]):7.2f} ms")


if __name__ == "__main__":
    main()
