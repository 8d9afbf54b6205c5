"""TPU-first NN primitives: NHWC convs, dense, norms, activations, LoRA.

Design notes
------------
* Everything is a pure function over a parameter dict. Parameter trees mirror
  the diffusers state-dict structure so the torch->JAX checkpoint converter
  (utils/torch_convert.py) is a near-identity mapping — but layouts are
  TPU-native: NHWC activations, HWIO conv kernels, [in, out] dense kernels.
* Matmuls/convs run in the compute dtype (bfloat16 by default at inference);
  normalization statistics and softmax always accumulate in float32.
* LoRA is data, not module surgery: a layer's param dict may carry
  ``lora_A``/``lora_B`` factors (peft semantics,
  /root/reference/face_replace/models/pix2pix_turbo.py:171-188). The delta is
  applied as ``scaling * B(A(x))`` where ``scaling`` is a static float passed
  by the caller (peft: lora_alpha / r). Keeping the factors separate (rather
  than merging) preserves trainability and lets one base-parameter tree serve
  both the LoRA-restoration UNet and the frozen K/V-capture UNet.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Opt-in alternate conv paths. Both compute identical math and were built as
# round-3 perf candidates; both MEASURED SLOWER in the batch-16/512px serving
# profile (see their docstrings), so the defaults stay off. Read once at
# import: jit-static, flip before importing to experiment.
_CONV_IM2COL = os.environ.get("INSTANTRESTORE_CONV_IM2COL", "0") == "1"
# subpixel upsample+conv mode: "0" off (materialized nearest-2x + 3x3 conv),
# "1" 4 phase convs + 6-D-transpose depth-to-space (round-3, measured net
# slower), "2" 4 phase convs + pairwise stack-reshape interleave (no big
# transpose), "3" ONE lhs-dilated 4x4 conv (zero-insertion upsample folded
# into the kernel; XLA writes the 2x output directly — no interleave at all)
_SUBPIXEL_UP = os.environ.get("INSTANTRESTORE_SUBPIXEL_UP")  # None => per-backend
_CONV_S2D = os.environ.get("INSTANTRESTORE_CONV_S2D", "0") == "1"
_CONV_TAPMM = os.environ.get("INSTANTRESTORE_CONV_TAPMM", "0") == "1"


def _subpixel_mode() -> str:
    """Resolved subpixel-upsample mode: an explicit INSTANTRESTORE_SUBPIXEL_UP
    (or monkeypatched ``_SUBPIXEL_UP``) wins; otherwise "3" (one lhs-dilated
    conv) on TPU/GPU and "0" (materialized nearest-2x) on CPU. Mode 3's win
    is an MXU-roofline argument (2.25x fewer MACs on a roofline-bound conv)
    that does not apply to the CPU backend — and its lhs-dilated-conv grads
    were one of the two graph changes that pushed the virtual-8-device CPU
    dryrun's full-recipe compile past the driver budget in round 4, so CPU
    graphs keep the cheap materialized path unless explicitly overridden."""
    if _SUBPIXEL_UP is not None:
        return _SUBPIXEL_UP
    return "3" if jax.default_backend() in ("tpu", "gpu") else "0"

# int8 calibration side-channel: while a `with_int8_records`-wrapped forward
# is being TRACED, conv2d's dynamic-int8 branch appends (calib_slot, observed
# activation scale) here; the wrapper returns them as extra outputs so one
# jitted execution yields concrete per-conv scales (see
# apply_int8_calibration).
_INT8_CALIB_RECORDS = None

# ---------------------------------------------------------------------------
# dense / conv with optional LoRA
# ---------------------------------------------------------------------------


# Flatten batched dense() inputs to ONE 2-D matmul. XLA:TPU formulates a
# 3-D [B, S, C] x [C, O] dot as a `0bf_io0->0bf` CONVOLUTION, and on the 64^2
# transformer blocks layout assignment then picks the sequence-in-lanes
# {1, 2, 0} layout + the EmitAllBatchInSublanes-family conv emitter: the five
# proj_in instances profiled at 1569 us / 4.3% MXU each (~7.8 ms/iter of pure
# pathology) while same-shape siblings with friendly layouts run 122 us
# (round-5 scripts/profile_bench.py + compiled-HLO inspection). A 2-D
# [B*S, C] x [C, O] dot cannot take the conv emitter; the reshape is a
# bitcast for standard-layout inputs and forces at worst one relayout copy
# (~0.2 ms at this size) where layout assignment would otherwise have
# propagated the poisoned layout into the dot. OPT-IN (off by default):
# applying it to EVERY dense measured a net regression — 35.49 vs 35.79
# faces/sec at batch-16/512px — because the healthy 3-D dots (ff
# projections at 85-95% MXU) pick up relayout copies; the win is scoped to
# the pathological call sites instead (models/unet.py proj_in).
_DENSE_2D = os.environ.get("INSTANTRESTORE_DENSE_2D")


def _dense_2d_on() -> bool:
    return _DENSE_2D == "1"


def dense(p: dict, x: jnp.ndarray, *, lora_scaling: float = 1.0) -> jnp.ndarray:
    """y = x @ kernel + bias, with optional factored LoRA delta.

    kernel: [in, out]; lora_A: [in, r]; lora_B: [r, out].
    """
    dtype = x.dtype
    lead = x.shape[:-1]
    if x.ndim > 2 and _dense_2d_on():
        x = x.reshape(-1, x.shape[-1])  # see _DENSE_2D note above
    y = x @ p["kernel"].astype(dtype)
    if "lora_A" in p:
        y = y + (x @ p["lora_A"].astype(dtype) @ p["lora_B"].astype(dtype)) * jnp.asarray(
            lora_scaling, dtype
        )
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    if y.ndim == 2 and len(lead) > 1:
        y = y.reshape(*lead, y.shape[-1])
    return y


def _conv3x3_im2col(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 'same' conv as an im2col matmul, for TINY input-channel
    counts (the VAE encoder's 3-channel conv_in at 512^2).

    XLA's native conv lane-pads C_in=3 to the full 128-lane tile, so the MXU
    runs at ~2% utilization (~9-10 ms at batch 16, profiled round 2). Nine
    shifted views concatenated to 9*C_in channels give a contraction depth of
    27 instead of 3. Numerics match: bf16 operands, fp32 accumulation,
    identical weight layout ([kh, kw, cin, cout] reshapes row-major to
    [9*cin, cout] in exactly the patch order built here).

    MEASURED A REGRESSION round 3 (opt-in via INSTANTRESTORE_CONV_IM2COL=1):
    the [B*H*W, 27] relayout before the matmul costs ~13.6 ms (reshape) +
    ~3.1 ms (convert) on chip — MORE than the ~10 ms lane-padded conv it
    replaces. XLA cannot fuse the 9-view concat into dot_general's operand
    read; the math win never reaches the wall clock.
    """
    dtype = x.dtype
    b, hh, ww, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.concatenate(
        [xp[:, i : i + hh, j : j + ww, :] for i in range(3) for j in range(3)],
        axis=-1,
    )  # [B, H, W, 9*cin]
    w = p["kernel"].astype(dtype).reshape(9 * cin, -1)
    y = jax.lax.dot_general(
        patches.reshape(b * hh * ww, 9 * cin),
        w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    y = y.reshape(b, hh, ww, -1)
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _conv3x3_s2d(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 'same' conv on a TINY-C_in image as a 2x2 block conv.

    The k=3 s=1 conv on [H,W,cin] is EXACTLY a k=2 s=1 VALID conv over the
    2x2 space-to-depth block image [(H/2)+1, (W/2)+1, 4*cin] (built from the
    padded input) producing 4*cout channels, followed by depth-to-space.
    Derivation: out(2i+a, 2j+b) = sum_{dy,dx} xp(2i+a+dy, 2j+b+dx) W[dy,dx];
    writing row 2i+a+dy = 2(i+kh)+u gives kh=(a+dy)//2, u=(a+dy)%2 — kh in
    {0,1}. Each output sub-pixel (a,b) uses 9 of the 2*2*4cin taps; the rest
    of the scattered weight tensor stays zero.

    Why: MXU contraction depth 4*cin*4 (48 at cin=3) instead of 3, for 1.78x
    the FLOPs — ~9x less MXU time where XLA's native conv runs at ~2%
    utilization (the VAE encoder conv_in, ~9-10 ms at batch-16/512px). The
    risk is the s2d/d2s relayouts; gated opt-in until measured in situ
    (INSTANTRESTORE_CONV_S2D=1, scripts/conv_experiments.py).
    """
    dtype = x.dtype
    b, hh, ww, cin = x.shape
    w = p["kernel"].astype(dtype)
    cout = w.shape[-1]
    w4 = jnp.zeros((2, 2, 4 * cin, 4 * cout), dtype)
    for a in range(2):
        for bb in range(2):
            for dy in range(3):
                for dx in range(3):
                    kh, u = divmod(a + dy, 2)
                    kw, v = divmod(bb + dx, 2)
                    w4 = w4.at[
                        kh, kw,
                        (u * 2 + v) * cin : (u * 2 + v + 1) * cin,
                        (a * 2 + bb) * cout : (a * 2 + bb + 1) * cout,
                    ].set(w[dy, dx])
    hb, wb = hh // 2 + 1, ww // 2 + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xb = xp.reshape(b, hb, 2, wb, 2, cin).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(b, hb, wb, 4 * cin)
    y = jax.lax.conv_general_dilated(
        xb, w4, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, H/2, W/2, 4*cout]
    y = y.reshape(b, hh // 2, ww // 2, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b, hh, ww, cout)
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _conv3x3_tap_matmul(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 'same' conv with TINY C_out as a tap matmul.

    XLA lane-pads the 3-channel OUTPUT of the decoder conv_out to 128 lanes
    (~2% MXU). Instead: one [*, cin] @ [cin, 9*cout] matmul computes all 9
    taps per pixel (N = 27 at cout=3 — 21% lane feed), then the conv sum is
    9 shifted adds of 3-wide channel slices of the zero-padded tap plane
    (zero padding of taps == zero padding of the input, since each tap is
    linear in the input pixel). Opt-in until measured in situ
    (INSTANTRESTORE_CONV_TAPMM=1, scripts/conv_experiments.py).
    """
    dtype = x.dtype
    b, hh, ww, cin = x.shape
    w = p["kernel"].astype(dtype)
    cout = w.shape[-1]
    wn = w.reshape(9, cin, cout).transpose(1, 0, 2).reshape(cin, 9 * cout)
    y = jax.lax.dot_general(
        x.reshape(b * hh * ww, cin), wn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(b, hh, ww, 9 * cout)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b, hh, ww, cout), dtype)
    for t in range(9):
        dy, dx = divmod(t, 3)
        # out(h,w) needs tap t of input (h+dy-1, w+dx-1) = padded row h+dy
        out = out + yp[:, dy : dy + hh, dx : dx + ww, t * cout : (t + 1) * cout]
    if "bias" in p:
        out = out + p["bias"].astype(dtype)
    return out


def conv2d(
    p: dict,
    x: jnp.ndarray,
    *,
    stride: int = 1,
    padding: int = 1,
    lora_scaling: float = 1.0,
) -> jnp.ndarray:
    """NHWC conv with HWIO kernel and optional conv-LoRA.

    peft Conv2d LoRA (used for conv/conv1/conv2/conv_shortcut/... targets,
    pix2pix_turbo.py:151-156,171-174): lora_A is a conv with the SAME spatial
    kernel/stride/padding mapping in->r channels; lora_B is a 1x1 conv r->out.
    """
    dtype = x.dtype
    _plain3x3 = (
        stride == 1
        and padding == 1
        and "lora_A" not in p
        and "kernel_int8" not in p
        and p["kernel"].ndim == 4
        and p["kernel"].shape[0] == 3
        and p["kernel"].shape[1] == 3
    )
    if _CONV_IM2COL and _plain3x3 and p["kernel"].shape[2] * 9 <= 128:
        return _conv3x3_im2col(p, x)
    if (
        _CONV_S2D
        and _plain3x3
        and p["kernel"].shape[2] <= 4
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
    ):
        return _conv3x3_s2d(p, x)
    if (
        _CONV_TAPMM
        and _plain3x3
        and p["kernel"].shape[3] <= 8
        and p["kernel"].shape[2] >= 32
    ):
        return _conv3x3_tap_matmul(p, x)
    dn = ("NHWC", "HWIO", "NHWC")
    pad = [(padding, padding), (padding, padding)]
    if "kernel_int8" in p:
        # opt-in int8 x int8 conv (quantize_conv_int8): activation scale +
        # static per-out-channel weight scale; hits the MXU's 2x int8 rate on
        # v5e. NOT parity-exact — serving-only, off by default (breaks the
        # <1e-2 reference-parity gate by design).
        x8, a_scale = _quantize_act_int8(p, x)
        y = jax.lax.conv_general_dilated(
            x8,
            p["kernel_int8"],
            window_strides=(stride, stride),
            padding=pad,
            dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        y = (y.astype(jnp.float32) * (a_scale * p["kernel_scale"])).astype(dtype)
        if "bias" in p:
            y = y + p["bias"].astype(dtype)
        return y
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=dn,
    )
    if "lora_A" in p:
        a = jax.lax.conv_general_dilated(
            x,
            p["lora_A"].astype(dtype),
            window_strides=(stride, stride),
            padding=pad,
            dimension_numbers=dn,
        )
        b = jax.lax.conv_general_dilated(
            a,
            p["lora_B"].astype(dtype),
            window_strides=(1, 1),
            padding=[(0, 0), (0, 0)],
            dimension_numbers=dn,
        )
        y = y + b * jnp.asarray(lora_scaling, dtype)
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _quantize_act_int8(p: dict, x: jnp.ndarray):
    """Activation quantization shared by conv2d's int8 branch and the folded
    int8 upsampler in upsample2x_conv: returns (x_int8, a_scale fp32).

    With a CALIBRATED static scale (apply_int8_calibration) the quantize
    chain is pure elementwise — no abs-max reduction pass — so XLA fuses it
    into the producing GroupNorm/SiLU epilogue; that is what makes int8 a
    net win at serving batch sizes (the dynamic per-call reduction measured
    as a regression on the UNet, ROADMAP round-2 #4). Out-of-calibration
    activations clip. Without one, a DYNAMIC per-SAMPLE scale is used so
    co-batched images never affect each other's quantization grid, and the
    observed scale is appended to the calibration side-channel when a
    `with_int8_records` trace is active."""
    xf = x.astype(jnp.float32)
    if "a_scale" in p:
        a_scale = p["a_scale"].astype(jnp.float32)
    else:
        a_scale = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0,
            1e-12,
        )
        if _INT8_CALIB_RECORDS is not None and "calib_slot" in p:
            _INT8_CALIB_RECORDS.append((p["calib_slot"], jnp.max(a_scale)))
    x8 = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    return x8, a_scale


def quantize_conv_int8(p: dict, *, fold_upsample: bool = False) -> dict:
    """Conv param dict -> int8 weight layout consumed by conv2d's int8
    branch: symmetric per-out-channel weight quantization. LoRA must be
    merged first (models/lora.py::merge_lora).

    fold_upsample: for convs that are only ever applied through
    upsample2x_conv, quantize the FOLDED 4x4 subpixel kernel (mode-3 math,
    see upsample2x_conv) instead of the raw 3x3 — the int8 engine then runs
    the one lhs-dilated conv rather than materializing the 2x nearest grid.
    Folding before quantizing also beats folding quantized taps: K4 entries
    are sums of 4 fp taps quantized once, not sums of 4 already-rounded
    int8 values."""
    assert "lora_A" not in p, "merge LoRA before int8 quantization"
    k = p["kernel"].astype(jnp.float32)
    if fold_upsample and k.ndim == 4 and k.shape[0] == 3 and k.shape[1] == 3:
        kp = jnp.pad(k, ((1, 1), (1, 1), (0, 0), (0, 0)))
        k = kp[:-1, :-1] + kp[1:, :-1] + kp[:-1, 1:] + kp[1:, 1:]  # [4,4,i,o]
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
    k8 = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    q = {kk: v for kk, v in p.items() if kk != "kernel"}
    q["kernel_int8"] = k8
    q["kernel_scale"] = scale
    return q


def quantize_block_convs_int8(bp: dict) -> dict:
    """int8-quantize the conv mass of one resnet-style block dict: resnet
    conv1/conv2/conv_shortcut plus down/upsampler convs; every other leaf
    (norms, attentions, time_emb_proj, ...) is left untouched. Shared by
    models/vae.py::quantize_decoder_int8 and models/unet.py::
    quantize_unet_int8 so the quantization scheme stays in one place."""

    def q_res(rp):
        rp = dict(rp)
        for name in ("conv1", "conv2", "conv_shortcut"):
            if name in rp:
                rp[name] = quantize_conv_int8(rp[name])
        return rp

    nb = dict(bp)
    if "resnets" in nb:
        nb["resnets"] = [q_res(r) for r in nb["resnets"]]
    for samplers in ("downsamplers", "upsamplers"):
        if samplers in nb:
            # upsampler convs only ever run through upsample2x_conv: fold the
            # subpixel 4x4 kernel before quantizing when mode 3 is active so
            # the int8 engine skips the materialized 2x grid too.
            fold = samplers == "upsamplers" and _subpixel_mode() == "3"
            nb[samplers] = [
                {**s, "conv": quantize_conv_int8(s["conv"], fold_upsample=fold)}
                for s in nb[samplers]
            ]
    return nb


# ---------------------------------------------------------------------------
# int8 static-scale calibration (VERDICT r2 #9 / ROADMAP #4)
#
# The dynamic int8 path pays an abs-max reduction + a dependent quantize pass
# over every conv input — measured as a net REGRESSION on the UNet at serving
# sizes. Calibration replaces it with a static per-conv activation scale
# observed on representative batches, making the quantize chain pure
# elementwise (fused by XLA into the GN/SiLU producer). Flow:
#
#     q = quantize_unet_int8(merge_lora(params, s))      # int8 weights
#     q = assign_calib_slots(q)                          # unique slot ids
#     fn = with_int8_records(forward)                    # jit-able wrapper
#     (_, (slots, scales)) = jax.jit(fn)(q, batch, ...)  # observe scales
#     q = apply_int8_calibration(q, slots, scales)       # bake static a_scale
# ---------------------------------------------------------------------------


def _map_int8_convs(tree, fn):
    """Rebuild `tree` applying `fn` to every dict that holds an int8 conv
    (post-order, functional — shared dict objects are not mutated)."""
    if isinstance(tree, dict):
        new = {k: _map_int8_convs(v, fn) for k, v in tree.items()}
        return fn(new) if "kernel_int8" in new else new
    if isinstance(tree, (list, tuple)):
        t = type(tree)
        return t(_map_int8_convs(v, fn) for v in tree)
    return tree


def assign_calib_slots(tree):
    """Give every int8-quantized conv dict a unique ``calib_slot`` int32 leaf
    (deterministic tree-walk order). Slots key the observed-scale records back
    to their convs — trace order and tree order need not agree."""
    counter = [0]

    def tag(p):
        p = dict(p)
        p["calib_slot"] = jnp.int32(counter[0])
        counter[0] += 1
        return p

    return _map_int8_convs(tree, tag)


def with_int8_records(fn):
    """Wrap a forward so one (jitted) call also returns the int8 calibration
    records: ``wrapped(*a, **k) -> (fn_out, (slots [R], scales [R]))``.

    Recording happens while `fn` is traced; the records are returned as
    outputs, so executions yield concrete per-conv observed scales. Convs
    whose params already carry a static ``a_scale`` are not recorded."""

    def wrapped(*args, **kwargs):
        global _INT8_CALIB_RECORDS
        prev = _INT8_CALIB_RECORDS
        _INT8_CALIB_RECORDS = []
        try:
            out = fn(*args, **kwargs)
            recs = _INT8_CALIB_RECORDS
        finally:
            _INT8_CALIB_RECORDS = prev
        if recs:
            slots = jnp.stack([jnp.asarray(s, jnp.int32) for s, _ in recs])
            scales = jnp.stack([v.astype(jnp.float32) for _, v in recs])
        else:
            slots = jnp.zeros((0,), jnp.int32)
            scales = jnp.zeros((0,), jnp.float32)
        return out, (slots, scales)

    return wrapped


def apply_int8_calibration(tree, slots, scales, *, margin: float = 1.0):
    """Bake observed activation scales into the quantized tree as static
    per-conv ``a_scale`` leaves (consumed by conv2d's static int8 branch).

    slots/scales: concatenation of the record outputs from one or more
    `with_int8_records` executions (calibration batches); a conv observed
    multiple times keeps its max. `margin` > 1 leaves clipping headroom for
    activations beyond the calibration set. Convs with no observation keep
    the dynamic path (their `calib_slot` is kept so a later pass can still
    calibrate them)."""
    slots = np.asarray(slots)
    scales = np.asarray(scales, np.float32)
    by_slot = {}
    for s, v in zip(slots.tolist(), scales.tolist()):
        by_slot[s] = max(by_slot.get(s, 0.0), float(v))

    def bake(p):
        slot = p.get("calib_slot")
        if slot is None or int(slot) not in by_slot:
            return p
        p = {k: v for k, v in p.items() if k != "calib_slot"}
        p["a_scale"] = jnp.float32(max(by_slot[int(slot)] * margin, 1e-12))
        return p

    return _map_int8_convs(tree, bake)


# ---------------------------------------------------------------------------
# normalization (always fp32 statistics)
# ---------------------------------------------------------------------------


def group_norm(p: dict, x: jnp.ndarray, *, num_groups: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over NHWC (or [..., C]) input; statistics in fp32.

    fp32 inputs use the exact two-pass formula. For reduced-precision inputs
    (bf16 serving) the normalization is refactored to ``x * a + b`` with
    per-(batch, channel) fp32 coefficients so no fp32 copy of the activation
    is ever materialized — at 512x512x128 x batch 64 that copy alone is
    8.6 GB, more than half the chip's HBM.
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    g = num_groups
    b = x.shape[0]
    xg = x.reshape(b, -1, g, c // g)  # [B, spatial, G, C/G]

    if orig_dtype == jnp.float32:
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        out = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
        return out * p["scale"] + p["bias"]

    # memory-light path: fused fp32-accumulating reductions (the cast fuses
    # into the reduce, no temp), then one low-precision elementwise pass.
    xf32 = xg.astype(jnp.float32)
    mean = jnp.mean(xf32, axis=(1, 3))  # [B, G]
    m2 = jnp.mean(jnp.square(xf32), axis=(1, 3))
    var = jnp.maximum(m2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)  # [B, G]
    # per-channel coefficients: out = x * a + bcoef
    inv_c = jnp.repeat(inv, c // g, axis=1)  # [B, C]
    mean_c = jnp.repeat(mean, c // g, axis=1)
    a = inv_c * p["scale"].astype(jnp.float32)[None, :]
    bcoef = p["bias"].astype(jnp.float32)[None, :] - mean_c * a
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return x * a.astype(orig_dtype).reshape(shape) + bcoef.astype(orig_dtype).reshape(shape)


def layer_norm(p: dict, x: jnp.ndarray, *, eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(orig_dtype)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbor upsample [B, H, W, C] as broadcast + reshape.

    Bit-identical to jax.image.resize(method='nearest') at exactly 2x, but
    XLA lowers resize to gather while-loops on TPU (measured ~33 ms across
    the decoder upsamples at batch 16) whereas this compiles to a cheap
    fused broadcast."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def upsample2x_conv(
    p: dict, x: jnp.ndarray, *, lora_scaling: float = 1.0
) -> jnp.ndarray:
    """nearest-2x upsample followed by a 3x3 'same' conv, computed by
    SUBPIXEL DECOMPOSITION — the identical math with 2.25x fewer MACs.

    On the 2x-replicated grid each output phase (a, b) in {0,1}^2 only ever
    multiplies ADJACENT pairs of low-res pixels, with 3x3 taps collapsing to
    2x2 phase kernels (1-D: y[2i] = w0*x[i-1] + (w1+w2)*x[i];
    y[2i+1] = (w0+w1)*x[i] + w2*x[i+1]; zero-padding on the upsampled grid
    maps exactly to zero-padding x by 1). So: 4 valid 2x2 convs over padded
    low-res x + a depth-to-space interleave, instead of a 3x3 conv over the
    4x-larger upsampled tensor — the decoder's two big upsampler convs run
    at the MXU roofline, so the MAC reduction is wall-clock (2x 25 ms ->
    ~2x 11 ms at batch-16/512px serving). Tap sums are combined in fp32 and
    cast once, the same rounding scale as the stored bf16 kernels.

    Falls back to the materialized path for LoRA/int8 kernels (training's
    factored conv-LoRA keeps its exact peft semantics).

    Mode history (INSTANTRESTORE_SUBPIXEL_UP; in-situ batch-16/512px):
    - "1" (round 3): 4 phase convs + 6-D transpose depth-to-space — the
      phase convs land (~2.8 ms each vs 25 ms fused) but the interleave
      copies (~6.5 + 3.3 ms per upsampler) eat the MAC savings. Net worse.
    - "2" (round 4): pairwise stack-reshape interleave — 31.1 faces/sec,
      still copy-bound.
    - "3" (round 4, DEFAULT on TPU/GPU — round 5 gates CPU back to "0",
      see _subpixel_mode): one lhs-dilated conv, no interleave at all.
      nearest-2x is ones2x2 (*) zero-dilated x, so
      conv3x3(up2x(x)) == conv4x4'(dilate2(x)) with
      K4[u,v] = sum_{a,b in {0,1}} W[u-1+a, v-1+b]; XLA writes the 2x grid
      directly from the conv. Measured 35.67 faces/sec vs 32.87 materialized
      (448.5 vs 486.8 ms/batch-16) — the decoder's two roofline upsampler
      convs drop ~2.25x in MACs with zero relayout cost. "0" opts out.
    """
    if "kernel_int8" in p:
        if p["kernel_int8"].shape[0] == 4:
            # pre-folded int8 subpixel kernel (quantize_conv_int8 with
            # fold_upsample=True): one lhs-dilated int8 conv, same exact
            # decomposition as fp mode "3" below, at the MXU int8 rate.
            dtype = x.dtype
            x8, a_scale = _quantize_act_int8(p, x)
            y = jax.lax.conv_general_dilated(
                x8,
                p["kernel_int8"],
                window_strides=(1, 1),
                padding=[(2, 2), (2, 2)],
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * (a_scale * p["kernel_scale"])).astype(
                dtype
            )
            if "bias" in p:
                y = y + p["bias"].astype(dtype)
            return y
        return conv2d(p, nearest_upsample_2x(x), lora_scaling=lora_scaling)
    mode = _subpixel_mode()
    if mode == "0" or "lora_A" in p or p["kernel"].shape[0] != 3:
        return conv2d(p, nearest_upsample_2x(x), lora_scaling=lora_scaling)
    dtype = x.dtype
    bsz, hh, ww, cin = x.shape
    w = p["kernel"].astype(jnp.float32)  # [3, 3, cin, cout]
    if mode == "3":
        # zero-insertion (lhs_dilation=2) + 4x4 kernel = nearest-2x + 3x3
        # conv, exactly: nearest duplication is ones2x2 (*) zero-dilated x,
        # and conv3x3(ones2x2 (*) xd) == conv4x4'(xd) with
        # K4[u,v] = sum_{a,b in {0,1}} W[u-1+a, v-1+b] (valid taps). One
        # conv, no phase interleave — XLA writes the 2x grid directly.
        wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
        k4 = wp[:-1, :-1] + wp[1:, :-1] + wp[:-1, 1:] + wp[1:, 1:]  # [4,4,i,o]
        y = jax.lax.conv_general_dilated(
            x,
            k4.astype(dtype),
            window_strides=(1, 1),
            padding=[(2, 2), (2, 2)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if "bias" in p:
            y = y + p["bias"].astype(dtype)
        return y
    ky = (
        jnp.stack([w[0], w[1] + w[2]]),        # phase a=0: rows (i-1, i)
        jnp.stack([w[0] + w[1], w[2]]),        # phase a=1: rows (i, i+1)
    )
    phase_kernels = {}
    for a in (0, 1):
        wy = ky[a]
        phase_kernels[(a, 0)] = jnp.stack([wy[:, 0], wy[:, 1] + wy[:, 2]], axis=1)
        phase_kernels[(a, 1)] = jnp.stack([wy[:, 0] + wy[:, 1], wy[:, 2]], axis=1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dn = ("NHWC", "HWIO", "NHWC")
    phases = []
    for a in (0, 1):
        for b in (0, 1):
            y = jax.lax.conv_general_dilated(
                xp[:, a : a + hh + 1, b : b + ww + 1, :],
                phase_kernels[(a, b)].astype(dtype),
                window_strides=(1, 1),
                padding=[(0, 0), (0, 0)],
                dimension_numbers=dn,
            )
            phases.append(y)
    cout = phases[0].shape[-1]
    if mode == "2":
        # pairwise interleave: stack on a fresh minor-adjacent axis then a
        # CONTIGUOUS reshape (free) — two concat-shaped copies instead of
        # the 6-D transpose depth-to-space that ate mode 1's MAC savings
        z0 = jnp.stack(phases[0:2], axis=3).reshape(bsz, hh, 2 * ww, cout)
        z1 = jnp.stack(phases[2:4], axis=3).reshape(bsz, hh, 2 * ww, cout)
        y = jnp.stack([z0, z1], axis=2).reshape(bsz, 2 * hh, 2 * ww, cout)
    else:
        y = jnp.stack(phases, axis=0).reshape(2, 2, bsz, hh, ww, cout)
        y = y.transpose(2, 3, 0, 4, 1, 5).reshape(bsz, 2 * hh, 2 * ww, cout)
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # diffusers GEGLU uses exact (erf) gelu, matching torch F.gelu default.
    return jax.nn.gelu(x, approximate=False)


def geglu(p: dict, x: jnp.ndarray, *, lora_scaling: float = 1.0) -> jnp.ndarray:
    """diffusers GEGLU: project to 2*d_ff, gate with exact gelu."""
    h = dense(p, x, lora_scaling=lora_scaling)
    h, gate = jnp.split(h, 2, axis=-1)
    return h * gelu(gate)


# ---------------------------------------------------------------------------
# timestep embedding (diffusers get_timestep_embedding semantics)
# ---------------------------------------------------------------------------


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [B] -> [B, dim], fp32.

    Mirrors diffusers.models.embeddings.get_timestep_embedding as invoked by
    the SD-Turbo UNet (flip_sin_to_cos=True, freq_shift=0).
    """
    half = dim // 2
    # static table, computed in float64 host-side for accuracy
    freqs = jnp.asarray(
        np.exp(
            -np.log(max_period) * np.arange(half) / (half - downscale_freq_shift)
        ).astype(np.float32)
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    # Explicit range reduction: XLA's sin/cos lose precision for args >> 2*pi
    # (timestep 999 * freq 1.0); reduce mod 2*pi first.
    two_pi = 2.0 * math.pi
    args = args - two_pi * jnp.floor(args / two_pi)
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


# ---------------------------------------------------------------------------
# parameter initializers (random init for tests / from-scratch training;
# real weights come from the checkpoint converter)
# ---------------------------------------------------------------------------


def init_dense(key, in_dim: int, out_dim: int, *, bias: bool = True, dtype=jnp.float32) -> dict:
    k1, _ = jax.random.split(key)
    scale = 1.0 / math.sqrt(in_dim)
    p = {"kernel": jax.random.uniform(k1, (in_dim, out_dim), dtype, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def init_conv2d(
    key, in_ch: int, out_ch: int, kernel_size: int = 3, *, bias: bool = True, dtype=jnp.float32
) -> dict:
    k1, _ = jax.random.split(key)
    fan_in = in_ch * kernel_size * kernel_size
    scale = 1.0 / math.sqrt(fan_in)
    p = {
        "kernel": jax.random.uniform(
            k1, (kernel_size, kernel_size, in_ch, out_ch), dtype, -scale, scale
        )
    }
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def init_norm(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def add_lora_dense(p: dict, key, rank: int, *, init_std: Optional[float] = None) -> dict:
    """Attach peft-style gaussian-init LoRA factors to a dense param dict."""
    in_dim, out_dim = p["kernel"].shape
    std = init_std if init_std is not None else 1.0 / rank
    p = dict(p)
    p["lora_A"] = jax.random.normal(key, (in_dim, rank), jnp.float32) * std
    p["lora_B"] = jnp.zeros((rank, out_dim), jnp.float32)
    return p


def add_lora_conv(p: dict, key, rank: int, *, init_std: Optional[float] = None) -> dict:
    kh, kw, in_ch, out_ch = p["kernel"].shape
    std = init_std if init_std is not None else 1.0 / rank
    p = dict(p)
    p["lora_A"] = jax.random.normal(key, (kh, kw, in_ch, rank), jnp.float32) * std
    p["lora_B"] = jnp.zeros((1, 1, rank, out_ch), jnp.float32)
    return p
