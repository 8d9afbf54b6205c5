"""Attention for the restoration UNet, including shared-image attention.

The reference implements personalization with stateful "attention processors"
mutated onto diffusers modules (/root/reference/face_replace/models/
attn_processors.py): a capture processor stashes K/V on ``self`` during the
frozen-UNet pass (:22-97), and ``SharedAttnProcessor`` (:183-279) widens the
up-block self-attentions with those K/V (optionally AdaIN-modulated, :242-246)
passed through ``cross_attention_kwargs``.

Here that is pure data flow:

* K/V capture is a return value: ``attention(..., capture_kv=True)`` returns
  the head-split ``to_k``/``to_v`` projections ([B, H, S, d]) alongside the
  output.
* Shared attention takes ``ref_kv=(ref_k, ref_v)`` of shape [B, N, H, S, d]
  and computes softmax attention over the widened K/V, exactly matching the
  reference semantics: invalid references are ZEROED K/V rows (not -inf
  masked; pix2pix_turbo.py:269-273), so they still receive uniform attention
  mass — this is load-bearing for the per-reference attention-mass statistics
  the gradio demo reports.
* AdaIN of reference values onto the input-value statistics uses UNBIASED
  std (torch.std default) with the reference's +1e-5 epsilon
  (attn_processors.py:7-18,242-246).

Layout is [B, heads, S, head_dim]; softmax accumulates in float32. The fused
Pallas wide-KV kernel (ops/shared_attention.py) is used on TPU when no
attention probabilities need to be materialized; this module is the XLA
reference path and the training path (landmark-attention loss needs probs).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from instantrestore_tpu.ops.primitives import dense

# Opt-in merged q/k/v projection — measured slower end to end (see
# _qkv_project docstring for the numbers); kept for re-evaluation on other
# chip generations / batch shapes.
_MERGED_QKV = os.environ.get("INSTANTRESTORE_MERGED_QKV", "0") == "1"
# Head-split projections: emit q/k/v straight into [B, h, S, d] via a
# multi-dim-contraction einsum instead of dense() + transpose (see
# _dense_to_heads). OPT-IN: measured NEUTRAL end to end round 5 —
# 35.84 vs 35.79 faces/sec at batch-16/512px serving (two full bench runs,
# ~0.1% = run noise), i.e. XLA was already hiding the split transposes the
# round-4 profile attributed ~4 ms to (they sat in the 'copy' bucket but
# overlap with the surrounding dots). Kept opt-in for re-evaluation on
# other chip generations; numerics match to fp-reassociation tolerance.
_HEADS_PROJ = os.environ.get("INSTANTRESTORE_HEADS_PROJ")


def _heads_proj_on() -> bool:
    return _HEADS_PROJ == "1"


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[B, S, h*d] -> [B, h, S, d]"""
    b, s, inner = x.shape
    return x.reshape(b, s, heads, inner // heads).transpose(0, 2, 1, 3)


def _dense_to_heads(
    p: dict, x: jnp.ndarray, heads: int, *, lora_scaling: float
) -> jnp.ndarray:
    """Projection emitting DIRECTLY into head-split [B, h, S, d] layout.

    Equivalent to ``_split_heads(dense(p, x), heads)`` up to fp
    reassociation — each output element is the same contraction over the
    same input channels; the h-major output layout may change the backend's
    accumulation vectorization (last-ulp diffs measured on CPU;
    tests/test_attention.py::test_heads_projection_bit_exact) — and the
    h-major/d-minor split rides
    the dot's OUTPUT indexing instead of a materialized [B, S, h, d] ->
    [B, h, S, d] transpose. Round-4 profiling attributed ~4 ms/iter of the
    UNet's 5.1 ms copy bucket to these head split/merge transposes around
    the attention kernels (ROADMAP matrix; VERDICT r4 ask 3b); the merge
    side was already removed by _to_out_from_heads — this is the split side.
    Mosaic index-map consumption of a [B, S, h, d] layout is not an option:
    that puts (h, d) in the trailing block dims and d=64 sublane/lane tiles
    with a 1-wide head block violate the (8, 128) tiling rule.
    """
    b, s, cin = x.shape
    dtype = x.dtype
    w = p["kernel"].astype(dtype)
    o = w.shape[1]
    d = o // heads
    y = jnp.einsum("bsc,chd->bhsd", x, w.reshape(cin, heads, d))
    if "lora_A" in p:
        a = p["lora_A"].astype(dtype)
        r = a.shape[1]
        yb = jnp.einsum(
            "bsr,rhd->bhsd", x @ a, p["lora_B"].astype(dtype).reshape(r, heads, d)
        )
        y = y + yb * jnp.asarray(lora_scaling, dtype)
    if "bias" in p:
        y = y + p["bias"].astype(dtype).reshape(heads, 1, d)
    return y


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, h, S, d] -> [B, S, h*d]"""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _to_out_from_heads(
    p: dict, out_heads: jnp.ndarray, *, lora_scaling: float
) -> jnp.ndarray:
    """to_out applied DIRECTLY to the head-split [B, h, S, d] tensor.

    Equivalent to ``dense(p, _merge_heads(out_heads))`` — the einsum
    contracts (h, d) jointly, which is the merged 320-column contraction in
    the identical h-major/d-minor order, so results are bit-equal — but it
    removes the merge TRANSPOSE from the graph. That transpose is what
    poisoned the 64^2 transformer-block tails in round 4: XLA's layout
    assignment made it a free bitcast by giving the merged [16, 4096, 320]
    activation a spatial-in-lanes {1,2,0} layout, which then propagated
    through the residual adds into ff.net.2 and proj_out, forcing the
    pathological EmitInputBatchInLanes convolution emitter (5 fused block
    tails x 1.57 ms at ~21% MXU, profiled via scripts/profile_bench.py +
    compiled-HLO layout inspection). A multi-dim-contraction dot keeps the
    relayout INSIDE the dot emitter and emits a standard-layout output, so
    nothing downstream inherits the poisoned layout.
    """
    b, h, s, d = out_heads.shape
    dtype = out_heads.dtype
    w = p["kernel"].astype(dtype)
    o = w.shape[1]
    y = jnp.einsum("bhsd,hdo->bso", out_heads, w.reshape(h, d, o))
    if "lora_A" in p:
        a = p["lora_A"].astype(dtype)
        r = a.shape[1]
        ya = jnp.einsum("bhsd,hdr->bsr", out_heads, a.reshape(h, d, r))
        y = y + (ya @ p["lora_B"].astype(dtype)) * jnp.asarray(
            lora_scaling, dtype
        )
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _qkv_project(
    p: dict,
    hidden: jnp.ndarray,
    ctx: jnp.ndarray,
    *,
    self_attn: bool,
    lora_scaling: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """to_q/to_k/to_v as ONE merged matmul when the inputs coincide.

    Self-attention runs q/k/v off the same activations, so the three [C, C]
    kernels concatenate into one [C, 3C] matmul (cross-attention merges k/v
    into [Dc, 2C]). Per-output-column math is unchanged — each column is the
    same contraction over the same K in the same order — so results are
    bit-identical to three separate dense() calls (tests/test_attention.py::
    test_merged_qkv_projection_bit_exact).

    MEASURED A REGRESSION round 4, so OPT-IN via INSTANTRESTORE_MERGED_QKV=1:
    the hypothesis was fewer, wider MXU dispatches (the 64^2-level
    [65536, 320] x [320, 320] projections profile at ~30% MXU from N=K=320
    tile padding; merged N=960 pads to 1024) — but end-to-end serving
    measured 448.3 -> 453.1 ms/batch-16 (35.69 -> 35.3 faces/sec, two runs
    each). The runtime weight concat + lost per-projection fusion outweigh
    the padding win. LoRA'd projections (training) always fall back to
    per-projection dense(): factored deltas keep exact peft semantics and
    gradients flow through the per-projection params.
    """
    names = ("to_q", "to_k", "to_v") if self_attn else ("to_k", "to_v")
    fusable = _MERGED_QKV and all(
        "lora_A" not in p[n2] and "bias" not in p[n2] for n2 in names
    )
    if not fusable:
        q = dense(p["to_q"], hidden, lora_scaling=lora_scaling)
        k_raw = dense(p["to_k"], ctx, lora_scaling=lora_scaling)
        v_raw = dense(p["to_v"], ctx, lora_scaling=lora_scaling)
        return q, k_raw, v_raw
    dtype = hidden.dtype
    widths = [p[n2]["kernel"].shape[1] for n2 in names]
    w = jnp.concatenate(
        [p[n2]["kernel"].astype(dtype) for n2 in names], axis=1
    )
    if self_attn:
        qkv = hidden @ w
        return tuple(
            jnp.split(qkv, [widths[0], widths[0] + widths[1]], axis=-1)
        )
    q = dense(p["to_q"], hidden, lora_scaling=lora_scaling)
    kv = ctx @ w
    k_raw, v_raw = jnp.split(kv, [widths[0]], axis=-1)
    return q, k_raw, v_raw


def adain_stats(v: jnp.ndarray, axis: int, eps: float = 1e-5):
    """Mean and UNBIASED std over ``axis`` (keepdims), fp32 accumulation.

    Matches torch ``.mean(dim=1)`` / ``.std(dim=1)`` in adain()
    (attn_processors.py:7-18): std uses ddof=1 and the reference adds eps to
    the std (not the variance).
    """
    vf = v.astype(jnp.float32)
    mean = vf.mean(axis=axis, keepdims=True)
    var = vf.var(axis=axis, ddof=1, keepdims=True)
    std = jnp.sqrt(var) + eps
    return mean, std


def widen_kv(
    k: jnp.ndarray,
    v: jnp.ndarray,
    ref_k: jnp.ndarray,
    ref_v: jnp.ndarray,
    *,
    use_adain: bool = False,
    train_input: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate per-head reference K/V onto the input K/V.

    k, v:          [B, h, S, d]      (input-image keys/values, head split)
    ref_k, ref_v:  [B, N, h, S, d]   (captured projections per reference,
                                      head-split layout)

    Returns widened (K, V) of shape [B, h, S + N*S, d] (or [B, h, N*S, d]
    when ``train_input`` is False — the shipped configs' refs-only mode,
    attn_processors.py:250-252 + config_files/train_base.yaml train_input).
    Reference order matches the reference code: input block first, then
    references in order.
    """
    b, n, heads, s, d = ref_k.shape
    # [B, N, h, S, d] -> [B, h, N, S, d]
    rk = ref_k.transpose(0, 2, 1, 3, 4)
    rv = ref_v.transpose(0, 2, 1, 3, 4)

    if use_adain:
        # Style statistics come from the INPUT image values over the sequence
        # axis, per (batch, head, channel); content statistics per reference.
        style_mean, style_std = adain_stats(v, axis=2)  # [B, h, 1, d]
        content_mean, content_std = adain_stats(rv, axis=3)  # [B, h, N, 1, d]
        rvf = rv.astype(jnp.float32)
        rvf = (rvf - content_mean) / content_std
        rvf = rvf * style_std[:, :, None] + style_mean[:, :, None]
        rv = rvf.astype(v.dtype)

    rk = rk.reshape(b, heads, n * s, d).astype(k.dtype)
    rv = rv.reshape(b, heads, n * s, d).astype(v.dtype)

    if train_input:
        wide_k = jnp.concatenate([k, rk], axis=2)
        wide_v = jnp.concatenate([v, rv], axis=2)
    else:
        wide_k, wide_v = rk, rv
    return wide_k, wide_v


def segment_softmax_sums(
    q: jnp.ndarray, k_segments: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """Per-query softmax mass of each KV segment WITHOUT materializing the
    [B, h, Sq, K] probabilities: [B, h, Sq, n_seg], rows sum to 1.

    The attention-regularizer losses (entropy histogram, pos/neg reference
    regs — coach.py:599-617,642-680) only consume per-segment reductions of
    the probabilities; materializing full probs for all 9 shared layers is
    what blocks batch>=2 at 512px on a 16 GB chip (ROADMAP 'attention-loss
    memory'). This streams the segments twice with lax.scan (global max pass
    with stopped gradients, then exp-sum pass), so the transient footprint is
    ONE [B, h, Sq, S] logits block instead of nine [B, h, Sq, n_seg*S]
    tensors, and stays differentiable (used by the pos/neg NLL terms) with
    scan-step rematerialization in the backward.

    q: [B, h, Sq, d]; k_segments: [n_seg, B, h, S, d] (stacked widened-KV
    segments in the widen_kv order).
    """

    def logits(k_seg):
        return (
            jnp.einsum(
                "bhqd,bhkd->bhqk", q, k_seg, preferred_element_type=jnp.float32
            )
            * scale
        )

    b, h, sq, _ = q.shape

    def max_step(m, k_seg):
        return jnp.maximum(m, logits(k_seg).max(axis=-1)), None

    m0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
    m, _ = jax.lax.scan(jax.checkpoint(max_step), m0, k_segments)
    m = jax.lax.stop_gradient(m)[..., None]

    def sum_step(carry, k_seg):
        return carry, jnp.exp(logits(k_seg) - m).sum(axis=-1)

    _, sums = jax.lax.scan(
        jax.checkpoint(sum_step), jnp.zeros((), jnp.float32), k_segments
    )  # [n_seg, B, h, Sq]
    sums = jnp.moveaxis(sums, 0, -1)
    return sums / jnp.maximum(sums.sum(axis=-1, keepdims=True), 1e-30)


def attention(
    p: dict,
    hidden: jnp.ndarray,
    *,
    heads: int,
    encoder_hidden: Optional[jnp.ndarray] = None,
    ref_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    use_adain: bool = False,
    train_input: bool = True,
    capture_kv: bool = False,
    save_probs: bool = False,
    save_seg_sums: bool = False,
    lora_scaling: float = 1.0,
    use_fused: bool = False,
    use_faceid: bool = False,
):
    """Multi-head attention with optional shared-image KV widening.

    Args:
      p: param dict with to_q/to_k/to_v (no bias) and to_out (bias), mirroring
         diffusers ``Attention`` (attn_processors.py:61-71,84-87).
      hidden: [B, S, C] token-major hidden states.
      encoder_hidden: context for cross-attention ([B, Sc, Dc]) or None for
         self-attention.
      ref_kv: optional (ref_k, ref_v) [B, N, H, S, d] for shared attention
         (only meaningful for self-attention in up blocks).
      capture_kv: return the head-split K/V projections (frozen-UNet capture
         pass).
      save_probs: additionally return fp32 attention probabilities
         [B, h, Sq, Skv] (training losses / demo attention-mass stats).

    Returns: (out [B, S, C], aux dict with optional 'kv' and 'probs').
    """
    aux = {}
    ctx = hidden if encoder_hidden is None else encoder_hidden

    heads_direct = _heads_proj_on() and not _MERGED_QKV
    if use_faceid and encoder_hidden is not None:
        # FaceIDAttnProcessor (attn_processors.py:100-180): replace the text
        # K/V with projections of ArcFace embeddings — face_projection
        # (512 -> cross_dim) then bias-free to_k/to_v_face_embed.
        ctx = dense(p["face_projection"], ctx)
        if heads_direct:
            q = _dense_to_heads(p["to_q"], hidden, heads, lora_scaling=lora_scaling)
            k = _dense_to_heads(p["to_k_face_embed"], ctx, heads, lora_scaling=1.0)
            v = _dense_to_heads(p["to_v_face_embed"], ctx, heads, lora_scaling=1.0)
        else:
            q = _split_heads(dense(p["to_q"], hidden, lora_scaling=lora_scaling), heads)
            k = _split_heads(dense(p["to_k_face_embed"], ctx), heads)
            v = _split_heads(dense(p["to_v_face_embed"], ctx), heads)
    elif heads_direct:
        q = _dense_to_heads(p["to_q"], hidden, heads, lora_scaling=lora_scaling)
        k = _dense_to_heads(p["to_k"], ctx, heads, lora_scaling=lora_scaling)
        v = _dense_to_heads(p["to_v"], ctx, heads, lora_scaling=lora_scaling)
    else:
        q, k_raw, v_raw = _qkv_project(
            p, hidden, ctx, self_attn=encoder_hidden is None,
            lora_scaling=lora_scaling,
        )
        q = _split_heads(q, heads)
        k = _split_heads(k_raw, heads)
        v = _split_heads(v_raw, heads)

    if capture_kv:
        # Head-split layout [B, H, S, d]: free here (already computed for the
        # attention below) and exactly the tiling the Pallas shared-attention
        # kernel wants ([.., S, d] trailing dims).
        aux["kv"] = (k, v)

    d = q.shape[-1]
    scale = d ** -0.5

    if save_seg_sums and ref_kv is not None:
        # stacked segments in widen_kv order: [input,] ref_1..ref_N — small
        # (K is [*, S, d]); the big logits stay streamed inside
        rk = ref_kv[0]
        segs = ([k] if train_input else []) + [
            rk[:, i] for i in range(rk.shape[1])
        ]
        aux["seg_sums"] = segment_softmax_sums(q, jnp.stack(segs), scale)

    from instantrestore_tpu.ops.shared_attention import IdentityRef

    if isinstance(ref_kv, IdentityRef):
        # Batched-serving identity cache (ops/shared_attention.py): the
        # reference KV stays [I, ...] in HBM; the kernel DMAs each sample's
        # identity blocks via scalar-prefetch indexing — no per-call gather.
        # Refs-only by construction (serving final config).
        assert not train_input and not save_probs and not save_seg_sums
        if use_fused:
            from instantrestore_tpu.ops.shared_attention import (
                shared_attention_identity,
            )

            out = shared_attention_identity(
                q, k, v, ref_kv.cache, ref_kv.ids,
                scale=scale, use_adain=use_adain,
            )
        else:
            # XLA fallback (CPU tests / odd configs): materialize the gather
            from instantrestore_tpu.ops.shared_attention import (
                gather_identity_kv,
            )

            rk, rv = gather_identity_kv(ref_kv.cache, ref_kv.ids)
            wk, wv = widen_kv(k, v, rk, rv, use_adain=use_adain, train_input=False)
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, wk, preferred_element_type=jnp.float32
            ) * scale
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", probs.astype(wv.dtype), wv,
                preferred_element_type=jnp.float32,
            ).astype(hidden.dtype)
        out = _to_out_from_heads(p["to_out"], out, lora_scaling=lora_scaling)
        return out, aux

    if use_fused and not save_probs:
        # flash_vjp wraps the inference kernels in jax.custom_vjp, so this
        # branch is valid inside jax.grad (training) as well
        from instantrestore_tpu.ops import flash_vjp as fused

        if ref_kv is not None:
            # captured K/V arrive in head-split layout [B, N, h, S, d] and
            # are streamed segment-by-segment; AdaIN folds into a
            # per-segment V affine applied on the fly.
            rk, rv = ref_kv
            affine = fused.adain_affine(v, rv) if use_adain else None
            out = fused.shared_flash_attention(
                q, k, v, rk, rv, scale=scale, v_affine=affine,
                include_input=train_input,
            )
        else:
            out = fused.flash_attention(q, k, v, scale=scale)
    else:
        if ref_kv is not None:
            k, v = widen_kv(
                k, v, ref_kv[0], ref_kv[1],
                use_adain=use_adain, train_input=train_input,
            )
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        if save_probs:
            aux["probs"] = probs
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(hidden.dtype)

    out = _to_out_from_heads(p["to_out"], out, lora_scaling=lora_scaling)
    return out, aux
