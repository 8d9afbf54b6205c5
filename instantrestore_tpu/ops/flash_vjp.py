"""Differentiable wrappers for the Pallas flash-attention kernels.

Round-1 left the fused kernels inference-only (ops/shared_attention.py:22-24):
training fell back to XLA attention, which materializes the full
[B, h, Sq, Skv] probability tensor in HBM — at the 64x64 shared layer with 4
references that is [B, 5, 4096, 20480] fp32 per layer, which caps the train
batch size. This module closes that gap with ``jax.custom_vjp``:

* ``flash_attention`` — plain attention. Primal = the round-1 kernel
  (unchanged inference path). Under differentiation, the forward emits the
  log-sum-exp residual and the backward runs two Pallas kernels (dQ, then
  dK/dV) that recompute probabilities blockwise from (Q, K, LSE) — the
  standard flash backward; probabilities never touch HBM in either pass.

* ``shared_flash_attention`` — wide-KV shared-image attention with the AdaIN
  per-reference V affine. Primal = the segment-streamed KV-outer kernel.
  Under differentiation, the forward widens K/V (concat input + affine-
  modulated reference segments — a [B, h, (1+N)S, d] copy, negligible next to
  the probs it replaces) and reuses the plain flash forward/backward; the
  backward splits the widened gradients back into (dK_in, dV_in, dRefK,
  dRefV, dScale, dShift). Gradients therefore flow through the AdaIN affine
  into both the input values (style stats) and reference values via
  ``adain_affine``'s own jnp autodiff.

Calculus note: the forward pre-scales Q by ``scale * log2(e)`` so logits are
in log2 units (exp lowers to exp2 on the VPU). In the backward the log2
factors cancel exactly: with natural-domain softmax grads
``dS = P * (dP - delta)`` where ``delta = rowsum(dO * O)``, the input grads
are ``dQ = scale * dS @ K`` and ``dK = scale * dS^T @ Q`` regardless of the
exp2 representation, so the backward kernels use the natural-domain formula
on probabilities reconstructed as ``exp2(s2 - LSE2)``.

Residual layout follows the upstream TPU flash convention
(jax/experimental/pallas/ops/tpu/flash_attention.py): per-row scalars are
stored [B, H, Sq, 128] fp32, broadcast across the 128-lane tile.

Reference behavior being matched: training backprop through the widened
attention of /root/reference/face_replace/models/attn_processors.py:183-279
(torch autograd through the materialized softmax).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from instantrestore_tpu.ops import shared_attention as sa
from instantrestore_tpu.ops.shared_attention import (  # re-exported
    LOG2E,
    NEG_INF,
    adain_affine,
)

LANES = 128


def _resolve_blocks(sq: int, skv: int, d: int, block_q, block_k):
    if block_q is None:
        block_q = 1024 if d <= 128 else 512
    if block_k is None:
        block_k = 1024 if d <= 128 else 512
    bq = min(block_q, sq)
    bk = min(block_k, skv)
    assert sq % bq == 0 and skv % bk == 0, (sq, skv, bq, bk)
    return bq, bk


# ---------------------------------------------------------------------------
# forward with LSE residual
# ---------------------------------------------------------------------------


def _fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_scr, l_scr, *, scale):
    """_flash_kernel (shared_attention.py) + an LSE output in log2 units:
    lse2[i] = m[i] + log2(rowsum[i]) with logits s2 = (scale*log2e) q.k, so
    p = exp2(s2 - lse2)."""
    j = pl.program_id(3)
    nj = pl.num_programs(3)
    d = q_ref.shape[-1]
    mxu_sum = acc.shape[-1] > d

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0, 0] * jnp.asarray(scale * LOG2E, q_ref.dtype)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_new)
    if mxu_sum:
        p = jnp.exp2((s - m_new).astype(v.dtype))
        bk = v.shape[0]
        pad = acc.shape[-1] - d - 1
        v_pad = jnp.concatenate(
            [v, jnp.ones((bk, 1), v.dtype), jnp.zeros((bk, pad), v.dtype)], axis=1
        )
        acc[:] = acc[:] * alpha + jax.lax.dot(
            p, v_pad, preferred_element_type=jnp.float32
        )
    else:
        p = jnp.exp2(s - m_new)
        l_prev = l_scr[:, :1]
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc[:] = acc[:] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == nj - 1)
    def _():
        if mxu_sum:
            rowsum = acc[:, d : d + 1]
            o_ref[0, 0] = (acc[:, :d] / rowsum).astype(o_ref.dtype)
        else:
            rowsum = l_scr[:, :1]
            o_ref[0, 0] = (acc[:] / rowsum).astype(o_ref.dtype)
        lse2 = m_scr[:, :1] + jnp.log2(rowsum)
        lse_ref[0, 0] = jnp.broadcast_to(lse2, lse_ref.shape[2:])


def _flash_forward_lse(q, k, v, scale, block_q, block_k, interpret):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq, bk = _resolve_blocks(sq, skv, d, block_q, block_k)
    grid = (b, h, sq // bq, skv // bk)
    return pl.pallas_call(
        functools.partial(_fwd_lse_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, i, j: (b_, h_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, i, j: (b_, h_, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, LANES), lambda b_, h_, i, j: (b_, h_, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128 if d < 128 else d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc, *, scale):
    """grid (B, H, n_q, n_kv): per Q block, stream KV blocks and accumulate
    dQ = scale * sum_j P_j * (dO V_j^T - delta) @ K_j with P recomputed from
    the saved LSE (no HBM probabilities)."""
    j = pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse2 = lse_ref[0, 0][:, :1]      # [BQ, 1] log2-domain
    delta = delta_ref[0, 0][:, :1]   # [BQ, 1] natural-domain rowsum(dO*O)

    qs = q * jnp.asarray(scale * LOG2E, q.dtype)
    s2 = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    p = jnp.exp2(s2 - lse2)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    ds = (p * (dp - delta) * scale).astype(k.dtype)
    acc[:] = acc[:] + jax.lax.dot(ds, k, preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        dq_ref[0, 0] = acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, acck, accv, *, scale
):
    """grid (B, H, n_kv, n_q): per KV block, stream Q blocks and accumulate
    dV = P^T dO and dK = scale * (P * (dP - delta))^T Q, all transposed so the
    KV-block axis stays the sublane axis."""
    i = pl.program_id(3)
    ni = pl.num_programs(3)

    @pl.when(i == 0)
    def _():
        acck[:] = jnp.zeros_like(acck)
        accv[:] = jnp.zeros_like(accv)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse2_row = lse_ref[0, 0][:, :1].reshape(1, -1)   # [1, BQ]
    delta_row = delta_ref[0, 0][:, :1].reshape(1, -1)

    qs = q * jnp.asarray(scale * LOG2E, q.dtype)
    s2t = jax.lax.dot_general(
        k, qs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, BQ]
    pt = jnp.exp2(s2t - lse2_row)
    accv[:] = accv[:] + jax.lax.dot(
        pt.astype(do.dtype), do, preferred_element_type=jnp.float32
    )
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, BQ]
    dst = (pt * (dpt - delta_row) * scale).astype(q.dtype)
    acck[:] = acck[:] + jax.lax.dot(dst, q, preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _():
        dk_ref[0, 0] = acck[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = accv[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, lse, do, scale, block_q, block_k, interpret):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq, bk = _resolve_blocks(sq, skv, d, block_q, block_k)
    # delta_i = rowsum(dO * O): cheap elementwise+reduce, XLA fuses it; stored
    # lane-broadcast like the LSE
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (b, h, sq, LANES))

    q_spec = pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0), memory_space=pltpu.VMEM)
    kv_spec_q = pl.BlockSpec((1, 1, bk, d), lambda b_, h_, i, j: (b_, h_, j, 0), memory_space=pltpu.VMEM)
    row_spec_q = pl.BlockSpec((1, 1, bq, LANES), lambda b_, h_, i, j: (b_, h_, i, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(b, h, sq // bq, skv // bk),
        in_specs=[q_spec, kv_spec_q, kv_spec_q, q_spec, row_spec_q, row_spec_q],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    # dK/dV grid swaps the roles: KV blocks are the outer (revisited) axis
    q_spec_k = pl.BlockSpec((1, 1, bq, d), lambda b_, h_, j, i: (b_, h_, i, 0), memory_space=pltpu.VMEM)
    kv_spec_k = pl.BlockSpec((1, 1, bk, d), lambda b_, h_, j, i: (b_, h_, j, 0), memory_space=pltpu.VMEM)
    row_spec_k = pl.BlockSpec((1, 1, bq, LANES), lambda b_, h_, j, i: (b_, h_, i, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(b, h, skv // bk, sq // bq),
        in_specs=[q_spec_k, kv_spec_k, kv_spec_k, q_spec_k, row_spec_k, row_spec_k],
        out_specs=[kv_spec_k, kv_spec_k],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# plain flash attention, differentiable
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, interpret):
    return sa.flash_attention(
        q, k, v, scale=scale, block_q=block_q, block_k=block_k, interpret=interpret
    )


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    o, lse = _flash_forward_lse(q, k, v, scale, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    return _flash_backward(q, k, v, o, lse, do, scale, block_q, block_k, interpret)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Differentiable drop-in for shared_attention.flash_attention."""
    _, _, sq, d = q.shape
    skv = k.shape[2]
    bq, bk = _resolve_blocks(sq, skv, d, block_q, block_k)
    if interpret is None:
        interpret = sa._interpret_default()
    return _flash(q, k, v, float(scale), bq, bk, bool(interpret))


# ---------------------------------------------------------------------------
# shared-image attention, differentiable
# ---------------------------------------------------------------------------


def _widen(k_in, v_in, ref_k, ref_v, vs, vh, include_input):
    """[B,N,h,S,d] refs -> wide [B,h,(1+N)S,d] with the AdaIN affine applied,
    matching the segment order of the streaming kernels (input first) and the
    XLA widen_kv numerics (fp32 affine, cast back to the compute dtype)."""
    b, n, h, s, d = ref_k.shape
    rk = ref_k.transpose(0, 2, 1, 3, 4).reshape(b, h, n * s, d)
    rv = ref_v.transpose(0, 2, 1, 3, 4).astype(jnp.float32)
    rv = rv * vs[:, :, :, None, :] + vh[:, :, :, None, :]
    rv = rv.reshape(b, h, n * s, d).astype(v_in.dtype)
    rk = rk.astype(k_in.dtype)
    if include_input:
        return (
            jnp.concatenate([k_in, rk], axis=2),
            jnp.concatenate([v_in, rv], axis=2),
        )
    return rk, rv


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _shared(q, k_in, v_in, ref_k, ref_v, vs, vh, scale, include_input, block_q, block_k, interpret):
    return sa.shared_flash_attention(
        q, k_in, v_in, ref_k, ref_v,
        scale=scale, v_affine=(vs, vh), include_input=include_input,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )


def _shared_fwd(q, k_in, v_in, ref_k, ref_v, vs, vh, scale, include_input, block_q, block_k, interpret):
    wide_k, wide_v = _widen(k_in, v_in, ref_k, ref_v, vs, vh, include_input)
    sq, d = q.shape[2], q.shape[3]
    # block on the per-segment length so bk divides the widened KV too,
    # honoring the caller's tuned sizes
    bq, bk = _resolve_blocks(sq, ref_k.shape[3], d, block_q, block_k)
    o, lse = _flash_forward_lse(q, wide_k, wide_v, scale, bq, bk, interpret)
    return o, (q, k_in, v_in, ref_k, ref_v, vs, vh, o, lse)


def _shared_bwd(scale, include_input, block_q, block_k, interpret, res, do):
    q, k_in, v_in, ref_k, ref_v, vs, vh, o, lse = res
    b, n, h, s, d = ref_k.shape
    wide_k, wide_v = _widen(k_in, v_in, ref_k, ref_v, vs, vh, include_input)
    sq = q.shape[2]
    bq, bk = _resolve_blocks(sq, s, d, block_q, block_k)
    dq, dkw, dvw = _flash_backward(q, wide_k, wide_v, o, lse, do, scale, bq, bk, interpret)

    if include_input:
        dk_in = dkw[:, :, :s]
        dv_in = dvw[:, :, :s]
        dkr = dkw[:, :, s:]
        dvr_eff = dvw[:, :, s:]
    else:
        dk_in = jnp.zeros_like(k_in)
        dv_in = jnp.zeros_like(v_in)
        dkr = dkw
        dvr_eff = dvw

    dkr = dkr.reshape(b, h, n, s, d).transpose(0, 2, 1, 3, 4).astype(ref_k.dtype)
    dvr_eff = dvr_eff.reshape(b, h, n, s, d).astype(jnp.float32)  # [B,h,N,S,d]
    # v_eff = ref_v * vs + vh  (per b,h,n,d; broadcast over S)
    dref_v = (dvr_eff * vs[:, :, :, None, :]).transpose(0, 2, 1, 3, 4).astype(ref_v.dtype)
    rv_t = ref_v.transpose(0, 2, 1, 3, 4).astype(jnp.float32)
    dvs = jnp.sum(dvr_eff * rv_t, axis=3).astype(vs.dtype)
    dvh = jnp.sum(dvr_eff, axis=3).astype(vh.dtype)
    return dq, dk_in, dv_in, dkr, dref_v, dvs, dvh


_shared.defvjp(_shared_fwd, _shared_bwd)


def shared_flash_attention(
    q: jnp.ndarray,
    k_in: jnp.ndarray,
    v_in: jnp.ndarray,
    ref_k: jnp.ndarray,
    ref_v: jnp.ndarray,
    *,
    scale: float,
    v_affine: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    include_input: bool = True,
    block_q: int = 1024,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Differentiable drop-in for shared_attention.shared_flash_attention.

    Not differentiated: identical to the primal (segment-streamed KV-outer
    kernel). Differentiated: widened flash forward + Pallas flash backward.
    """
    b, h, _, d = q.shape
    n = ref_k.shape[1]
    if v_affine is None:
        vs = jnp.ones((b, h, n, d), jnp.float32)
        vh = jnp.zeros((b, h, n, d), jnp.float32)
    else:
        vs, vh = (a.astype(jnp.float32) for a in v_affine)
    if interpret is None:
        interpret = sa._interpret_default()
    return _shared(
        q, k_in, v_in, ref_k, ref_v, vs, vh,
        float(scale), bool(include_input), int(block_q), int(block_k), bool(interpret),
    )
