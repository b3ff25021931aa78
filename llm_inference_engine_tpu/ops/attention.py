"""Blockwise (flash) attention over a static KV cache, GQA-native.

One kernel replaces the reference's entire attention compute chain:

- prefill: q@K^T batched GEMM -> fused scale+mask+softmax -> P@V batched GEMM
  (reference: src/layers/context_attention.cpp:240-272 calling
  src/kernels/scale_and_mask_and_softmax.cu:213-341), including the GQA
  ``repeat_kv`` densification (src/kernels/repeat_kv.cu:51-106) and the
  materialized [bs, max_q, max_k] causal mask
  (src/kernels/build_causal_mask.cu:25-42);
- decode: the fused masked multi-head attention over the cache
  (reference: src/kernels/decoder_self_attention.cu:211-270).

TPU design. Queries are regrouped as [B, K_heads, Sq*G, D] so every MXU tile
serves one KV head and all its G query heads — GQA without materializing
repeated K/V, and decode (Sq=1) is just the G-row case of the same kernel.
The kv axis is the innermost grid dimension with f32 online-softmax state in
VMEM scratch (the reference instead used a per-block shared-memory softmax
with full-row logits, decoder_self_attention.cu:128-165). Per-sequence
``q_start``/``kv_len`` arrive via scalar prefetch and drive (a) the causal /
length mask computed from iota (never materialized in HBM) and (b) compute
skipping for fully-masked kv blocks. Softmax numerics: running max-subtracted
accumulation, exactly online; rows with zero valid keys yield 0, not NaN.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_engine_tpu.utils import cdiv, pallas_interpret, use_pallas

__all__ = ["attention", "attention_xla"]

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# XLA reference implementation
# ---------------------------------------------------------------------------

def attention_xla(q, k_cache, v_cache, q_start, kv_len, *, causal: bool = True,
                  sm_scale: float | None = None, k_scale=None, v_scale=None):
    """Dense-masked attention (golden reference; O(Sq*Skv) memory).

    q:       [B, Sq, H, D]
    k_cache: [B, K, Skv, D], v_cache: same (int8 when k_scale/v_scale given:
             per-token dequant scales [B, K, Skv, 1])
    q_start: [B] int32 absolute position of q[:, 0]
    kv_len:  [B] int32 valid kv length (history + new tokens)
    returns  [B, Sq, H, D]
    """
    B, Sq, H, D = q.shape
    K = k_cache.shape[1]
    G = H // K
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)

    qf = q.astype(jnp.float32).reshape(B, Sq, K, G, D)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    if k_scale is not None:
        kf = kf * k_scale
    if v_scale is not None:
        vf = vf * v_scale

    # logits [B, K, G, Sq, Skv]
    s = jnp.einsum("bikgd,bktd->bkgit", qf, kf) * scale
    Skv = kf.shape[2]
    q_pos = q_start[:, None] + jnp.arange(Sq)[None, :]          # [B, Sq]
    j = jnp.arange(Skv)[None, None, :]                          # [1, 1, Skv]
    valid = j < kv_len[:, None, None]                           # [B, 1, Skv]
    if causal:
        valid = valid & (j <= q_pos[:, :, None])                # [B, Sq, Skv]
    else:
        valid = jnp.broadcast_to(valid, (B, Sq, Skv))
    s = jnp.where(valid[:, None, None, :, :], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(valid[:, None, None, :, :], p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.where(l == 0.0, 1.0, l)
    out = jnp.einsum("bkgit,bktd->bikgd", p, vf)                # [B,Sq,K,G,D]
    return out.reshape(B, Sq, H, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _attn_kernel(qs_ref, kl_ref, q_ref, k_ref, v_ref, o_ref,
                 m_ref, l_ref, acc_ref, *, sm_scale, block_q, block_kv,
                 group, causal, num_kv_blocks):
    _attn_kernel_impl(qs_ref, kl_ref, q_ref, k_ref, v_ref, None, None, o_ref,
                      m_ref, l_ref, acc_ref, sm_scale=sm_scale,
                      block_q=block_q, block_kv=block_kv, group=group,
                      causal=causal, num_kv_blocks=num_kv_blocks)


def _attn_kernel_quant(qs_ref, kl_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                       o_ref, m_ref, l_ref, acc_ref, *, sm_scale, block_q,
                       block_kv, group, causal, num_kv_blocks):
    """INT8-KV variant: per-token scales dequantize K/V blocks in VMEM
    (quantize-on-write lives in ops/kv_cache.py)."""
    _attn_kernel_impl(qs_ref, kl_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                      o_ref, m_ref, l_ref, acc_ref, sm_scale=sm_scale,
                      block_q=block_q, block_kv=block_kv, group=group,
                      causal=causal, num_kv_blocks=num_kv_blocks)


def _attn_kernel_impl(qs_ref, kl_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                      o_ref, m_ref, l_ref, acc_ref, *, sm_scale, block_q,
                      block_kv, group, causal, num_kv_blocks):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ikv = pl.program_id(3)

    @pl.when(ikv == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_start = qs_ref[b]
    kv_len = kl_ref[b]

    # does this kv block intersect the valid region of any row in the q block?
    kv_block_start = ikv * block_kv
    last_q_pos = q_start + ((iq + 1) * block_q - 1) // group
    needed = kv_block_start < kv_len
    if causal:
        needed = jnp.logical_and(needed, kv_block_start <= last_q_pos)

    @pl.when(needed)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)           # [bq, D]
        k = k_ref[0, 0].astype(jnp.float32)           # [bk, D]
        if ks_ref is not None:
            k = k * ks_ref[0, 0]                      # [bk, 1] per-token scale
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [bq, bk]

        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + iq * block_q
        q_pos = q_start + rows // group
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_block_start
        mask = cols < kv_len
        if causal:
            mask = jnp.logical_and(mask, cols <= q_pos)
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_ref[:, :1]                         # [bq, 1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        v = v_ref[0, 0].astype(jnp.float32)           # [bk, D]
        if vs_ref is not None:
            v = v * vs_ref[0, 0]
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [bq, D]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ikv == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_kv", "interpret"))
def _attention_pallas(q, k_cache, v_cache, q_start, kv_len, causal, sm_scale,
                      block_q, block_kv, interpret, k_scale=None,
                      v_scale=None):
    B, Sq, H, D = q.shape
    K, Skv = k_cache.shape[1], k_cache.shape[2]
    G = H // K
    rows = Sq * G

    bq = rows if rows <= block_q else max(8, (block_q // 8) * 8)
    bk = Skv if Skv <= block_kv else max(8, (block_kv // 8) * 8)
    nq = cdiv(rows, bq)
    nkv = cdiv(Skv, bk)

    # [B, Sq, H, D] -> [B, K, Sq*G, D]; row r = i*G + g
    qr = q.reshape(B, Sq, K, G, D).transpose(0, 2, 1, 3, 4).reshape(B, K, rows, D)

    quant = k_scale is not None
    in_specs = [
        pl.BlockSpec((1, 1, bq, D), lambda b, k, i, j, *_: (b, k, i, 0)),
        pl.BlockSpec((1, 1, bk, D), lambda b, k, i, j, *_: (b, k, j, 0)),
        pl.BlockSpec((1, 1, bk, D), lambda b, k, i, j, *_: (b, k, j, 0)),
    ]
    inputs = [q_start, kv_len, qr, k_cache, v_cache]
    if quant:
        s_spec = pl.BlockSpec((1, 1, bk, 1), lambda b, k, i, j, *_: (b, k, j, 0))
        in_specs += [s_spec, s_spec]
        inputs += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, K, nq, nkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, k, i, j, *_: (b, k, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )
    kern = functools.partial(
        _attn_kernel_quant if quant else _attn_kernel,
        sm_scale=sm_scale, block_q=bq, block_kv=bk, group=G,
        causal=causal, num_kv_blocks=nkv)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, rows, D), q.dtype),
        interpret=interpret,
    )(*inputs)

    return out.reshape(B, K, Sq, G, D).transpose(0, 2, 1, 3, 4).reshape(B, Sq, H, D)


def attention(q, k_cache, v_cache, q_start, kv_len, *, causal: bool = True,
              sm_scale: float | None = None, block_q: int = 256,
              block_kv: int = 256, kernels: str = "auto", k_scale=None,
              v_scale=None):
    """Flash attention of q against the (already updated) KV cache.

    See attention_xla for shapes. ``k_cache``/``v_cache`` must already
    contain the current tokens' K/V at positions [q_start, q_start+len) —
    cache write happens first (ops/kv_cache.py), exactly as the reference
    decode kernel writes the new k,v before attending
    (decoder_self_attention.cu:126,172). Pass ``k_scale``/``v_scale``
    ([B, K, Skv, 1] f32) for an INT8-quantized cache.
    """
    if not use_pallas(kernels):
        return attention_xla(q, k_cache, v_cache, q_start, kv_len,
                             causal=causal, sm_scale=sm_scale,
                             k_scale=k_scale, v_scale=v_scale)
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    return _attention_pallas(
        q, k_cache, v_cache,
        q_start.astype(jnp.int32), kv_len.astype(jnp.int32),
        causal, float(scale), block_q, block_kv, pallas_interpret(),
        k_scale=k_scale, v_scale=v_scale)
