"""Blockwise (flash) attention over a static KV cache, GQA-native.

One kernel replaces the reference's entire attention compute chain:

- prefill: q@K^T batched GEMM -> fused scale+mask+softmax -> P@V batched GEMM
  (reference: src/layers/context_attention.cpp:240-272 calling
  src/kernels/scale_and_mask_and_softmax.cu:213-341), including the GQA
  ``repeat_kv`` densification (src/kernels/repeat_kv.cu:51-106) and the
  materialized [bs, max_q, max_k] causal mask
  (src/kernels/build_causal_mask.cu:25-42);
- decode: the fused masked multi-head attention over the cache
  (reference: src/kernels/decoder_self_attention.cu:211-270) — the Sq=1
  case of the same kernel.

TPU design, shaped by three hardware facts learned the hard way (see
benchmarks/bench_ops.py):

1. **Token-major cache layout [L, B, S, K, D]** (NOT head-major [.., K, S,
   D]): the token axis S sits outside the last-two tiled dims, so the
   per-token cache write can DMA to an arbitrary sequence position (Mosaic
   refuses dynamic sublane-unaligned indices into tiled dims), and one
   sequence's KV stream is fully contiguous in HBM.
2. **One grid step serves ALL kv heads**: blocks are [bk, K, D] and the
   q@K/P@V products run as K-batched dots. A per-(batch, head) grid at
   decode (Sq=1) pays thousands of tiny grid steps per layer — grid
   overhead alone exceeded the HBM roofline several times over.
3. **The stacked [L, ...] cache is read in place**: the layer index arrives
   via scalar prefetch and steers the BlockSpec index_map; slicing
   ``cache[l]`` in XLA would materialize a 134 MB copy per layer. A static
   ``kv_hi`` watermark bounds the grid: pl.when skips compute but NOT the
   automatic block DMA, so without it every decode step streams the whole
   multi-GB cache.

Per-sequence ``q_start``/``kv_len`` arrive via scalar prefetch and drive the
causal/length mask computed from iota (never materialized in HBM) plus
compute-skipping for fully-masked kv blocks. Softmax numerics: running
max-subtracted accumulation, exactly online; rows with zero valid keys
yield 0, not NaN (the reference's softmax would NaN on an empty row).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_engine_tpu.utils import (cdiv, pallas_interpret, round_up,
                                            use_pallas)
from llm_inference_engine_tpu.ops.kv_cache import (EMBED_PAD,
                                                   decode_embedded_scales)

__all__ = ["attention", "attention_xla"]

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# XLA reference implementation
# ---------------------------------------------------------------------------

def attention_xla(q, k_cache, v_cache, q_start, kv_len, *, causal: bool = True,
                  sm_scale: float | None = None, k_scale=None, v_scale=None,
                  layer=None, embedded_kv: bool = False,
                  window: int | None = None):
    """Dense-masked attention (golden reference; O(Sq*Skv) memory).

    q:       [B, Sq, H, D]
    k_cache: [B, Skv, K, D], v_cache: same (int8 when k_scale/v_scale given:
             per-token dequant scales [B, Skv, K]); with ``layer`` given,
             a stacked [L, B, Skv, K, D] cache indexed at that layer
    q_start: [B] int32 absolute position of q[:, 0]
    kv_len:  [B] int32 valid kv length (history + new tokens)
    returns  [B, Sq, H, D]
    """
    if layer is not None:
        k_cache = jax.lax.dynamic_index_in_dim(k_cache, layer, 0,
                                               keepdims=False)
        v_cache = jax.lax.dynamic_index_in_dim(v_cache, layer, 0,
                                               keepdims=False)
        if k_scale is not None:
            k_scale = jax.lax.dynamic_index_in_dim(k_scale, layer, 0,
                                                   keepdims=False)
            v_scale = jax.lax.dynamic_index_in_dim(v_scale, layer, 0,
                                                   keepdims=False)
    B, Sq, H, D = q.shape
    if embedded_kv:
        K = k_cache.shape[2] - EMBED_PAD
        ks = decode_embedded_scales(k_cache[:, :, K, :], K)   # [B, Skv, K]
        vs = decode_embedded_scales(v_cache[:, :, K, :], K)
        k_cache = k_cache[:, :, :K, :]
        v_cache = v_cache[:, :, :K, :]
        k_scale, v_scale = ks, vs
    Skv, K = k_cache.shape[1], k_cache.shape[2]
    G = H // K
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)

    qf = q.astype(jnp.float32).reshape(B, Sq, K, G, D)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    if k_scale is not None:
        kf = kf * k_scale[..., None]
    if v_scale is not None:
        vf = vf * v_scale[..., None]

    # logits [B, K, G, Sq, Skv]
    s = jnp.einsum("bikgd,btkd->bkgit", qf, kf) * scale
    q_pos = q_start[:, None] + jnp.arange(Sq)[None, :]          # [B, Sq]
    j = jnp.arange(Skv)[None, None, :]                          # [1, 1, Skv]
    valid = j < kv_len[:, None, None]                           # [B, 1, Skv]
    if causal:
        valid = valid & (j <= q_pos[:, :, None])                # [B, Sq, Skv]
        if window is not None:
            # sliding window: key j visible to query p iff p-W < j <= p
            valid = valid & (j > q_pos[:, :, None] - window)
    else:
        valid = jnp.broadcast_to(valid, (B, Sq, Skv))
    s = jnp.where(valid[:, None, None, :, :], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(valid[:, None, None, :, :], p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.where(l == 0.0, 1.0, l)
    out = jnp.einsum("bkgit,btkd->bikgd", p, vf)                # [B,Sq,K,G,D]
    return out.reshape(B, Sq, H, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel (unified prefill/decode, all kv heads per grid step)
# ---------------------------------------------------------------------------

def _attn_kernel(qs_ref, kl_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                 o_ref, m_ref, l_ref, acc_ref, *, sm_scale, block_q,
                 block_kv, group, causal, num_kv_blocks, kv_lead,
                 embedded=False, window=None):
    """One (batch, q-block, kv-block) step over all K kv heads.

    q block:   [K, bq, D] (bq query rows per head; row r = i*G + g)
    k/v block: [bk, K, D] (token-major)
    scales:    [bk, K] per-token int8-KV dequant scales
    scratch:   m/l [K, bq] f32, acc [K, bq, D] f32
    """
    b = pl.program_id(0)
    iq = pl.program_id(1)
    ikv = pl.program_id(2)
    kv0 = (0,) * kv_lead

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
    if window is not None:
        # skip kv blocks entirely below every q row's window
        first_q_pos = q_start + (iq * block_q) // group
        needed = jnp.logical_and(
            needed, kv_block_start + block_kv > first_q_pos - window + 1)

    # Sq == 1 MHA decode (one q row per kv head): pure-VPU matvec path.
    # (GQA decode, group > 1, takes the MXU path below — its G-row blocks
    # amortize the transpose G times better.)
    decode = block_q == group and group == 1

    @pl.when(needed)
    def _compute():
        k = k_ref[kv0]                                # [bk, K(+pad), D]
        v = v_ref[kv0]
        # INT8-KV dequantization: the per-(token, head) scales are NOT
        # applied to the k/v elements (bk*K*D multiplies — measured as the
        # dominant VPU cost of the quantized-cache decode). Because the
        # scale is constant along D it factors out of both dots: it lands
        # on the scores (k side) and on the softmax weights (v side) —
        # bk*K multiplies each, 1/D the work. k/v only pay the int8 cast.
        if embedded:
            # int8 values + in-row log2 scale codes (kv_cache.py)
            Kr = k.shape[1] - EMBED_PAD
            ks_arr = decode_embedded_scales(k[:, Kr, :], Kr)   # [bk, K]
            vs_arr = decode_embedded_scales(v[:, Kr, :], Kr)
            k = k[:, :Kr]
            v = v[:, :Kr]
        elif ks_ref is not None:
            ks_arr = ks_ref[kv0]                      # [bk, K]
            vs_arr = vs_ref[kv0]
        else:
            ks_arr = vs_arr = None

        if decode:
            # Decode is a matvec: one q row per kv head against the kv
            # stream. Runs entirely on the VPU in the kv block's native
            # [bk, K, D] layout — lane reduction over D, sublane reduction
            # over bk. The MXU/transpose path below paid an ~800 µs/call
            # relayout (swapaxes of every block) for M=1 matmuls.
            q = q_ref[0].reshape(-1, q_ref.shape[-1]).astype(jnp.float32)
            kf = k.astype(jnp.float32)                # [bk, K, D]
            vf = v.astype(jnp.float32)
            cols1 = (jax.lax.broadcasted_iota(jnp.int32, (block_kv, 1), 0)
                     + kv_block_start)                # [bk, 1]
            mask1 = cols1 < kv_len                    # decode: causal implied
            if window is not None:                    # q_pos == kv_len - 1
                mask1 = jnp.logical_and(mask1, cols1 > kv_len - 1 - window)
            m_prev = m_ref[:]                         # [K, 1]
            l_prev = l_ref[:]
            s = jnp.sum(kf * q[None, :, :], axis=2) * sm_scale
            if ks_arr is not None:
                s = s * ks_arr                        # k dequant on scores
            s = jnp.where(mask1, s, _NEG_INF)                 # [bk, K]
            m_curr = jnp.max(s, axis=0)[:, None]              # [K, 1]
            m_new = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_new)                   # [K, 1]
            p = jnp.exp(s - m_new.reshape(-1)[None, :])
            p = jnp.where(mask1, p, 0.0)                      # [bk, K]
            l_ref[:] = alpha * l_prev + jnp.sum(p, axis=0)[:, None]
            if vs_arr is not None:
                p = p * vs_arr                        # v dequant on weights
            pv = jnp.sum(vf * p[:, :, None], axis=0)          # [K, D]
            acc_ref[:] = acc_ref[:] * alpha[:, :, None] + pv[:, None, :]
            m_ref[:] = m_new
            return

        # Prefill: MXU path. Dots run on the storage dtype (bf16 MXU
        # passes, f32 accumulate; int8 kv casts to bf16 — values <= 127
        # are exact); the transpose amortizes over bq rows.
        q = q_ref[0]                                  # [K, bq, D]
        k = jnp.swapaxes(k.astype(q.dtype), 0, 1)     # [K, bk, D] (Mosaic
        # requires batch dims at equal operand positions)
        # K-batched q·kᵀ: [K, bq, bk]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm_scale
        if ks_arr is not None:                        # [bk, K] -> [K, 1, bk]
            s = s * jnp.swapaxes(ks_arr, 0, 1)[:, None, :]

        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + iq * block_q
        q_pos = q_start + rows // group
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + kv_block_start
        mask = cols < kv_len
        if causal:
            mask = jnp.logical_and(mask, cols <= q_pos)
        if window is not None:
            mask = jnp.logical_and(mask, cols > q_pos - window)
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_ref[:]                             # [K, bq]
        l_prev = l_ref[:]
        m_curr = jnp.max(s, axis=2)
        m_new = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :, None])
        p = jnp.where(mask, p, 0.0)
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=2)
        if vs_arr is not None:
            p = p * jnp.swapaxes(vs_arr, 0, 1)[:, None, :]

        v = jnp.swapaxes(v.astype(q.dtype), 0, 1)     # [K, bk, D]
        pv = jax.lax.dot_general(
            p.astype(q.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [K, bq, D]
        acc_ref[:] = acc_ref[:] * alpha[:, :, None] + pv
        m_ref[:] = m_new

    @pl.when(ikv == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe[:, :, None]).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# MXU block-diagonal decode attention.
#
# Decode (Sq == 1) against the token-major cache used to run as a VPU
# matvec: cast every cached k/v element, multiply by q, lane/sublane
# reduce. The VPU touches the whole kv stream, so its op count is the
# same for int8 and bf16 caches — which made the int8 cache SLOWER than
# bf16 (DMA halves, VPU binds). This kernel instead feeds the kv stream
# to the MXU in its native layout:
#
#   - a [bk, K, D] kv block is viewed as [bk, K*D] (free reshape — the
#     trailing dims are contiguous);
#   - q is expanded once per sequence into a block-diagonal [K*D, H]
#     matrix (qd[k*D+d, h] = q[h, d] iff h//G == k), so scores are ONE
#     dot: s[bk, H] = kv2 @ qd. int8 blocks feed the MXU natively (the
#     same no-VPU-touch rule as the int4 weight kernel, ops/quant.py);
#   - softmax weights accumulate v as pv[H, K*D] = p^T @ v2; the
#     per-head diagonal block is extracted once at finalize.
#
# The off-diagonal MXU work is K× the useful FLOPs, but decode attention
# is bandwidth-bound — MXU cycles are free next to the DMA. Measured at
# 7B decode shapes (benchmarks/bench_decode_attn.py): VPU bf16 537 GB/s
# -> MXU bf16 734 GB/s; int8 cache 2.2x faster than the VPU bf16 path.
# INT8 scales never touch the kv stream either: k-scales fold into the
# scores, v-scales into the softmax weights (1/D the elements).
# Handles GQA natively (any G) — one kernel for every decode config.
# ---------------------------------------------------------------------------

def _kv_compute_dtype(storage_dtype):
    """Dtype the MXU decode dots run in for a given kv storage dtype: an
    int8 cache feeds the MXU natively against bf16 operands; float caches
    dot in their own dtype (a hard-coded bf16 qd against an f32 cache is a
    Mosaic-illegal mixed matmul — caught on hardware, invisible to the
    interpret-mode tests)."""
    return jnp.bfloat16 if storage_dtype == jnp.int8 else storage_dtype


def _block_diag_q(q, Kst: int, group: int, dtype):
    """q [H, D] -> block-diagonal [Kst*D, H]: qd[k*D+d, h] = q[h, d] iff
    h // G == k. Rows for embedded-scale pad heads (k >= H//G) stay zero,
    so the pad rows' payload (scale codes / garbage) never reaches the
    scores."""
    H, D = q.shape
    qkdh = jnp.broadcast_to(jnp.swapaxes(q, 0, 1)[None, :, :],
                            (Kst, D, H))                 # q[h, d] at (k, d, h)
    kk = jax.lax.broadcasted_iota(jnp.int32, (Kst, D, H), 0)
    hh = jax.lax.broadcasted_iota(jnp.int32, (Kst, D, H), 2)
    return jnp.where(hh // group == kk, qkdh, 0).reshape(
        Kst * D, H).astype(dtype)


def _expand_group_scales(sc, K: int, group: int):
    """Per-kv-head scales [bk, K] -> per-query-head [bk, K*G]. A lane-dim
    group expansion via broadcast+reshape (merging the K and G lanes) is
    an unsupported Mosaic relayout — use a one-hot matmul instead (tiny
    [bk, K] @ [K, H] dot)."""
    if group == 1:
        return sc
    H = K * group
    ek = jax.lax.broadcasted_iota(jnp.int32, (K, H), 0)
    eh = jax.lax.broadcasted_iota(jnp.int32, (K, H), 1)
    one_hot = (eh // group == ek).astype(jnp.float32)
    return jax.lax.dot_general(sc, one_hot, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _diag_extract(acc, Kst: int, group: int, D: int):
    """acc [H, Kst*D] -> [H, D]: out[h, d] = acc[h, (h//G)*D + d]."""
    H = acc.shape[0]
    a3 = acc.reshape(H, Kst, D)
    hh = jax.lax.broadcasted_iota(jnp.int32, (H, Kst, D), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (H, Kst, D), 1)
    return jnp.sum(jnp.where(hh // group == kk, a3, 0.0), axis=1)


def _decode_mxu_kernel(qs_ref, kl_ref, ly_ref, q_ref, k_ref, v_ref, ks_ref,
                       vs_ref, o_ref, qd_ref, m_ref, l_ref, acc_ref, *,
                       sm_scale, block_kv, num_kv_blocks, K, group,
                       embedded, window=None):
    b = pl.program_id(0)
    ikv = pl.program_id(1)
    kv_len = kl_ref[b]
    Kst = k_ref.shape[-2]            # K (+EMBED_PAD when embedded)
    KDst = Kst * k_ref.shape[-1]
    D = k_ref.shape[-1]

    @pl.when(ikv == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        qd_ref[:] = _block_diag_q(q_ref[0], Kst, group, qd_ref.dtype)

    start = ikv * block_kv
    needed = start < kv_len
    if window is not None:       # decode q_pos == kv_len - 1: skip blocks
        needed = jnp.logical_and(  # entirely below the window
            needed, start + block_kv > kv_len - window)

    @pl.when(needed)
    def _compute():
        kblk = k_ref[0, 0] if k_ref.ndim == 5 else k_ref[0]   # [bk, Kst, D]
        vblk = v_ref[0, 0] if v_ref.ndim == 5 else v_ref[0]
        k2 = kblk.reshape(block_kv, KDst)        # storage dtype, no VPU touch
        v2 = vblk.reshape(block_kv, KDst)
        s = jax.lax.dot_general(
            k2, qd_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale    # [bk, H]

        if embedded:
            ks1 = decode_embedded_scales(kblk[:, K, :], K)    # [bk, K]
            vs1 = decode_embedded_scales(vblk[:, K, :], K)
        elif ks_ref is not None:
            ks1 = ks_ref[(0,) * (ks_ref.ndim - 2)]            # [bk, K]
            vs1 = vs_ref[(0,) * (vs_ref.ndim - 2)]
        else:
            ks1 = vs1 = None

        if ks1 is not None:
            s = s * _expand_group_scales(ks1, K, group)  # k dequant on scores
        cols = (jax.lax.broadcasted_iota(jnp.int32, (block_kv, 1), 0) + start)
        mask = cols < kv_len
        if window is not None:
            mask = jnp.logical_and(mask, cols > kv_len - 1 - window)
        s = jnp.where(mask, s, _NEG_INF)
        m_prev, l_prev = m_ref[:], l_ref[:]      # [H, 1]
        m_curr = jnp.max(s, axis=0)[:, None]
        m_new = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new.reshape(-1)[None, :])
        p = jnp.where(mask, p, 0.0)              # [bk, H]
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=0)[:, None]
        if vs1 is not None:
            p = p * _expand_group_scales(vs1, K, group)  # v dequant on weights
        pv = jax.lax.dot_general(
            p.astype(qd_ref.dtype), v2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [H, KDst]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(ikv == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)
        out = _diag_extract(acc_ref[:] / l, Kst, group, D)    # [H, D]
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_kv", "interpret", "kv_hi",
                     "embedded", "window"))
def _attention_decode_mxu(q, k_cache, v_cache, q_start, kv_len, sm_scale,
                          block_kv, interpret, k_scale=None, v_scale=None,
                          layer=None, kv_hi=None, embedded=False,
                          window=None, table=None):
    """q: [B, 1, H, D]; caches [(L,) B, S, Kst, D] — or, with ``table``
    [B, max_pages] given, a paged pool [L, P, page, Kst, D] whose logical
    kv block j lives at page table[b, j*bk // page] (ops/paged_kv.py).
    Attend-only (the cache must already hold the current token). Returns
    [B, 1, H, D]."""
    B, _, H, D = q.shape
    paged = table is not None
    layered = layer is not None
    if paged:
        page = k_cache.shape[2]
        Skv = table.shape[1] * page
    else:
        Skv = k_cache.shape[2] if layered else k_cache.shape[1]
    Kst = k_cache.shape[-2]
    K = Kst - EMBED_PAD if embedded else Kst
    G = H // K

    if kv_hi is not None:
        Skv = min(Skv, max(block_kv, round_up(kv_hi, block_kv)))
    bk = Skv if Skv <= block_kv else max(8, (block_kv // 8) * 8)
    if paged:
        bk = min(bk, page)
        if page % bk:
            bk = page
        ppb = page // bk
    nkv = cdiv(Skv, bk)
    qr = q.reshape(B, H, D)

    prefetch = [q_start.astype(jnp.int32), kv_len.astype(jnp.int32)]

    def clamp_j(j, kl_ref, b):
        last = jnp.maximum((kl_ref[b] + bk - 1) // bk - 1, 0)
        j = jnp.minimum(j, last)
        if window is not None:
            # also clamp UP to the first in-window block: consecutive
            # identical indices skip the DMA, so history below the sliding
            # window is never streamed from HBM
            lo = jnp.maximum((kl_ref[b] - window) // bk, 0)
            j = jnp.maximum(j, jnp.minimum(lo, last))
        return j

    if paged:
        prefetch.append(jnp.asarray(layer, jnp.int32).reshape(1))
        prefetch.append(table.astype(jnp.int32))
        np_ = 4

        def kv_ix(b, j, qs, kl, ly, tb):
            jj = clamp_j(j, kl, b)
            return (ly[0], tb[b, (jj * bk) // page], jj % ppb, 0, 0)
        sc_ix = None
        kv_blk = (1, 1, bk, Kst, D)
        sc_blk = None
        q_ix = lambda b, j, qs, kl, ly, tb: (b, 0, 0)
    elif layered:
        prefetch.append(jnp.asarray(layer, jnp.int32).reshape(1))
        np_ = 3
        kv_ix = lambda b, j, qs, kl, ly: (ly[0], b, clamp_j(j, kl, b), 0, 0)
        sc_ix = lambda b, j, qs, kl, ly: (ly[0], b, clamp_j(j, kl, b), 0)
        kv_blk = (1, 1, bk, Kst, D)
        sc_blk = (1, 1, bk, K)
        q_ix = lambda b, j, qs, kl, ly: (b, 0, 0)
    else:
        np_ = 2
        kv_ix = lambda b, j, qs, kl: (b, clamp_j(j, kl, b), 0, 0)
        sc_ix = lambda b, j, qs, kl: (b, clamp_j(j, kl, b), 0)
        kv_blk = (1, bk, Kst, D)
        sc_blk = (1, bk, K)
        q_ix = lambda b, j, qs, kl: (b, 0, 0)

    in_specs = [
        pl.BlockSpec((1, H, D), q_ix),
        pl.BlockSpec(kv_blk, kv_ix),
        pl.BlockSpec(kv_blk, kv_ix),
    ]
    inputs = prefetch + [qr, k_cache, v_cache]
    quant = k_scale is not None
    if quant:
        in_specs += [pl.BlockSpec(sc_blk, sc_ix), pl.BlockSpec(sc_blk, sc_ix)]
        inputs += [k_scale, v_scale]

    KDst = Kst * D
    kern_base = functools.partial(
        _decode_mxu_kernel, sm_scale=sm_scale, block_kv=bk,
        num_kv_blocks=nkv, K=K, group=G, embedded=embedded, window=window)
    if paged:
        kern = (lambda qs, kl, ly, tb, qq, k, v, o, qd, m, l, acc:
                kern_base(qs, kl, ly, qq, k, v, None, None, o, qd, m, l,
                          acc))
    elif quant:
        kern = (lambda qs, kl, ly, qq, k, v, ks, vs, o, qd, m, l, acc:
                kern_base(qs, kl, ly, qq, k, v, ks, vs, o, qd, m, l, acc)) \
            if layered else \
               (lambda qs, kl, qq, k, v, ks, vs, o, qd, m, l, acc:
                kern_base(qs, kl, None, qq, k, v, ks, vs, o, qd, m, l, acc))
    else:
        kern = (lambda qs, kl, ly, qq, k, v, o, qd, m, l, acc:
                kern_base(qs, kl, ly, qq, k, v, None, None, o, qd, m, l, acc)) \
            if layered else \
               (lambda qs, kl, qq, k, v, o, qd, m, l, acc:
                kern_base(qs, kl, None, qq, k, v, None, None, o, qd, m, l,
                          acc))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=np_,
        grid=(B, nkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, D), q_ix),
        scratch_shapes=[
            pltpu.VMEM((KDst, H), _kv_compute_dtype(k_cache.dtype)),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, KDst), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        interpret=interpret,
    )(*inputs)
    return out.reshape(B, 1, H, D)


def can_decode_mxu(q_shape, Kst: int, D: int) -> bool:
    """MXU decode path shape gate: one token, q head_dim matching the
    cache, tile-aligned head dims (the padded cache guarantees alignment
    for production models)."""
    B, T, H, qD = q_shape
    return (T == 1 and qD == D and D % 128 == 0 and H % 8 == 0
            and Kst % 8 == 0)


def _decode_fused_mxu_kernel(qs_ref, kl_ref, ly_ref, q_ref, knew_ref,
                             vnew_ref, k_ref, v_ref, o_ref, kout_ref,
                             vout_ref, qd_ref, m_ref, l_ref, acc_ref, sem, *,
                             sm_scale, block_kv, num_kv_blocks, K, group,
                             embedded, window=None):
    """MXU block-diagonal decode + in-kernel cache write (aliased DMA).

    Same compute as _decode_mxu_kernel over the history blocks; the new
    token's K/V arrive in storage form (bf16, or int8 rows with embedded
    scale codes already packed by quantize_kv_embedded), are DMA'd into
    the cache for FUTURE steps, and are attended straight from VMEM —
    the cache-side mask covers history only, so the write/read order
    never matters within the step."""
    b = pl.program_id(0)
    ikv = pl.program_id(1)
    ly = ly_ref[0]
    hist = qs_ref[b]                  # history length; new token at `hist`
    kv_len = kl_ref[b]
    active = kv_len > hist
    H = K * group
    Kst = knew_ref.shape[-2]
    D = knew_ref.shape[-1]
    KDst = Kst * D

    @pl.when(ikv == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        qd_ref[:] = _block_diag_q(q_ref[0], Kst, group, qd_ref.dtype)

    @pl.when(jnp.logical_and(ikv == 0, active))
    def _start_write():
        pltpu.make_async_copy(
            knew_ref.at[0], kout_ref.at[ly, b, pl.ds(hist, 1), :, :],
            sem.at[0]).start()
        pltpu.make_async_copy(
            vnew_ref.at[0], vout_ref.at[ly, b, pl.ds(hist, 1), :, :],
            sem.at[1]).start()

    start = ikv * block_kv
    hist_lim = jnp.minimum(hist, kv_len)
    needed = start < hist_lim
    if window is not None:       # q_pos == kv_len - 1
        needed = jnp.logical_and(needed, start + block_kv > kv_len - window)

    @pl.when(needed)
    def _compute():
        k2 = k_ref[0, 0].reshape(block_kv, KDst)
        v2 = v_ref[0, 0].reshape(block_kv, KDst)
        s = jax.lax.dot_general(
            k2, qd_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale    # [bk, H]
        if embedded:
            ks1 = _expand_group_scales(
                decode_embedded_scales(k_ref[0, 0][:, K, :], K), K, group)
            vs1 = _expand_group_scales(
                decode_embedded_scales(v_ref[0, 0][:, K, :], K), K, group)
            s = s * ks1
        cols = (jax.lax.broadcasted_iota(jnp.int32, (block_kv, 1), 0) + start)
        mask = cols < hist_lim
        if window is not None:
            mask = jnp.logical_and(mask, cols > kv_len - 1 - window)
        s = jnp.where(mask, s, _NEG_INF)
        m_prev, l_prev = m_ref[:], l_ref[:]
        m_curr = jnp.max(s, axis=0)[:, None]
        m_new = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new.reshape(-1)[None, :])
        p = jnp.where(mask, p, 0.0)
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=0)[:, None]
        if embedded:
            p = p * vs1
        pv = jax.lax.dot_general(
            p.astype(qd_ref.dtype), v2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(ikv == num_kv_blocks - 1)
    def _finalize():
        # append the current token from VMEM (never read back from HBM)
        kn = knew_ref[0, 0]                              # [Kst, D] storage
        vn = vnew_ref[0, 0]
        if embedded:
            ksn = decode_embedded_scales(kn[K, :], K)    # [K]
            vsn = decode_embedded_scales(vn[K, :], K)
            knv = kn[:K].astype(jnp.float32) * ksn[:, None]
            vnv = vn[:K].astype(jnp.float32) * vsn[:, None]
        else:
            knv = kn[:K].astype(jnp.float32)             # [K, D]
            vnv = vn[:K].astype(jnp.float32)

        def expand_rows(x):                              # [K, D] -> [H, D]
            if group == 1:
                return x
            return jnp.broadcast_to(x[:, None, :], (K, group, D)).reshape(
                H, D)

        qf = q_ref[0].astype(jnp.float32)                # [H, D]
        s_new = jnp.sum(qf * expand_rows(knv), axis=1)[:, None] * sm_scale
        s_new = jnp.where(active, s_new, _NEG_INF)       # [H, 1]
        m_prev, l_prev = m_ref[:], l_ref[:]
        m_f = jnp.maximum(m_prev, s_new)
        alpha = jnp.exp(m_prev - m_f)
        p_new = jnp.exp(s_new - m_f)
        p_new = jnp.where(active, p_new, 0.0)
        l_f = alpha * l_prev + p_new
        accd = _diag_extract(acc_ref[:] * alpha, Kst, group, D)   # [H, D]
        out = (accd + p_new * expand_rows(vnv)) / jnp.where(
            l_f == 0.0, 1.0, l_f)
        o_ref[0] = out.astype(o_ref.dtype)

        @pl.when(active)
        def _wait_write():
            pltpu.make_async_copy(
                knew_ref.at[0], kout_ref.at[ly, b, pl.ds(hist, 1), :, :],
                sem.at[0]).wait()
            pltpu.make_async_copy(
                vnew_ref.at[0], vout_ref.at[ly, b, pl.ds(hist, 1), :, :],
                sem.at[1]).wait()


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_kv", "kv_hi", "embedded",
                              "window"))
def _attention_decode_fused_mxu(q, k_new, v_new, k_cache, v_cache, q_start,
                                kv_len, layer, sm_scale, block_kv,
                                kv_hi=None, embedded=False, window=None):
    """q: [B, 1, H, D]; k_new/v_new in STORAGE form [B, 1, Kst, D] (bf16,
    or packed int8 with embedded scale rows); caches [L, B, S, Kst, D].
    Returns (out [B, 1, H, D], k_cache, v_cache) with the caches updated
    in place (aliased)."""
    B, _, H, D = q.shape
    L, _, Skv, Kst, _ = k_cache.shape
    K = Kst - EMBED_PAD if embedded else Kst
    G = H // K
    if kv_hi is not None:
        Skv = min(Skv, max(block_kv, round_up(kv_hi, block_kv)))
    bk = Skv if Skv <= block_kv else max(8, (block_kv // 8) * 8)
    nkv = cdiv(Skv, bk)
    qr = q.reshape(B, H, D)

    def clamp_j(j, kl_ref, b):
        last = jnp.maximum((kl_ref[b] + bk - 1) // bk - 1, 0)
        j = jnp.minimum(j, last)
        if window is not None:   # below-window blocks: clamp up, skip DMA
            lo = jnp.maximum((kl_ref[b] - window) // bk, 0)
            j = jnp.maximum(j, jnp.minimum(lo, last))
        return j

    kv_ix = lambda b, j, qs, kl, ly: (ly[0], b, clamp_j(j, kl, b), 0, 0)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    KDst = Kst * D
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nkv),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, j, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, Kst, D), lambda b, j, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Kst, D), lambda b, j, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, bk, Kst, D), kv_ix),
            pl.BlockSpec((1, 1, bk, Kst, D), kv_ix),
        ],
        out_specs=[
            pl.BlockSpec((1, H, D), lambda b, j, *_: (b, 0, 0)),
            any_spec,
            any_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((KDst, H), _kv_compute_dtype(k_cache.dtype)),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, KDst), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(
        _decode_fused_mxu_kernel, sm_scale=sm_scale, block_kv=bk,
        num_kv_blocks=nkv, K=K, group=G, embedded=embedded, window=window)
    # flat operands: qs, kl, ly, q, knew, vnew, k, v -> caches at 6, 7
    out, kc, vc = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, D), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={6: 1, 7: 2},
        interpret=pallas_interpret(),
    )(q_start.astype(jnp.int32), kv_len.astype(jnp.int32),
      jnp.asarray(layer, jnp.int32).reshape(1), qr,
      k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype),
      k_cache, v_cache)
    return out.reshape(B, 1, H, D), kc, vc


def attention_decode_fused_mxu(q, k_new, v_new, k_cache, v_cache, q_start,
                               kv_len, layer, *, sm_scale=None,
                               block_kv: int = 128, kv_hi: int | None = None,
                               embedded: bool = False,
                               window: int | None = None):
    """Fused MXU decode write+attend for the stacked cache (bf16 or
    embedded-int8 storage; k_new/v_new already in storage form). See
    _decode_fused_mxu_kernel."""
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    return _attention_decode_fused_mxu(
        q, k_new, v_new, k_cache, v_cache,
        q_start.astype(jnp.int32), kv_len.astype(jnp.int32), layer,
        float(scale), block_kv, kv_hi=kv_hi, embedded=embedded,
        window=window)


def fuse_decode_shapes_ok(q_shape, cache) -> bool:
    """Shape half of the fused-decode gate (backend-independent, so
    tests can pin that every production preset qualifies)."""
    B, T, H, D = q_shape
    Kst = cache.k.shape[3]
    K = Kst - EMBED_PAD if cache.embedded_scales else Kst
    return (T == 1 and H % K == 0 and H % 8 == 0 and D % 128 == 0
            and Kst % 8 == 0
            and (not cache.quantized or cache.embedded_scales))


def can_fuse_decode_mxu(q_shape, cache, kernels: str) -> bool:
    """Fused MXU decode gate: one new token, stacked cache in bf16 or
    embedded-int8 form, tile-aligned dims, compiled Pallas."""
    return (fuse_decode_shapes_ok(q_shape, cache)
            and use_pallas(kernels) and not pallas_interpret())


def _mk_kernel(quant, layered, paged=False, **kw):
    """Bind the prefetch/scale ref layout into a kernel callable."""
    if paged:
        def kern(qs, kl, ly, tb, q, k, v, o, m, l, acc):
            _attn_kernel(qs, kl, q, k, v, None, None, o, m, l, acc, **kw)
        return kern
    if layered:
        if quant:
            def kern(qs, kl, ly, q, k, v, ks, vs, o, m, l, acc):
                _attn_kernel(qs, kl, q, k, v, ks, vs, o, m, l, acc, **kw)
        else:
            def kern(qs, kl, ly, q, k, v, o, m, l, acc):
                _attn_kernel(qs, kl, q, k, v, None, None, o, m, l, acc, **kw)
    else:
        if quant:
            def kern(qs, kl, q, k, v, ks, vs, o, m, l, acc):
                _attn_kernel(qs, kl, q, k, v, ks, vs, o, m, l, acc, **kw)
        else:
            def kern(qs, kl, q, k, v, o, m, l, acc):
                _attn_kernel(qs, kl, q, k, v, None, None, o, m, l, acc, **kw)
    return kern


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_kv", "interpret",
                     "kv_hi", "embedded", "window"))
def _attention_pallas(q, k_cache, v_cache, q_start, kv_len, causal, sm_scale,
                      block_q, block_kv, interpret, k_scale=None,
                      v_scale=None, layer=None, kv_hi=None, embedded=False,
                      window=None, table=None):
    B, Sq, H, D = q.shape
    paged = table is not None
    layered = layer is not None
    if paged:
        page = k_cache.shape[2]           # pool [L, P, page, Kst, D]
        Skv, Kst = table.shape[1] * page, k_cache.shape[3]
    else:
        Skv, Kst = (k_cache.shape[2], k_cache.shape[3]) if layered else \
            (k_cache.shape[1], k_cache.shape[2])
    K = Kst - EMBED_PAD if embedded else Kst
    G = H // K
    rows = Sq * G
    quant = k_scale is not None

    # static watermark (see module docstring): bound the kv grid, whole
    # blocks only so block shapes stay legal against the full-size array
    if kv_hi is not None:
        Skv = min(Skv, max(block_kv, round_up(kv_hi, block_kv)))

    bq = rows if rows <= block_q else max(8, (block_q // 8) * 8)
    bk = Skv if Skv <= block_kv else max(8, (block_kv // 8) * 8)
    # int8-cache prefill: Mosaic's int8 handling of the [bk, Kst, D]
    # blocks (tile padding + cast/relayout temps) carries large
    # bk*Kst*D-proportional scoped-VMEM costs — at MHA head counts
    # (Kst=32, D=128) bk=128 overflowed the 16 MB limit on hardware at
    # EVERY bq (19.0M at bq=128, still 16.9M at bq=32), while bk=64
    # compiles even at bq=128 (compile-only bisect, r4). Cap the
    # quantized variants' bk at the measured-safe per-block volume so
    # GQA models (smaller Kst) keep their larger, faster DMA blocks;
    # the bf16 path keeps its validated tiles.
    if quant or embedded:
        # measured-safe volume: bk=64 at Kst=40 (embedded 7B), D=128
        safe = max(8, ((64 * 40 * 128) // max(Kst * D, 1)) // 8 * 8)
        bk = min(bk, safe)
    if paged:
        bk = min(bk, page)
        if page % bk:
            bk = page
        ppb = page // bk
    nq = cdiv(rows, bq)
    nkv = cdiv(Skv, bk)

    # [B, Sq, H, D] -> [B, K, Sq*G, D]; row r = i*G + g
    qr = q.reshape(B, Sq, K, G, D).transpose(0, 2, 1, 3, 4).reshape(
        B, K, rows, D)

    prefetch = [q_start, kv_len]
    np_ = 2

    def clamp_j(j, kl_ref, b):
        # clamp the kv block index to this sequence's last valid block:
        # consecutive identical block indices make Mosaic skip the DMA, so
        # blocks past kv_len[b] cost nothing (pl.when already skips their
        # compute) — a per-sequence dynamic watermark on top of the static
        # kv_hi one.
        last = jnp.maximum((kl_ref[b] + bk - 1) // bk - 1, 0)
        return jnp.minimum(j, last)

    if paged:
        if quant:
            raise NotImplementedError(
                "paged cache + separate k/v scale planes: quantized paged "
                "pools use embedded scales (embedded_kv=True)")
        prefetch.append(jnp.asarray(layer, jnp.int32).reshape(1))
        prefetch.append(table.astype(jnp.int32))
        np_ = 4

        def kv_ix(b, i, j, qs, kl, ly, tb):
            jj = clamp_j(j, kl, b)
            return (ly[0], tb[b, (jj * bk) // page], jj % ppb, 0, 0)
        kv_blk = (1, 1, bk, Kst, D)
        sc_blk = sc_ix = None
    elif layered:
        prefetch.append(jnp.asarray(layer, jnp.int32).reshape(1))
        np_ = 3
        kv_ix = lambda b, i, j, qs, kl, ly: (ly[0], b, clamp_j(j, kl, b), 0, 0)
        sc_ix = lambda b, i, j, qs, kl, ly: (ly[0], b, clamp_j(j, kl, b), 0)
        kv_blk = (1, 1, bk, Kst, D)
        sc_blk = (1, 1, bk, K)
    else:
        kv_ix = lambda b, i, j, qs, kl: (b, clamp_j(j, kl, b), 0, 0)
        sc_ix = lambda b, i, j, qs, kl: (b, clamp_j(j, kl, b), 0)
        kv_blk = (1, bk, Kst, D)
        sc_blk = (1, bk, K)

    in_specs = [
        pl.BlockSpec((1, K, bq, D), lambda b, i, j, *_: (b, 0, i, 0)),
        pl.BlockSpec(kv_blk, kv_ix),
        pl.BlockSpec(kv_blk, kv_ix),
    ]
    inputs = prefetch + [qr, k_cache, v_cache]
    if quant:
        s_spec = pl.BlockSpec(sc_blk, sc_ix)
        in_specs += [s_spec, s_spec]
        inputs += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=np_,
        grid=(B, nq, nkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, K, bq, D), lambda b, i, j, *_: (b, 0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((K, bq), jnp.float32),
            pltpu.VMEM((K, bq), jnp.float32),
            pltpu.VMEM((K, bq, D), jnp.float32),
        ],
    )
    kern = _mk_kernel(quant, layered, paged=paged, sm_scale=sm_scale,
                      block_q=bq, block_kv=bk, group=G, causal=causal,
                      num_kv_blocks=nkv,
                      kv_lead=2 if (layered or paged) else 1,
                      embedded=embedded, window=window)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, rows, D), q.dtype),
        interpret=interpret,
    )(*inputs)

    return out.reshape(B, K, Sq, G, D).transpose(0, 2, 1, 3, 4).reshape(
        B, Sq, H, D)


def attention(q, k_cache, v_cache, q_start, kv_len, *, causal: bool = True,
              sm_scale: float | None = None, block_q: int = 128,
              block_kv: int = 128, kernels: str = "auto", k_scale=None,
              v_scale=None, layer=None, kv_hi: int | None = None,
              embedded_kv: bool = False, window: int | None = None,
              table=None):
    """Flash attention of q against the (already updated) KV cache.

    See attention_xla for shapes (token-major [.., Skv, K, D] cache).
    ``k_cache``/``v_cache`` must already contain the current tokens' K/V at
    positions [q_start, q_start+len) — cache write happens first
    (ops/kv_cache.py), exactly as the reference decode kernel writes the new
    k,v before attending (decoder_self_attention.cu:126,172). Pass
    ``k_scale``/``v_scale`` ([.., Skv, K] f32) for an INT8-quantized cache,
    ``layer`` (traced int32) for a stacked [L, ...] cache, and ``kv_hi``
    (static) to bound the scanned kv prefix.
    """
    if not use_pallas(kernels):
        if table is not None:
            # golden paged path: gather the table into a dense view
            from llm_inference_engine_tpu.ops.paged_kv import (
                PagedKVCache, gather_layer_pages)
            cache = PagedKVCache(k=k_cache, v=v_cache, block_table=table,
                                 lengths=kv_len,
                                 embedded_scales=embedded_kv)
            kd, vd = gather_layer_pages(cache, layer)
            return attention_xla(q, kd, vd, q_start, kv_len, causal=causal,
                                 sm_scale=sm_scale, embedded_kv=embedded_kv,
                                 window=window)
        return attention_xla(q, k_cache, v_cache, q_start, kv_len,
                             causal=causal, sm_scale=sm_scale,
                             k_scale=k_scale, v_scale=v_scale, layer=layer,
                             embedded_kv=embedded_kv, window=window)
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1])
    if causal and can_decode_mxu(q.shape, k_cache.shape[-2], k_cache.shape[-1]):
        # Sq == 1: MXU block-diagonal decode (all cache variants, any GQA
        # group) — the kv stream never touches the VPU
        return _attention_decode_mxu(
            q, k_cache, v_cache,
            q_start.astype(jnp.int32), kv_len.astype(jnp.int32),
            float(scale), block_kv, pallas_interpret(),
            k_scale=k_scale, v_scale=v_scale, layer=layer, kv_hi=kv_hi,
            embedded=embedded_kv, window=window, table=table)
    return _attention_pallas(
        q, k_cache, v_cache,
        q_start.astype(jnp.int32), kv_len.astype(jnp.int32),
        causal, float(scale), block_q, block_kv, pallas_interpret(),
        k_scale=k_scale, v_scale=v_scale, layer=layer, kv_hi=kv_hi,
        embedded=embedded_kv, window=window, table=table)


