"""Weight-only INT8 / INT4 quantization with dequant fused into the matmul.

This realizes the capability the reference declared but never implemented:
its ``WeightType::INT8_W`` enum is defined and never used
(reference: src/weights/includes/base_weights.h:10, README.md:36-39 lists
"INT8/INT4 quantization" as future work) — and the lack of it is why the
reference could not even load Llama2-7B (README.md:9).

Schemes:
- INT8: per-output-channel absmax scales, s: [out] f32. Because the scale is
  constant along the contraction axis, it factors out of the dot:
  y = (x @ q) * s — the kernel streams int8 weights HBM->VMEM (half the
  bytes of bf16), casts in VMEM, feeds the MXU, and applies the scale once
  per output tile.
- INT4: two 4-bit values packed per int8 byte along the contraction axis
  (sublane-interleaved: byte r carries row 2r in the low nibble and row
  2r+1 in the high — exactly the bit layout ``pltpu.bitcast(..., int4)``
  unpacks), with grouped scales s: [in/group, out] f32. The kernel
  bitcasts the packed block to an int4 view (zero VPU cost — Mosaic feeds
  sub-byte operands to the MXU natively) and runs one dot per scale group,
  applying the group's scales to the [bm, bn] partial product. Touching
  the weights on the VPU at all (the previous shift-unpack + scale
  multiply) forced their materialization and capped the kernel at ~410
  GB/s effective; the bitcast + partial-scale form reaches the same
  ~560 GB/s as a scale-free int4 matmul (benchmarks/bench_int4_variants).

The matmul grid is (M/bm, N/bn, K/bk) with K innermost and an f32 VMEM
accumulator. ``bk`` is always a DIVISOR of the contraction dim (_pick_bk):
a non-dividing block made the last K step read past the x/w arrays, and
Pallas TPU leaves out-of-bounds block regions unspecified — on real
hardware that garbage entered the accumulator (Llama's 11008 FFN dim with
bk=1024 produced ~16% error; interpret mode zero-fills, which is why CPU
tests never saw it).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_engine_tpu.utils import cdiv, pallas_interpret, round_up, use_pallas

__all__ = [
    "QuantizedTensor",
    "quantize_tensor",
    "dequantize_tensor",
    "quantized_linear",
    "quantized_linear_xla",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedTensor:
    """Quantized [in, out] weight.

    mode="int8": q int8 [in, out], scale f32 [1, out]
    mode="int4": q int8 [in//2, out] (row 2k in low nibble, 2k+1 in high),
                 scale f32 [in//group, out]
    """

    q: jax.Array
    scale: jax.Array
    mode: str = dataclasses.field(metadata=dict(static=True), default="int8")
    group_size: int = dataclasses.field(metadata=dict(static=True), default=128)

    @property
    def shape(self):
        if self.mode == "int4":
            return (self.q.shape[0] * 2, self.q.shape[1])
        return self.q.shape

    @property
    def dtype(self):
        return jnp.bfloat16

    @property
    def nbytes(self) -> int:
        return self.q.size * self.q.dtype.itemsize + self.scale.size * 4


def _pack_int4(qvals: jax.Array, group_size: int = 0) -> jax.Array:
    """[in, out] int8 in [-8, 7] -> [in//2, out] packed.

    Sublane-interleaved: byte r = (row 2r & 0xF) | (row 2r+1 << 4). This is
    the exact bit layout a TPU int4 array uses across sublanes, so the
    matmul kernel unpacks with a single ``pltpu.bitcast(..., jnp.int4)`` —
    hardware sub-byte handling, no VPU shift arithmetic. ``group_size`` is
    accepted for API symmetry but the packing is group-agnostic."""
    del group_size
    k, n = qvals.shape
    lo = qvals[0::2].astype(jnp.uint8) & 0xF
    hi = (qvals[1::2].astype(jnp.uint8) & 0xF) << 4
    return (lo | hi).astype(jnp.int8)


def _unpack_int4(packed: jax.Array, group_size: int = 0) -> jax.Array:
    """[in//2, out] packed -> [in, out] int8 (host/golden path); inverse of
    the sublane interleave in _pack_int4."""
    del group_size
    k2, n = packed.shape
    b = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(b, 28), 28)     # sign-extend low nibble
    hi = jnp.right_shift(b, 4)                          # high nibble (signed)
    out = jnp.stack([lo, hi], axis=1)                   # [k2, 2, n]
    return out.reshape(k2 * 2, n).astype(jnp.int8)


def quantize_tensor(w: jax.Array, mode: str = "int8",
                    group_size: int = 128,
                    clip: jax.Array | None = None) -> QuantizedTensor:
    """Quantize a [in, out] weight (absmax, symmetric).

    ``clip``: optional per-scale-block clip factors in (0, 1] — [1, out]
    for int8, [in/group, out] for int4 — shrinking the absmax before the
    scale is derived (values beyond the clipped range saturate). Produced
    by ``search_clip`` (calibration-aware quantization); the storage
    format and the runtime kernels are unchanged."""
    w = w.astype(jnp.float32)
    k, n = w.shape
    if mode == "int8":
        absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)        # [1, out]
        if clip is not None:
            absmax = absmax * clip.reshape(1, n)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return QuantizedTensor(q=q, scale=scale, mode="int8",
                               group_size=group_size)
    if mode == "int4":
        if k % group_size != 0:
            raise ValueError(f"in dim {k} not divisible by group {group_size}")
        wg = w.reshape(k // group_size, group_size, n)
        absmax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)       # [G,1,N]
        if clip is not None:
            absmax = absmax * clip.reshape(k // group_size, 1, n)
        scale = jnp.maximum(absmax, 1e-8) / 7.0
        q = jnp.clip(jnp.round(wg / scale), -8, 7).astype(jnp.int8)
        q = q.reshape(k, n)
        return QuantizedTensor(q=_pack_int4(q, group_size), scale=scale[:, 0, :],
                               mode="int4", group_size=group_size)
    raise ValueError(f"unknown quant mode {mode!r}")


_CLIP_GRID = tuple(1.0 - 0.05 * i for i in range(11))    # 1.00 .. 0.50


def search_clip(w: jax.Array, mode: str = "int4", group_size: int = 128,
                act_sq: jax.Array | None = None,
                grid=_CLIP_GRID) -> jax.Array:
    """Calibration-aware clip factors for ``quantize_tensor`` (AWQ-lite).

    Round-to-nearest absmax scales spend the whole int4 range on a block's
    single largest value; clipping the range trades saturation error on
    the few outliers for finer resolution on everything else. This grid-
    searches a clip factor per scale block minimizing the OUTPUT error of
    the linear layer under the diagonal activation approximation:

        E||x (w - w_hat)||^2  ~=  sum_i E[x_i^2] * (w - w_hat)_ij^2

    so the objective is weight-space MSE weighted per input row by the
    calibration activations' second moment ``act_sq`` [in] (uniform when
    None — plain MSE clip search). This captures the activation-aware
    part of AWQ (arXiv:2306.00978) without its weight-scaling transform,
    and leaves the storage format and every runtime kernel untouched.

    Returns clip factors: [1, out] (int8) or [in/group, out] (int4).
    """
    w = w.astype(jnp.float32)
    k, n = w.shape
    g = group_size if mode == "int4" else k
    if k % g:
        raise ValueError(f"in dim {k} not divisible by group {g}")
    qmax = 7.0 if mode == "int4" else 127.0
    wg = w.reshape(k // g, g, n)
    d = (jnp.ones((k,), jnp.float32) if act_sq is None
         else act_sq.astype(jnp.float32).reshape(k))
    dg = d.reshape(k // g, g, 1)
    absmax = jnp.maximum(jnp.max(jnp.abs(wg), axis=1, keepdims=True), 1e-8)

    best_err = None
    best_clip = None
    for alpha in grid:
        scale = absmax * alpha / qmax                       # [G, 1, N]
        # same clip range as quantize_tensor applies (-qmax-1 .. qmax):
        # the search must evaluate the exact quantizer it tunes
        q = jnp.clip(jnp.round(wg / scale), -qmax - 1, qmax)
        err = jnp.sum(dg * (wg - q * scale) ** 2, axis=1)   # [G, N]
        if best_err is None:
            best_err, best_clip = err, jnp.full_like(err, alpha)
        else:
            take = err < best_err
            best_err = jnp.where(take, err, best_err)
            best_clip = jnp.where(take, alpha, best_clip)
    return best_clip if mode == "int4" else best_clip.reshape(1, n)


def dequantize_tensor(t: QuantizedTensor) -> jax.Array:
    """Full dequantization (golden reference / debugging only)."""
    if t.mode == "int8":
        return t.q.astype(jnp.float32) * t.scale
    q = _unpack_int4(t.q, t.group_size).astype(jnp.float32)  # [in, out]
    k, n = q.shape
    qg = q.reshape(k // t.group_size, t.group_size, n)
    return (qg * t.scale[:, None, :]).reshape(k, n)


# ---------------------------------------------------------------------------
# XLA fallback
# ---------------------------------------------------------------------------

def quantized_linear_xla(x: jax.Array, t: QuantizedTensor,
                         bias: jax.Array | None = None,
                         out_dtype: Any = None) -> jax.Array:
    out_dtype = out_dtype or x.dtype
    if t.q.ndim > 2:
        t = QuantizedTensor(
            q=t.q.reshape(t.q.shape[0], -1),
            scale=t.scale.reshape(t.scale.shape[0], -1),
            mode=t.mode, group_size=t.group_size)
    if t.mode == "int8":
        y = jax.lax.dot_general(
            x.astype(jnp.float32), t.q.astype(jnp.float32),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y * t.scale[0]
    else:
        w = dequantize_tensor(t)
        y = jax.lax.dot_general(
            x.astype(jnp.float32), w,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Large-m (prefill) path: dequant once + plain bf16 MXU dot
# ---------------------------------------------------------------------------

_PREFILL_M = 1024   # m >= this routes to _large_m_linear


def _large_m_ok(t: "QuantizedTensor", kernels: str = "auto") -> bool:
    """int8 always (exact cast, no unpack); int4 only when the Pallas
    dequant-materialize kernel fits the shape — the XLA int4 unpack is
    slower than the fused matmul it would replace (measured: int4 prefill
    3697 vs 6938 tok/s when routed through the XLA unpack)."""
    if t.mode == "int8":
        return True
    k_in = t.q.shape[-2] * 2
    return (use_pallas(kernels) or pallas_interpret()) and \
        _plan_dequant_blocks(k_in, t.q.shape[-1], t.group_size) is not None


def _dequant_bf16(q2, sc2, mode, group_size):
    """q2 [in(/2), n] -> bf16 [in, n]. int8 values cast exactly (|q| <= 127
    fits bf16's 8-bit mantissa) with scales NOT applied — the caller scales
    the f32 accumulator post-dot, matching the fused kernel's numerics
    bit-for-bit. int4 grouped scales vary along K so they must be baked
    into the weight here (one extra bf16 rounding, relative ~2^-9); the
    unpack+scale runs as a Pallas kernel when the shape allows (the XLA
    int4 unpack was measured 2x slower than the whole fused matmul it was
    meant to replace), XLA otherwise."""
    if mode == "int8":
        return q2.astype(jnp.bfloat16)
    plan = _plan_dequant_blocks(q2.shape[0] * 2, q2.shape[1], group_size)
    if plan is not None and (use_pallas("auto") or pallas_interpret()):
        return _dequant_int4_pallas(q2, sc2, group_size, *plan,
                                    pallas_interpret())
    qi = _unpack_int4(q2, group_size)                     # [in, n] int8
    k, n = qi.shape
    qg = qi.reshape(k // group_size, group_size, n).astype(jnp.float32)
    return (qg * sc2[:, None, :]).reshape(k, n).astype(jnp.bfloat16)


def _plan_dequant_blocks(k: int, n: int, group_size: int):
    """(bk, bn) for the int4 dequant-materialize grid, or None -> XLA.
    bk must divide k, cover whole scale groups, and keep the packed block
    sublane-aligned (bk/2 % 8 == 0 -> bk % 16); bn lane-aligned."""
    import math as _math
    step = group_size * 16 // _math.gcd(group_size, 16)   # lcm
    if k % step:
        return None
    bk = k if k <= 1024 else _pick_bk(k, step, target=1024, cap=2048)
    if bk is None or k % bk or bk % group_size:
        return None
    if n <= 512:
        bn = n
    else:
        # largest divisor of n that's a multiple of 128 and <= 512 (ragged
        # N blocks read unspecified input regions on hardware; never allow)
        bn = None
        for d in range(128, 513, 128):
            if n % d == 0:
                bn = d
        if bn is None:
            return None
    return bk, bn


def _dequant_int4_kernel(q_ref, s_ref, o_ref, *, group_size):
    """One [bk, bn] output tile: hardware int4 unpack (bitcast), cast,
    apply grouped scales, write bf16. Pure bandwidth: 0.5 B/elem read +
    2 B/elem write."""
    qb = q_ref[...]                                   # [bk/2, bn] packed
    w = pltpu.bitcast(qb, jnp.int4)                   # [bk, bn] int4 view
    sb = s_ref[...].reshape(-1, s_ref.shape[-1])      # [gb, bn]
    bk, bn = w.shape
    wf = w.astype(jnp.float32).reshape(bk // group_size, group_size, bn)
    o_ref[...] = (wf * sb[:, None, :]).reshape(bk, bn).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("group_size", "bk", "bn", "interpret"))
def _dequant_int4_pallas(q2, sc2, group_size, bk, bn, interpret):
    """Packed [k/2, n] int8 + grouped scales [k/group, n] -> bf16 [k, n]."""
    k2, n = q2.shape
    k = k2 * 2
    gb = bk // group_size
    sc3 = sc2.astype(jnp.float32).reshape(k // group_size, 1, n)
    grid = (k // bk, cdiv(n, bn))
    return pl.pallas_call(
        functools.partial(_dequant_int4_kernel, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bk // 2, bn), lambda l, j: (l, j)),
            pl.BlockSpec((gb, 1, bn), lambda l, j: (l, 0, j)),
        ],
        out_specs=pl.BlockSpec((bk, bn), lambda l, j: (l, j)),
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.bfloat16),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(q2, sc3)


def _large_m_linear(x2, t: "QuantizedTensor", layer, out_dtype):
    """Prefill-sized m: the fused kernel re-streams and re-dequants the
    weight once per M tile — (m/bm) x weight HBM traffic plus repeated
    VPU casts — capping it at ~55% MXU at m=2048. Dequantizing the whole
    weight ONCE to bf16 and issuing a plain XLA bf16 dot runs the dot at
    ~96% MXU (measured m=2048 K=4096 N=11008: 1.68 ms fused vs 0.97 ms
    dot + ~0.25 ms dequant; benchmarks/bench_prefill.py). Decode stays on
    the fused kernels: at m<=32 the dequant would dominate.

    Handles the same layouts as _quantized_matmul_pallas: per-layer 2-D,
    stacked [L, in', n] (``layer`` traced), and the structured gate|up
    stack [L, 2, in', I] (returns the flat [m, gate|up] layout)."""
    q, sc = t.q, t.scale
    if layer is not None:
        q = jax.lax.dynamic_index_in_dim(q, layer, 0, keepdims=False)
        sc = jax.lax.dynamic_index_in_dim(sc, layer, 0, keepdims=False)
    if q.ndim == 3:                                       # structured
        w = jnp.concatenate(
            [_dequant_bf16(q[i], sc[i], t.mode, t.group_size)
             for i in range(q.shape[0])], axis=-1)        # [in, 2I]
        post = (jnp.concatenate(list(sc), axis=-1)        # [1, 2I]
                if t.mode == "int8" else None)
    else:
        w = _dequant_bf16(q, sc, t.mode, t.group_size)    # [in, n]
        post = sc if t.mode == "int8" else None           # [1, n]
    y = jax.lax.dot_general(x2.astype(jnp.bfloat16), w,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if post is not None:
        y = y * post
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Pallas fused dequant-matmul kernels
# ---------------------------------------------------------------------------

def _block2d(ref):
    """Load a block and squeeze leading singleton dims to [rows, cols] —
    rank-agnostic so the same kernel serves per-layer and stacked
    ([L, ...], layer via scalar prefetch) weights."""
    w = ref[...]
    return w.reshape(w.shape[-2], w.shape[-1])


def _int8_matmul_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, num_k_blocks,
                        block_k, k_valid):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    if k_valid % block_k:
        # ragged K: the last block's x/w tails are out-of-bounds block
        # reads (unspecified values on hardware — NOT zeros; this produced
        # ~16% error on Llama's 11008 FFN dim before masking). Zeroing the
        # x tail kills the garbage products; int8 w garbage cannot NaN.
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + ik * block_k
        x = jnp.where(col < k_valid, x, 0)
    w = _block2d(q_ref).astype(x.dtype)            # int8 -> compute dtype in VMEM
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ik == num_k_blocks - 1)
    def _fin():
        scale = s_ref[...].reshape(-1)             # [bn]
        y = (acc_ref[:] * scale[None, :]).astype(o_ref.dtype)
        o_ref[...] = y.reshape(o_ref.shape)        # [bm, bn] or [1, bm, bn]


def _int4_matmul_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, num_k_blocks,
                        group_size):
    """Bitcast the packed block to an int4 view (free — Mosaic feeds
    sub-byte operands to the MXU natively; see module docstring) and run
    one mixed bf16×int4 dot per scale group, scaling the [bm, bn] partial.
    The weights are never touched by the VPU."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                                    # [bm, bk]
    qb = _block2d(q_ref)                            # [bk/2, bn] packed
    w = pltpu.bitcast(qb, jnp.int4)                 # [bk, bn] int4 view
    sb = s_ref[...]                                 # [.., Gb(, 1), bn]
    sb = sb.reshape(-1, sb.shape[-1])               # [Gb, bn]
    gb = w.shape[0] // group_size
    acc = acc_ref[:]
    for g in range(gb):
        p = jax.lax.dot_general(
            x[:, g * group_size:(g + 1) * group_size],
            w[g * group_size:(g + 1) * group_size, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = acc + p * sb[g][None, :]
    acc_ref[:] = acc

    @pl.when(ik == num_k_blocks - 1)
    def _fin():
        o_ref[...] = acc_ref[:].astype(o_ref.dtype).reshape(o_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "group_size", "out_dtype", "bm", "bn", "bk",
                     "interpret"))
def _quantized_matmul_pallas(x2, q, scale, mode, group_size, out_dtype,
                             bm, bn, bk, interpret, layer=None):
    """Fused dequant-matmul.

    Per-layer weights: q [in(/2), out], scale [1|groups, out].
    Stacked weights (``layer`` given — a traced int32 read via scalar
    prefetch, never a sliced-out copy): q [L, in(/2), out] or, for the
    structured gate|up stack, [L, 2, in(/2), I] — both halves run in the
    SAME call (the grid's N dimension enumerates them) and the result is
    [2, m, I]. Scales carry the same leading dims.
    """
    m, k = x2.shape
    layered = layer is not None
    structured = q.ndim == 4
    n = q.shape[-1]
    nm, nn, nk = cdiv(m, bm), cdiv(n, bn), cdiv(k, bk)

    qrows = bk if mode == "int8" else bk // 2
    if layered:
        # stacked q: [L, in', n] or structured [L, 2, in', I] (the 2-axis
        # ahead of the block dims — a trailing (.., 1, bn) block over an
        # interior size-2 axis would violate Mosaic's block-shape rules).
        # Structured runs gate and up in ONE pallas call: the grid's N
        # dimension enumerates both halves (j // nn selects the half) and
        # the output is [2, m, I] — two calls per layer paid an extra
        # kernel invocation per layer per step for nothing.
        if structured:
            q_ix = lambda i, j, l, ly: (ly[0], j // nn, l, j % nn)
            q_blk = (1, 1, qrows, bn)
        else:
            q_ix = lambda i, j, l, ly: (ly[0], l, j)
            q_blk = (1, qrows, bn)
        if mode == "int8":
            # scale [L, 1, n] / [L, 2, 1, I]
            if structured:
                s_ix = lambda i, j, l, ly: (ly[0], j // nn, 0, j % nn)
                s_blk = (1, 1, 1, bn)
            else:
                s_ix = lambda i, j, l, ly: (ly[0], 0, j)
                s_blk = (1, 1, bn)
        else:
            # int4 grouped scales, Gb = bk/group groups per K block. The
            # scale block is taken STRAIGHT off the stored [.., G, n] array
            # — _plan_blocks guarantees (Gb, bn) is a legal trailing tile
            # (Gb % 8 == 0 or Gb == G). An earlier singleton-axis reshape
            # here made XLA re-lay-out the full stacked scale array EVERY
            # LAYER of the decode scan (45 MB x 32 copies per step for the
            # 7B down projection — ~24% of the whole step, profiled).
            gb = bk // group_size
            if structured:                       # [L, 2, G, I]
                s_ix = lambda i, j, l, ly: (ly[0], j // nn, l, j % nn)
                s_blk = (1, 1, gb, bn)
            else:                                # [L, G, n]
                s_ix = lambda i, j, l, ly: (ly[0], l, j)
                s_blk = (1, gb, bn)
        x_ix = lambda i, j, l, ly: (i, l)
        if structured:
            o_ix = lambda i, j, l, ly: (j // nn, i, j % nn)
        else:
            o_ix = lambda i, j, l, ly: (i, j)
        num_prefetch = 1
        extra = (jnp.asarray(layer, jnp.int32).reshape(1),)
    else:
        q_ix = lambda i, j, l: (l, j)
        q_blk = (qrows, bn)
        if mode == "int8":
            s_ix = lambda i, j, l: (0, j)
            s_blk = (1, bn)
        else:
            # scale [groups, n], (Gb, bn) trailing tile legal by plan
            gb = bk // group_size
            s_ix = lambda i, j, l: (l, j)
            s_blk = (gb, bn)
        x_ix = lambda i, j, l: (i, l)
        o_ix = lambda i, j, l: (i, j)
        num_prefetch = 0
        extra = ()

    if mode == "int8":
        kern = functools.partial(_int8_matmul_kernel, num_k_blocks=nk,
                                 block_k=bk, k_valid=k)
    else:
        kern = functools.partial(_int4_matmul_kernel, num_k_blocks=nk,
                                 group_size=group_size)
    if num_prefetch:
        base = kern
        kern = lambda ly_ref, *refs: base(*refs)

    if structured:
        out_shape = jax.ShapeDtypeStruct((2, m, n), out_dtype)
        out_spec = pl.BlockSpec((1, bm, bn), o_ix)
        grid = (nm, 2 * nn, nk)
    else:
        out_shape = jax.ShapeDtypeStruct((m, n), out_dtype)
        out_spec = pl.BlockSpec((bm, bn), o_ix)
        grid = (nm, nn, nk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), x_ix),
            pl.BlockSpec(q_blk, q_ix),
            pl.BlockSpec(s_blk, s_ix),
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(*extra, x2, q, scale)


def _tile_ok(block, full, lane=False):
    """Mosaic block rule: last two dims divisible by (8, 128) or equal
    to the full array dim."""
    return block == full or block % (128 if lane else 8) == 0


def _pick_bk(k_in: int, step: int, target: int = 1024,
             cap: int = 8192) -> int | None:
    """K-block size: always a DIVISOR of k_in (non-dividing blocks read
    past the x/w arrays on the last K step and Pallas leaves those regions
    unspecified — real-hardware garbage; see module docstring). Picks the
    largest multiple-of-``step`` divisor <= target, escalating above target
    (bounded by cap, VMEM) when only tiny divisors exist below it.
    e.g. k=4096 -> 1024; k=11008 -> 256 or 5504; k=13824 -> 768."""
    if k_in <= target:
        return k_in                      # single full-dim block, always legal
    if step <= 0 or k_in % step:
        return None
    pick = None
    for d in range(step, target + 1, step):
        if k_in % d == 0:
            pick = d
    if pick is None or pick < 512:
        # only tiny divisors below target: a big block beats many small
        # grid steps (K=11008: bk=5504 measured 622 GB/s vs 318 at bk=256)
        for d in range(target + step, cap + 1, step):
            if k_in % d == 0:
                return d
    return pick


def _plan_blocks(m: int, n: int, k_in: int, t: QuantizedTensor,
                 out_bytes: int = 2):
    """(bm, bn, bk) for the fused matmul grid, or None -> XLA fallback.

    INT8: bk = 1024 regardless of divisibility — the kernel masks the
    ragged last K block's x tail (cheap; the weights never leave int8
    until the in-VMEM cast, whose temp bounds bk by scoped VMEM).
    INT4: bk must be a divisor of k_in aligned to the scale groups
    (_pick_bk) — per-group scale blocks cannot tolerate a ragged edge,
    and the bitcast path has no VMEM temp, so huge divisor blocks are
    both legal and fastest. The scale block's trailing (Gb, bn) tile
    additionally needs Gb = bk/group to be a sublane multiple (Gb % 8)
    or the whole G axis (bk == k_in) — the kernel slices the stored
    [.., G, n] scales directly, with no relayout (see the kernel)."""
    import math as _math
    bm = m if m <= 256 else 256
    if bm < 8:
        # Mosaic cannot lower the int8 path's ragged-K row mask at
        # single-row tiles ("Not implemented: Sublane broadcast" —
        # m=1, k=11008, bk=1024 on hardware, r4); an 8-row tile with a
        # ragged M edge compiles fine and the kernel discards the
        # out-of-bounds rows (the weight stream, which dominates, is
        # unchanged)
        bm = 8
    bn = n if n <= 1024 else 1024
    if t.mode == "int4":
        # bk % (8*group) keeps the scale tile legal; dims with no such
        # divisor (Llama's 11008) fall back to one full-K block, whose
        # packed weight block stays comfortably inside VMEM (<= 8 MB)
        step = (8 * t.group_size) * 128 // _math.gcd(8 * t.group_size, 128)
        bk = _pick_bk(k_in, step)
        # full-K fallback viability is judged at the MINIMUM bn (128):
        # the bn-shrink loop below can always bring the weight block
        # down to [k/2, 128] (judging at the default bn=1024 rejected
        # qwen2's inter=18944 down projection outright -> XLA cliff)
        if bk is None and k_in * 128 // 2 <= 8 * 1024 * 1024:
            bk = k_in
        feasible = (_tile_ok(bm, m) and _tile_ok(bn, n, lane=True)
                    and bk is not None and _tile_ok(bk, k_in, lane=True)
                    and (bk % t.group_size == 0 or bk == k_in)
                    and ((bk // t.group_size) % 8 == 0 or bk == k_in))
    else:
        bk = min(k_in, 1024)
        feasible = (_tile_ok(bm, m) and _tile_ok(bn, n, lane=True)
                    and _tile_ok(bk, k_in, lane=True))
    if feasible and bk is not None:
        # Prefill-sized m: every M grid step re-streams the whole weight
        # from HBM, so weight traffic is (m/bm) x weight bytes. Escalate
        # bm while the x block stays modest (cap keeps the working set —
        # double-buffered x, q, out + f32 acc — inside VMEM even at the
        # int4 path's huge divisor bk, e.g. K=11008 -> bk=5504).
        while (bm < 512 and m >= 2 * bm and m % (2 * bm) == 0
               and (2 * bm) * bk * 2 <= 4 * 1024 * 1024):
            bm *= 2
        # DMA size per weight block decides the streaming rate (512 KB
        # blocks measured ~510 GB/s vs ~700 for MB-sized DMAs). Escalate
        # bn over DIVISORS of n (ragged N blocks also burn DMA on
        # discarded columns) while the double-buffered working set —
        # weight + scale blocks x2, x blocks x2, f32 accumulator — stays
        # inside ~12 MB of the core's ~16 MB VMEM.
        gb = bk // t.group_size if t.mode == "int4" else 1
        wrow = bk // 2 if t.mode == "int4" else bk

        def fits(bm_c, bn_c):
            # weight + scale blocks x2 (double-buffered), x blocks x2,
            # OUT blocks x2 (Mosaic double-buffers output windows too),
            # + the f32 accumulator scratch COUNTED TWICE. Omitting the
            # out term overflowed the 16 MB scoped-VMEM limit at prefill
            # widths x vocab with an f32 out (m=256, n=32000: 16.6 MB on
            # hardware, r3); counting the accumulator once still
            # overflowed at bm=512, bn=2048, bk=1024 int4 (single-count
            # model 12.1 MB, hardware >16 MB — r4, TTFT 512-token int4
            # prefill), so the empirical budget doubles it.
            return (2 * wrow * bn_c + 2 * gb * bn_c * 4
                    + 2 * bm_c * bk * 2
                    + 2 * bm_c * bn_c * out_bytes
                    + 2 * bm_c * bn_c * 4) <= 14 * 1024 * 1024
        # bm may shrink independently of m-divisibility: the grid is
        # cdiv(m, bm) and the kernel discards the ragged last M block's
        # tail rows (ADVICE r3: requiring m % bm == 0 here dropped the
        # whole plan for ragged-m shapes over the VMEM budget — a silent
        # XLA-fallback perf cliff)
        while not fits(bm, bn) and bm > 8 and bm % 16 == 0:
            bm //= 2
        # bn must also be able to SHRINK: contraction dims with no
        # grouped-divisor block (13B's inter=13824 -> bk = full K) carry
        # a [k/2, bn] weight block whose bn=1024 default alone exceeds
        # the VMEM budget — the old plan returned None and the decode
        # silently fell to the XLA path at 60 tok/s (r4 perf matrix,
        # llama2-13b: a 5.5x cliff vs the fixed plan)
        while not fits(bm, bn) and bn >= 256 and bn % 256 == 0:
            bn //= 2
        for cand in range(bn + 128, min(n, 8192) + 1, 128):
            if n % cand == 0 and fits(bm, cand):
                bn = cand
        # Decode-shaped int4 matmuls with n <= k: prefer ONE full-K step
        # over an N-parallel grid of ~2-3 MB weight blocks. With K
        # innermost ("arbitrary") every K step revisits the accumulator;
        # an all-parallel grid streams each independent output tile in
        # one shot. Measured on-chip (benchmarks/bench_matmul_plans, m=8):
        # wo 4096x4096 bk=4096/bn=1024 -> 826 GB/s vs 692 for the
        # bn-escalated K-grid plan; w_down 11008x4096 full-K/bn=512 ->
        # 659 vs 641 at bn=1024. Wide-N shapes (wqkv n=3k, gate_up) keep
        # the K-grid: the same switch measured SLOWER there (721 vs 761).
        if (m <= 32 and t.mode == "int4" and n <= k_in
                and k_in % t.group_size == 0):
            wrow_f = k_in // 2
            for bn_f in range(128, min(n, 1024) + 1, 128):
                if (n % bn_f == 0 and n // bn_f >= 4
                        and 1.5 * 2**20 <= wrow_f * bn_f
                        and fits_full(bm, bn_f, wrow_f, k_in)):
                    bn, bk = bn_f, k_in
                    gb = k_in // t.group_size
                    wrow = wrow_f
                    break
    return (bm, bn, bk) if feasible and fits(bm, bn) else None


def fits_full(bm_c, bn_c, wrow_f, k_f):
    """VMEM check for a single-full-K-step plan (same budget model as
    _plan_blocks.fits, with the weight block at full K)."""
    return (2 * wrow_f * bn_c + 2 * (wrow_f * 2 // 128) * bn_c * 4
            + 2 * bm_c * k_f * 2
            + 2 * bm_c * bn_c * 2
            + 2 * bm_c * bn_c * 4) <= 14 * 1024 * 1024


def _pad_rows8(x2):
    """Pad activations to >= 8 rows for the Pallas matmul kernels: Mosaic
    clips a block to a 1-row array and then cannot lower the ragged-K
    lane-iota mask over a single sublane ("Not implemented: Sublane
    broadcast" — m=1 int8 k=11008 on hardware, r4). The padded rows are
    dead weight only for the tiny activation stream; callers slice them
    off the output. Returns (padded_x2, real_m)."""
    m = x2.shape[0]
    if m >= 8:
        return x2, m
    return jnp.pad(x2, ((0, 8 - m), (0, 0))), m


def quantized_linear(x: jax.Array, t: QuantizedTensor,
                     bias: jax.Array | None = None, out_dtype: Any = None,
                     *, kernels: str = "auto", layer=None) -> jax.Array:
    """y = x @ dequant(t) (+ bias), dequantization fused into the matmul.

    Per-layer weights: ``t.q`` is [in, out] (structured out dims like the
    [in, 2, I] gate|up stack are flattened here, at the local use site).

    Stacked weights (``layer`` given, a traced int32): ``t.q`` is
    [L, in, out] or [L, 2, in, I] for the gate|up stack; the kernel reads
    layer-indexed blocks from the whole array via scalar prefetch. Slicing
    ``q[layer]`` instead would materialize (and, for scan xs, re-layout)
    multi-GB weight copies in HBM — measured as both the decode-throughput
    killer and an OOM at 7B (see benchmarks/bench_ops.py).
    """
    out_dtype = out_dtype or x.dtype

    if layer is None:
        if t.q.ndim > 2:
            t = QuantizedTensor(
                q=t.q.reshape(t.q.shape[0], -1),
                scale=t.scale.reshape(t.scale.shape[0], -1),
                mode=t.mode, group_size=t.group_size)
        if not use_pallas(kernels):
            return quantized_linear_xla(x, t, bias, out_dtype)

        lead = x.shape[:-1]
        k_in = x.shape[-1]
        x2 = x.reshape(-1, k_in)
        m, n = x2.shape[0], t.q.shape[1]

        if m >= _PREFILL_M and _large_m_ok(t, kernels):
            y = _large_m_linear(x2, t, None, out_dtype).reshape(*lead, n)
        else:
            plan = _plan_blocks(m, n, k_in, t,
                                out_bytes=jnp.dtype(out_dtype).itemsize)
            if plan is None:  # tiny/debug shapes: XLA path (still fused)
                return quantized_linear_xla(x, t, bias, out_dtype)
            bm, bn, bk = plan
            x2p, m_real = _pad_rows8(x2)
            y = _quantized_matmul_pallas(
                x2p, t.q, t.scale.astype(jnp.float32), t.mode, t.group_size,
                jnp.dtype(out_dtype), bm, bn, bk, pallas_interpret())
            y = y[:m_real].reshape(*lead, n)
        if bias is not None:
            y = (y.astype(jnp.float32)
                 + bias.astype(jnp.float32)).astype(out_dtype)
        return y

    # ---- stacked path ----
    structured = t.q.ndim == 4                 # [L, 2, in', I]
    if not use_pallas(kernels):
        tl = QuantizedTensor(
            q=jax.lax.dynamic_index_in_dim(t.q, layer, 0, keepdims=False),
            scale=jax.lax.dynamic_index_in_dim(t.scale, layer, 0,
                                               keepdims=False),
            mode=t.mode, group_size=t.group_size)
        if structured:                         # [2, in', I] -> two matmuls
            outs = [quantized_linear_xla(
                x, QuantizedTensor(q=tl.q[s], scale=tl.scale[s],
                                   mode=t.mode, group_size=t.group_size),
                None, out_dtype) for s in (0, 1)]
            # flat packed [gate | up] along the last axis — the layout the
            # dense path produces and silu_and_mul consumes
            y = jnp.concatenate(outs, axis=-1)
        else:
            y = quantized_linear_xla(x, tl, None, out_dtype)
        if bias is not None:
            y = (y.astype(jnp.float32)
                 + bias.astype(jnp.float32)).astype(out_dtype)
        return y

    lead = x.shape[:-1]
    k_in = x.shape[-1]
    x2 = x.reshape(-1, k_in)
    m = x2.shape[0]
    n = t.q.shape[-1]

    if m >= _PREFILL_M and _large_m_ok(t, kernels):
        y = _large_m_linear(x2, t, layer, out_dtype)
        y = y.reshape(*lead, (2 if structured else 1) * n)
        if bias is not None:
            y = (y.astype(jnp.float32)
                 + bias.astype(jnp.float32)).astype(out_dtype)
        return y

    plan = _plan_blocks(m, n, k_in, t,
                        out_bytes=jnp.dtype(out_dtype).itemsize)
    if plan is None:
        return quantized_linear(x, t, bias, out_dtype, kernels="xla",
                                layer=layer)
    bm, bn, bk = plan

    scale = t.scale.astype(jnp.float32)
    x2p, m_real = _pad_rows8(x2)
    if structured:
        out = _quantized_matmul_pallas(
            x2p, t.q, scale, t.mode, t.group_size, jnp.dtype(out_dtype),
            bm, bn, bk, pallas_interpret(), layer=layer)     # [2, m, I]
        y = jnp.concatenate([out[0][:m_real], out[1][:m_real]],
                            axis=-1).reshape(*lead, 2 * n)
    else:
        y = _quantized_matmul_pallas(
            x2p, t.q, scale, t.mode, t.group_size, jnp.dtype(out_dtype),
            bm, bn, bk, pallas_interpret(), layer=layer)
        y = y[:m_real].reshape(*lead, n)
    if bias is not None:
        y = (y.astype(jnp.float32) + bias.astype(jnp.float32)).astype(out_dtype)
    return y
