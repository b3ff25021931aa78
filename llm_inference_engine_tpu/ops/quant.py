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
- INT4: two 4-bit values packed per int8 byte along the contraction axis,
  with grouped scales s: [in/group, out] f32. The kernel's K-block equals
  the group size, so each grid step unpacks one group (sign-extend via
  arithmetic shifts on the VPU), dots it, scales the partial product, and
  accumulates in f32 scratch.

The matmul grid is (M/bm, N/bn, K/bk) with K innermost and an f32 VMEM
accumulator — XLA-style blocking, hand-held only where XLA has no native
int4-grouped-dequant fusion.
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


def _pack_int4(qvals: jax.Array, group_size: int) -> jax.Array:
    """[in, out] int8 in [-8, 7] -> [in//2, out] packed.

    Packing is *concat-friendly*: within each scale group of ``group_size``
    rows, the low nibbles hold rows [0, gs/2) and the high nibbles rows
    [gs/2, gs). In-kernel unpacking is then two sign-extending shifts and a
    sublane concat — no row interleave (Mosaic has no cheap interleave or
    i8 vector shifts; everything is done in i32)."""
    k, n = qvals.shape
    half = group_size // 2
    qg = qvals.reshape(k // group_size, group_size, n)
    lo = qg[:, :half].astype(jnp.uint8) & 0xF
    hi = (qg[:, half:].astype(jnp.uint8) & 0xF) << 4
    return (lo | hi).astype(jnp.int8).reshape(k // 2, n)


def _unpack_int4_block(packed_block: jax.Array, dtype) -> jax.Array:
    """One group's packed block [gs/2, n] -> [gs, n] in ``dtype``
    (Mosaic-safe: i32 shifts + axis-0 concat)."""
    b = packed_block.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(b, 28), 28)     # sign-extend low nibble
    hi = jnp.right_shift(b, 4)                          # high nibble (already signed)
    return jnp.concatenate([lo, hi], axis=0).astype(dtype)


def _unpack_int4(packed: jax.Array, group_size: int) -> jax.Array:
    """[in//2, out] packed -> [in, out] int8 (host/golden path)."""
    k2, n = packed.shape
    half = group_size // 2
    pg = packed.reshape(k2 // half, half, n)
    b = pg.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(b, 28), 28)
    hi = jnp.right_shift(b, 4)
    out = jnp.concatenate([lo, hi], axis=1)             # [G, gs, n]
    return out.reshape(k2 * 2, n).astype(jnp.int8)


def quantize_tensor(w: jax.Array, mode: str = "int8",
                    group_size: int = 128) -> QuantizedTensor:
    """Quantize a [in, out] weight (absmax, symmetric)."""
    w = w.astype(jnp.float32)
    k, n = w.shape
    if mode == "int8":
        absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)        # [1, out]
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return QuantizedTensor(q=q, scale=scale, mode="int8",
                               group_size=group_size)
    if mode == "int4":
        if k % group_size != 0:
            raise ValueError(f"in dim {k} not divisible by group {group_size}")
        wg = w.reshape(k // group_size, group_size, n)
        absmax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)       # [G,1,N]
        scale = jnp.maximum(absmax, 1e-8) / 7.0
        q = jnp.clip(jnp.round(wg / scale), -8, 7).astype(jnp.int8)
        q = q.reshape(k, n)
        return QuantizedTensor(q=_pack_int4(q, group_size), scale=scale[:, 0, :],
                               mode="int4", group_size=group_size)
    raise ValueError(f"unknown quant mode {mode!r}")


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
# Pallas fused dequant-matmul kernels
# ---------------------------------------------------------------------------

def _int8_matmul_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, num_k_blocks):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = q_ref[:].astype(x.dtype)                   # int8 -> compute dtype in VMEM
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ik == num_k_blocks - 1)
    def _fin():
        o_ref[:] = (acc_ref[:] * s_ref[0, :][None, :]).astype(o_ref.dtype)


def _int4_matmul_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, num_k_blocks):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                                    # [bm, bk]
    w = _unpack_int4_block(q_ref[:], x.dtype)       # [bk, bn]
    part = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[:] += part * s_ref[0, 0, :][None, :]    # one group per K block

    @pl.when(ik == num_k_blocks - 1)
    def _fin():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "group_size", "out_dtype", "bm", "bn", "bk",
                     "interpret"))
def _quantized_matmul_pallas(x2, q, scale, mode, group_size, out_dtype,
                             bm, bn, bk, interpret):
    m, k = x2.shape
    n = q.shape[1]
    nm, nn, nk = cdiv(m, bm), cdiv(n, bn), cdiv(k, bk)

    if mode == "int8":
        kern = functools.partial(_int8_matmul_kernel, num_k_blocks=nk)
        q_spec = pl.BlockSpec((bk, bn), lambda i, j, l: (l, j),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, bn), lambda i, j, l: (0, j),
                              memory_space=pltpu.VMEM)
    else:
        kern = functools.partial(_int4_matmul_kernel, num_k_blocks=nk)
        q_spec = pl.BlockSpec((bk // 2, bn), lambda i, j, l: (l, j),
                              memory_space=pltpu.VMEM)
        # one scale group per K block (bk == group_size); scale arrives as
        # [groups, 1, n] so the (1, 1, bn) block satisfies TPU tiling rules
        scale = scale.reshape(scale.shape[0], 1, scale.shape[1])
        s_spec = pl.BlockSpec((1, 1, bn), lambda i, j, l: (l, 0, j),
                              memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, l: (i, l),
                         memory_space=pltpu.VMEM),
            q_spec,
            s_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x2, q, scale)


def quantized_linear(x: jax.Array, t: QuantizedTensor,
                     bias: jax.Array | None = None, out_dtype: Any = None,
                     *, kernels: str = "auto") -> jax.Array:
    """y = x @ dequant(t) (+ bias), dequantization fused into the matmul.

    ``t.q`` may carry structured out dims (e.g. [in, 2, I] for the gate|up
    stack, kept structured so tensor-parallel sharding splits the I axis,
    not the packed 2I axis) — flattened to 2-D here, at the local use site.
    """
    out_dtype = out_dtype or x.dtype
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

    if t.mode == "int4":
        bk = t.group_size
    else:
        bk = k_in if k_in <= 512 else 512
    bm = m if m <= 256 else 256
    bn = n if n <= 512 else 512

    def tile_ok(block, full, lane=False):
        """Mosaic block rule: last two dims divisible by (8, 128) or equal
        to the full array dim."""
        return block == full or block % (128 if lane else 8) == 0

    feasible = (tile_ok(bm, m) and tile_ok(bn, n, lane=True)
                and tile_ok(bk, k_in, lane=True)
                and (t.mode != "int4" or tile_ok(bk // 2, t.q.shape[0])))
    if not feasible:  # tiny/debug shapes: XLA path (still fused by XLA)
        return quantized_linear_xla(x, t, bias, out_dtype)
    y = _quantized_matmul_pallas(
        x2, t.q, t.scale.astype(jnp.float32), t.mode, t.group_size,
        jnp.dtype(out_dtype), bm, bn, bk, pallas_interpret())
    y = y.reshape(*lead, n)
    if bias is not None:
        y = (y.astype(jnp.float32) + bias.astype(jnp.float32)).astype(out_dtype)
    return y
