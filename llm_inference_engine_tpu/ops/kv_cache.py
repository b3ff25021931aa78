"""KV cache: a preallocated, donated, statically-shaped pytree.

Capability parity with the reference's cache machinery:
- allocation [layers, bs, kv_heads, max_seq, hs] held by the model
  (reference: src/models/llama/llama.cpp:47-69);
- prefill append ``launchConcatKVCache``
  (reference: src/kernels/concat_past_kv.cu:44-89 — writes the padded
  per-head k/v at history_len+token);
- the decode kernel's in-place single-token cache write
  (reference: src/kernels/decoder_self_attention.cu:126,172).

TPU design: **token-major layout [L, B, S, K, D]** (the reference used
head-major [layers, bs, heads, seq, hs]). Token-major is what the hardware
wants on TPU:
- the token axis S sits outside the last-two tiled (8, 128) dims, so a
  write at an arbitrary sequence position is a legal DMA (Mosaic rejects
  dynamic sublane-unaligned indices into tiled dims — head-major S is a
  tiled dim);
- one sequence's [bk, K, D] kv block is a fully contiguous HBM stream for
  the all-heads attention kernel (ops/attention.py);
- writes touch one contiguous [T, K, D] span per (layer, sequence).

The write is a Pallas kernel with ``input_output_aliases`` DMA-ing only the
new tokens' bytes: expressing it as scatter/dynamic_update_slice at the XLA
level forced a full copy of the multi-GB cache per layer whenever the
attention custom call also read it in the same scan body (measured
~850 ms/step at 7B/bs8 vs ~5 ms for the writes alone).

An int8-quantized cache variant stores values with per-(token, head) scales
[L, B, S, K] f32 (quantize-on-write, dequantize-in-kernel) — part of the
quantization goal the reference never reached (README.md:36-39).

No allocator is needed (the reference required a pooling CudaAllocator,
src/memory/allocator/cuda_allocator.h:23, because it malloc'd per forward;
here every buffer is preallocated and donated, SURVEY.md §2b).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_engine_tpu.utils import pallas_interpret, use_pallas

__all__ = ["KVCache", "new_kv_cache", "update_layer_cache",
           "update_cache_at_layer", "aligned_kv_dims"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """k/v: [L, B, S, K, D] token-major; lengths: [B] valid tokens per slot.

    Two int8-quantized variants:
    - separate scales: k_scale/v_scale [L, B, S, K] f32 per-(token, head)
      absmax scales (portable; scale writes go through XLA DUS);
    - embedded scales (``embedded_scales``): the arrays are
      [L, B, S, K+8, D] int8 (8 pad rows keep DMA slices tile-aligned) and
      row K of each token carries the scales as log2-quantized 16-bit
      codes (hi byte in lanes [0, K), low byte in lanes [K, 2K)) — values
      + scales travel in ONE aliased DMA, which is what keeps the int8
      cache at speed (separate scale arrays cannot be DMA'd to unaligned
      token positions, and XLA DUS on them forced whole-array copies per
      layer). Values are quantized against the snapped scale 2^(code/256),
      so dequantization is exact.
    """

    k: jax.Array
    v: jax.Array
    lengths: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None
    embedded_scales: bool = dataclasses.field(
        metadata=dict(static=True), default=False)

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[2]

    @property
    def num_kv_heads(self) -> int:
        return self.k.shape[3] - (EMBED_PAD if self.embedded_scales else 0)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None or self.embedded_scales


EMBED_PAD = 8  # extra rows per token (codes in the first, rest zero):
               # DMA slices need the head dim to stay a multiple of 8


def embedded_supported(num_kv_heads: int, head_dim: int) -> bool:
    """hi+lo scale bytes for all K heads must fit one D-lane row, and the
    slice/tiling rules must hold."""
    return (2 * num_kv_heads <= head_dim and num_kv_heads % 8 == 0
            and head_dim % 128 == 0)


def aligned_kv_dims(num_kv_heads: int, head_dim: int) -> tuple[int, int]:
    """(K, D) rounded up to the (8, 128) tile so per-token cache DMA slices
    and attention kv blocks are Mosaic-legal. Production Llama shapes
    (D=128, K a multiple of 8) are already aligned; small-head models
    (TinyLlama: K=4, D=64) pad — trading cache bytes for keeping the
    aliased-DMA write + Pallas attention fast path (the XLA
    dynamic_update_slice fallback costs a whole-cache copy per layer
    next to the attention custom call)."""
    from llm_inference_engine_tpu.utils import round_up
    return round_up(num_kv_heads, 8), round_up(head_dim, 128)


def new_kv_cache(num_layers: int, batch_size: int, num_kv_heads: int,
                 max_seq_len: int, head_dim: int, dtype=jnp.bfloat16,
                 quantized: bool = False,
                 embedded: Optional[bool] = None,
                 pad_to_tiles: Optional[bool] = False,
                 shard_groups: int = 1) -> KVCache:
    """``pad_to_tiles`` pads K/D up to the (8, 128) tile. None = pad when
    compiled Pallas kernels will run — ONLY for callers whose forwards go
    through models/llama.py, which zero-pads its new-token writes and
    queries to match and slices the attention output back (numerically
    identical, pinned by tests/test_padded_cache.py). The default is
    False so direct users of the low-level cache/attention ops get
    exactly the K/D they asked for.

    ``shard_groups``: allocate the head axis as that many EQUAL groups
    (the tensor-parallel shard count) with tile padding and embedded
    scale rows applied PER GROUP — so an even split over the mesh's
    model axis hands every shard a self-contained local layout
    [K/g (+pad) (+EMBED_PAD), D], identical to what a single-device
    cache of K/g heads would be. Note the ``num_kv_heads`` property is
    a LOCAL-view accessor (inside shard_map); it is not meaningful on a
    multi-group global array."""
    if num_kv_heads % shard_groups:
        raise ValueError(f"num_kv_heads {num_kv_heads} % shard_groups "
                         f"{shard_groups}")
    k_loc = num_kv_heads // shard_groups
    if pad_to_tiles is None:
        pad_to_tiles = use_pallas("auto") and not pallas_interpret()
    if pad_to_tiles:
        k_loc, head_dim = aligned_kv_dims(k_loc, head_dim)
    lengths = jnp.zeros((batch_size,), jnp.int32)
    if quantized:
        if embedded is None:
            embedded = (embedded_supported(k_loc, head_dim)
                        and use_pallas("auto") and not pallas_interpret())
        if embedded:
            shape = (num_layers, batch_size, max_seq_len,
                     shard_groups * (k_loc + EMBED_PAD), head_dim)
            return KVCache(jnp.zeros(shape, jnp.int8),
                           jnp.zeros(shape, jnp.int8), lengths,
                           embedded_scales=True)
        shape = (num_layers, batch_size, max_seq_len,
                 shard_groups * k_loc, head_dim)
        sshape = shape[:-1]
        return KVCache(jnp.zeros(shape, jnp.int8),
                       jnp.zeros(shape, jnp.int8), lengths,
                       jnp.ones(sshape, jnp.float32),
                       jnp.ones(sshape, jnp.float32))
    shape = (num_layers, batch_size, max_seq_len, shard_groups * k_loc,
             head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), lengths)


def _quantize_kv(x: jax.Array):
    """Per-(token, head) absmax int8 quantization. x: [.., T, K, D] ->
    (int8 values, [.., T, K] f32 scales)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127)
    return q.astype(jnp.int8), scale


def quantize_kv_embedded(x: jax.Array) -> jax.Array:
    """x: [B, T, K, D] -> int8 [B, T, K+EMBED_PAD, D] with row K carrying the
    per-head scales as log2-quantized 16-bit codes: scale = 2^(code/256),
    hi byte at lanes [0, K), low (unsigned) byte at lanes [K, 2K).
    Values are quantized against the snapped scale, so dequantization via
    the stored code is exact."""
    B, T, K, D = x.shape
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)    # [B,T,K]
    scale = jnp.maximum(absmax, 1e-30) / 127.0
    code = jnp.clip(jnp.round(jnp.log2(scale) * 256.0),
                    -32768, 32767).astype(jnp.int32)
    snapped = jnp.exp2(code.astype(jnp.float32) / 256.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / snapped[..., None]),
                 -127, 127).astype(jnp.int8)
    hi = jnp.right_shift(code, 8).astype(jnp.int8)               # [B,T,K]
    lo = jnp.bitwise_and(code, 255).astype(jnp.uint8).astype(jnp.int8)
    rows = jnp.zeros((B, T, EMBED_PAD, D), jnp.int8)
    rows = rows.at[..., 0, :K].set(hi).at[..., 0, K:2 * K].set(lo)
    return jnp.concatenate([q, rows], axis=2)


def decode_embedded_scales(srow, num_kv_heads: int):
    """Scale row(s) int8 [.., D] -> f32 scales [.., K]. Pure jnp math
    (exp2 + integer ops) so it runs both in Mosaic kernels and in the XLA
    golden."""
    K = num_kv_heads
    hi = srow[..., :K].astype(jnp.int32)
    lo = jnp.bitwise_and(srow[..., K:2 * K].astype(jnp.int32), 255)
    code = hi * 256 + lo
    return jnp.exp2(code.astype(jnp.float32) / 256.0)


def _update_one(cache_b, new_b, start):
    """cache_b: [S, K, D]; new_b: [T, K, D]; write at token ``start``."""
    return jax.lax.dynamic_update_slice(cache_b, new_b.astype(cache_b.dtype),
                                        (start, 0, 0))


def update_layer_cache(k_layer: jax.Array, v_layer: jax.Array,
                       new_k: jax.Array, new_v: jax.Array,
                       starts: jax.Array,
                       k_scale_layer: jax.Array | None = None,
                       v_scale_layer: jax.Array | None = None):
    """Write new tokens into one layer's cache at per-sequence offsets.

    k_layer/v_layer: [B, S, K, D] (one layer's slice, token-major)
    new_k/new_v:     [B, T, K, D] (T new tokens)
    starts:          [B] int32 write offsets (== history lengths)
    Returns updated (k_layer, v_layer[, k_scale_layer, v_scale_layer]);
    scale layers are [B, S, K].
    """
    if k_scale_layer is None:
        k_out = jax.vmap(_update_one)(k_layer, new_k, starts)
        v_out = jax.vmap(_update_one)(v_layer, new_v, starts)
        return k_out, v_out, None, None

    qk, k_sc = _quantize_kv(new_k)     # [B,T,K,D], [B,T,K]
    qv, v_sc = _quantize_kv(new_v)
    upd2 = jax.vmap(lambda c, n, s: jax.lax.dynamic_update_slice(
        c, n.astype(c.dtype), (s, 0)))
    k_out = jax.vmap(_update_one)(k_layer, qk, starts)
    v_out = jax.vmap(_update_one)(v_layer, qv, starts)
    ks_out = upd2(k_scale_layer, k_sc, starts)
    vs_out = upd2(v_scale_layer, v_sc, starts)
    return k_out, v_out, ks_out, vs_out


# ---------------------------------------------------------------------------
# Stacked-cache write (aliased Pallas DMA kernel)
# ---------------------------------------------------------------------------

def _write_kernel(starts_ref, nlen_ref, layer_ref, knew_ref, vnew_ref,
                  kin_ref, vin_ref, kout_ref, vout_ref, sem, *, T, B):
    """Single grid step: all 2B token DMAs fire concurrently, then one wait
    pass (a (B,) grid serialized start/wait per sequence measured ~70 us
    per layer-write; the copies themselves move only ~8 KB each)."""
    del kin_ref, vin_ref  # aliased with the outputs
    l = layer_ref[0]
    for b in range(B):
        @pl.when(nlen_ref[b] > 0)
        def _start(b=b):
            pos = starts_ref[b]
            pltpu.make_async_copy(
                knew_ref.at[b], kout_ref.at[l, b, pl.ds(pos, T), :, :],
                sem.at[b, 0]).start()
            pltpu.make_async_copy(
                vnew_ref.at[b], vout_ref.at[l, b, pl.ds(pos, T), :, :],
                sem.at[b, 1]).start()
    for b in range(B):
        @pl.when(nlen_ref[b] > 0)
        def _wait(b=b):
            pos = starts_ref[b]
            pltpu.make_async_copy(
                knew_ref.at[b], kout_ref.at[l, b, pl.ds(pos, T), :, :],
                sem.at[b, 0]).wait()
            pltpu.make_async_copy(
                vnew_ref.at[b], vout_ref.at[l, b, pl.ds(pos, T), :, :],
                sem.at[b, 1]).wait()


def _write_kernel_quant(starts_ref, nlen_ref, layer_ref, knew_ref, vnew_ref,
                        ks_ref, vs_ref, kin_ref, vin_ref, ksin_ref, vsin_ref,
                        kout_ref, vout_ref, ksout_ref, vsout_ref, sem, *, T):
    b = pl.program_id(0)
    del kin_ref, vin_ref, ksin_ref, vsin_ref

    @pl.when(nlen_ref[b] > 0)
    def _go():
        pos = starts_ref[b]
        l = layer_ref[0]
        copies = [
            pltpu.make_async_copy(
                knew_ref.at[0], kout_ref.at[l, b, pl.ds(pos, T), :, :],
                sem.at[0]),
            pltpu.make_async_copy(
                vnew_ref.at[0], vout_ref.at[l, b, pl.ds(pos, T), :, :],
                sem.at[1]),
            pltpu.make_async_copy(
                ks_ref.at[0], ksout_ref.at[l, b, pl.ds(pos, T), :],
                sem.at[2]),
            pltpu.make_async_copy(
                vs_ref.at[0], vsout_ref.at[l, b, pl.ds(pos, T), :],
                sem.at[3]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()


@functools.partial(jax.jit, static_argnames=("quantized",))
def _write_pallas(k, v, k_scale, v_scale, knew, vnew, ks, vs, starts,
                  new_len, layer, quantized):
    """knew/vnew: [B, T, K, D] (+ks/vs [B, T, K] when quantized)."""
    B, T, K, D = knew.shape
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    new_spec = pl.BlockSpec((1, T, K, D), lambda b, *_: (b, 0, 0, 0))
    sc_spec = pl.BlockSpec((1, T, K), lambda b, *_: (b, 0, 0))

    if quantized:
        kern = functools.partial(_write_kernel_quant, T=T)
        in_specs = [new_spec, new_spec, sc_spec, sc_spec,
                    any_spec, any_spec, any_spec, any_spec]
        inputs = (knew, vnew, ks, vs, k, v, k_scale, v_scale)
        out_shape = [jax.ShapeDtypeStruct(k.shape, k.dtype),
                     jax.ShapeDtypeStruct(v.shape, v.dtype),
                     jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                     jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)]
        out_specs = [any_spec] * 4
        # flat operand order: starts, new_len, layer, knew, vnew, ks, vs,
        # k, v, k_scale, v_scale -> cache operands at 7..10
        aliases = {7: 0, 8: 1, 9: 2, 10: 3}
        grid = (B,)
        sems = pltpu.SemaphoreType.DMA((4,))
    else:
        kern = functools.partial(_write_kernel, T=T, B=B)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2 + \
            [any_spec, any_spec]
        inputs = (knew, vnew, k, v)
        out_shape = [jax.ShapeDtypeStruct(k.shape, k.dtype),
                     jax.ShapeDtypeStruct(v.shape, v.dtype)]
        out_specs = [any_spec] * 2
        aliases = {5: 0, 6: 1}
        grid = (1,)
        sems = pltpu.SemaphoreType.DMA((B, 2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[sems],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(starts.astype(jnp.int32), new_len.astype(jnp.int32),
      jnp.asarray(layer, jnp.int32).reshape(1), *inputs)


def _update_one_at_layer(cache_b, new_b, layer, start, nlen):
    """cache_b: [L, S, K, D]; new_b: [T, K, D]; write at (layer, start).
    ``nlen == 0`` rows are a NO-OP, matching the Pallas write kernel's
    ``pl.when(nlen > 0)`` — an unconditional DUS would deposit a garbage
    window at the (clamped) start, which near a full cache lands ON the
    last valid row (found by r4 review: a CP rank with a full local log
    is never the decode owner, but the old unconditional write clobbered
    its newest token anyway)."""
    updated = jax.lax.dynamic_update_slice(
        cache_b, new_b.astype(cache_b.dtype)[None], (layer, start, 0, 0))
    return jnp.where(nlen > 0, updated, cache_b)


def update_cache_at_layer(cache: KVCache, layer, new_k: jax.Array,
                          new_v: jax.Array, starts: jax.Array,
                          new_len: jax.Array | None = None,
                          kernels: str = "auto") -> KVCache:
    """Write new tokens for one layer straight into the stacked 5-D cache.

    cache.k/v: [L, B, S, K, D]; new_k/new_v: [B, T, K, D]; layer: traced
    int32 scalar; starts: [B] per-sequence write offsets; new_len: [B]
    valid new tokens per sequence (rows with 0 skip their write entirely;
    defaults to all-T).

    On TPU this runs as the aliased Pallas DMA kernel (see module
    docstring); off-TPU (interpret mode) it falls back to vmapped
    dynamic_update_slice. The capability contract is the reference's
    launchConcatKVCache / in-kernel cache write (concat_past_kv.cu:44-89,
    decoder_self_attention.cu:126,172).
    """
    if new_len is None:
        new_len = jnp.full(starts.shape, new_k.shape[1], jnp.int32)
    # clamp so the T-token window never runs past the cache (same semantics
    # as dynamic_update_slice; callers must keep real tokens in range)
    starts = jnp.minimum(starts.astype(jnp.int32),
                         cache.k.shape[2] - new_k.shape[1])

    if cache.embedded_scales:
        # quantize + pack values and scale codes into one [B,T,K+1,D] int8
        # array per side; from here the write is the plain (unquantized)
        # path — one aliased DMA per sequence carries values AND scales
        qk = quantize_kv_embedded(new_k)
        qv = quantize_kv_embedded(new_v)
        K, D = new_k.shape[2], new_k.shape[3]
        pallas_ok = (use_pallas(kernels) and not pallas_interpret()
                     and D % 128 == 0 and K % 8 == 0)
        if pallas_ok:
            k, v = _write_pallas(cache.k, cache.v, None, None, qk, qv,
                                 None, None, starts, new_len, layer,
                                 quantized=False)
            return dataclasses.replace(cache, k=k, v=v)
        upd = jax.vmap(_update_one_at_layer, in_axes=(1, 0, None, 0, 0),
                       out_axes=1)
        return dataclasses.replace(
            cache,
            k=upd(cache.k, qk, layer, starts, new_len),
            v=upd(cache.v, qv, layer, starts, new_len))

    # the DMA slices (T, K, D) spans; Mosaic requires the trailing tiled
    # dims be tile-aligned (K % 8, D % 128) — true for every production
    # Llama shape (D=128); small debug/tiny models fall back to DUS
    K, D = new_k.shape[2], new_k.shape[3]
    pallas_ok = (use_pallas(kernels) and not pallas_interpret()
                 and D % 128 == 0 and K % 8 == 0)

    if cache.quantized:
        qk, k_sc = _quantize_kv(new_k)     # [B,T,K,D], [B,T,K]
        qv, v_sc = _quantize_kv(new_v)
        upd2 = jax.vmap(
            lambda c, n, l, s, nl: jnp.where(
                nl > 0,
                jax.lax.dynamic_update_slice(
                    c, n.astype(c.dtype)[None], (l, s, 0)),
                c),
            in_axes=(1, 0, None, 0, 0), out_axes=1)
        if pallas_ok:
            # int8 values ride the aliased DMA kernel; the [L, B, S, K]
            # scale arrays cannot (their token axis sits in the tiled
            # last-two dims, and Mosaic rejects unaligned dynamic slices
            # there), so they go through XLA DUS. The scale arrays are
            # D/4-times smaller than the values, bounding the copy cost.
            # TODO: embed the K f32 scales as one extra int8 "head row"
            # (K*4 bytes == D for D=128) so one DMA carries both.
            k, v = _write_pallas(
                cache.k, cache.v, None, None, qk, qv, None, None,
                starts, new_len, layer, quantized=False)
            return dataclasses.replace(
                cache, k=k, v=v,
                k_scale=upd2(cache.k_scale, k_sc, layer, starts,
                             new_len),
                v_scale=upd2(cache.v_scale, v_sc, layer, starts,
                             new_len))
        upd = jax.vmap(_update_one_at_layer, in_axes=(1, 0, None, 0, 0),
                       out_axes=1)
        return dataclasses.replace(
            cache,
            k=upd(cache.k, qk, layer, starts, new_len),
            v=upd(cache.v, qv, layer, starts, new_len),
            k_scale=upd2(cache.k_scale, k_sc, layer, starts, new_len),
            v_scale=upd2(cache.v_scale, v_sc, layer, starts, new_len))

    if pallas_ok:
        k, v = _write_pallas(
            cache.k, cache.v, None, None,
            new_k.astype(cache.k.dtype), new_v.astype(cache.v.dtype),
            None, None, starts, new_len, layer, quantized=False)
        return dataclasses.replace(cache, k=k, v=v)
    upd = jax.vmap(_update_one_at_layer, in_axes=(1, 0, None, 0, 0),
                   out_axes=1)
    return dataclasses.replace(
        cache,
        k=upd(cache.k, new_k, layer, starts, new_len),
        v=upd(cache.v, new_v, layer, starts, new_len))
