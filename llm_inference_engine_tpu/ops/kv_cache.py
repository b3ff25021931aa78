"""KV cache: a preallocated, donated, statically-shaped pytree.

Capability parity with the reference's cache machinery:
- allocation [layers, bs, kv_heads, max_seq, hs] held by the model
  (reference: src/models/llama/llama.cpp:47-69);
- prefill append ``launchConcatKVCache``
  (reference: src/kernels/concat_past_kv.cu:44-89 — writes the padded
  per-head k/v at history_len+token);
- the decode kernel's in-place single-token cache write
  (reference: src/kernels/decoder_self_attention.cu:126,172).

TPU design: layout [L, B, K, S, D] (lane dim = head_dim, seq on sublanes —
the natural tiling for the attention kernel's [bk, D] blocks). Updates are
per-sequence ``dynamic_update_slice`` under vmap, which XLA lowers to an
in-place scatter when the cache buffer is donated into the jitted step —
no allocator needed (the reference needed a pooling CudaAllocator,
src/memory/allocator/cuda_allocator.h:23, because it malloc'd per forward;
here every buffer is preallocated and donated, SURVEY.md §2b).

An int8-quantized cache variant stores values with per-(token, head) scales
(quantize-on-write, dequantize-in-kernel) — part of the quantization goal
the reference never reached (README.md:36-39).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["KVCache", "new_kv_cache", "update_layer_cache"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """k/v: [L, B, K, S, D]; lengths: [B] valid tokens per slot.

    When quantized (int8 storage), k_scale/v_scale are [L, B, K, S, 1] f32
    per-token-per-head absmax scales; otherwise None.
    """

    k: jax.Array
    v: jax.Array
    lengths: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def new_kv_cache(num_layers: int, batch_size: int, num_kv_heads: int,
                 max_seq_len: int, head_dim: int, dtype=jnp.bfloat16,
                 quantized: bool = False) -> KVCache:
    shape = (num_layers, batch_size, num_kv_heads, max_seq_len, head_dim)
    store_dtype = jnp.int8 if quantized else dtype
    k = jnp.zeros(shape, store_dtype)
    v = jnp.zeros(shape, store_dtype)
    lengths = jnp.zeros((batch_size,), jnp.int32)
    if quantized:
        sshape = (num_layers, batch_size, num_kv_heads, max_seq_len, 1)
        return KVCache(k, v, lengths, jnp.ones(sshape, jnp.float32),
                       jnp.ones(sshape, jnp.float32))
    return KVCache(k, v, lengths)


def _quantize_kv(x: jax.Array):
    """Per-(head, token) absmax int8 quantization. x: [K, S, D]."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _update_one(cache_kl, new_k, start):
    """cache_kl: [K, S, D]; new_k: [K, T, D]; start: scalar."""
    return jax.lax.dynamic_update_slice(cache_kl, new_k.astype(cache_kl.dtype),
                                        (0, start, 0))


def update_layer_cache(k_layer: jax.Array, v_layer: jax.Array,
                       new_k: jax.Array, new_v: jax.Array,
                       starts: jax.Array,
                       k_scale_layer: jax.Array | None = None,
                       v_scale_layer: jax.Array | None = None):
    """Write new tokens into one layer's cache at per-sequence offsets.

    k_layer/v_layer: [B, K, S, D] (one layer's slice)
    new_k/new_v:     [B, T, K, D] (T new tokens)
    starts:          [B] int32 write offsets (== history lengths)
    Returns updated (k_layer, v_layer[, k_scale_layer, v_scale_layer]).
    """
    new_k = jnp.swapaxes(new_k, 1, 2)  # [B, K, T, D]
    new_v = jnp.swapaxes(new_v, 1, 2)
    if k_scale_layer is None:
        k_out = jax.vmap(_update_one)(k_layer, new_k, starts)
        v_out = jax.vmap(_update_one)(v_layer, new_v, starts)
        return k_out, v_out, None, None

    qk, k_sc = jax.vmap(_quantize_kv)(new_k)   # [B,K,T,D], [B,K,T,1]
    qv, v_sc = jax.vmap(_quantize_kv)(new_v)
    k_out = jax.vmap(_update_one)(k_layer, qk, starts)
    v_out = jax.vmap(_update_one)(v_layer, qv, starts)
    ks_out = jax.vmap(_update_one)(k_scale_layer, k_sc, starts)
    vs_out = jax.vmap(_update_one)(v_scale_layer, v_sc, starts)
    return k_out, v_out, ks_out, vs_out
