"""Functional Llama-class decoder forward pass.

Capability parity with the reference's layer/model compute tier:
- the per-layer sandwich rmsnorm -> attention -> add+rmsnorm -> ffn -> add
  (reference: src/layers/includes/context_decoder.h,
  context_decoder.cpp:127-190 and self_decoder.cpp:69-119);
- prefill vs decode as the same dataflow at different query lengths
  (reference splits them into LlamaContextAttentionLayer /
  LlamaSelfAttentionLayer + two decoder classes; here one function serves
  both — the attention kernel is length-agnostic);
- LM head on the last valid token only (reference: llama.cpp:260-318
  slices the final token before the lm_head GEMM).

TPU design: the 32-layer loop is a single ``lax.scan`` over stacked layer
weights (one compiled layer body — the reference recompiled nothing but
re-launched ~15 kernels per layer per step); the KV cache flows through the
scan as per-layer xs/ys so the whole cache updates functionally and XLA
aliases it in place under buffer donation.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from llm_inference_engine_tpu.config import EngineConfig, ModelConfig
from llm_inference_engine_tpu.ops import kv_cache as kvc
from llm_inference_engine_tpu.ops.activations import silu_and_mul, add_residual
from llm_inference_engine_tpu.ops.attention import attention
from llm_inference_engine_tpu.ops.embedding import embedding_lookup
from llm_inference_engine_tpu.ops.linear import linear
from llm_inference_engine_tpu.ops.rmsnorm import rmsnorm, add_residual_rmsnorm
from llm_inference_engine_tpu.ops.rope import split_qkv_rope

__all__ = ["decoder_forward", "forward_hidden", "lm_head_logits"]


def _layer_step(cfg: ModelConfig, eng: EngineConfig, x, layer, k_layer,
                v_layer, positions, q_start, kv_len, model_axis=None,
                ks_layer=None, vs_layer=None):
    """One decoder layer. x: [B, T, H]; k/v_layer: [B, K, S, D].

    Kernel sequence mirrors the reference contract
    (context_attention.cpp:144-304, ffn.cpp:77-140, self_decoder.cpp:69-119).

    Under tensor parallelism (``model_axis`` set, used inside shard_map) the
    row-sharded o/down projections produce partial sums reduced with one
    psum each — the two ICI all-reduces per layer of Megatron-style TP.
    """
    kernels = eng.kernels
    B, T, _ = x.shape

    def reduce_partial(y):
        if model_axis is None:
            return y
        return jax.lax.psum(y, model_axis)

    # pre-attention rmsnorm (residual = x itself; the reference's rmsnorm
    # copies input to a residual buffer, rmsnorm.cu:55 — functionally free here)
    h_norm = rmsnorm(x, layer["attn_norm"], cfg.rms_norm_eps, kernels=kernels)

    # fused QKV projection (packed, layer_weights.cpp:28)
    qkv = linear(h_norm, layer["wqkv"], kernels=kernels)
    q, k_new, v_new = split_qkv_rope(
        qkv, positions, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
        cfg.rope_theta, cfg.rope_scaling, kernels=kernels)

    # cache write before attend (decoder_self_attention.cu:126,172 semantics)
    k_layer, v_layer, ks_layer, vs_layer = kvc.update_layer_cache(
        k_layer, v_layer, k_new, v_new, q_start, ks_layer, vs_layer)

    attn_out = attention(q, k_layer, v_layer, q_start, kv_len,
                         causal=True, block_q=eng.block_q,
                         block_kv=eng.block_kv, kernels=kernels,
                         k_scale=ks_layer, v_scale=vs_layer)
    attn_out = attn_out.reshape(B, T, cfg.q_size)
    attn_out = reduce_partial(linear(attn_out, layer["wo"], kernels=kernels))

    # fused add-residual + rmsnorm into the FFN (add_residual_and_rmsnorm.cu)
    ffn_in, resid = add_residual_rmsnorm(
        attn_out, x, layer["ffn_norm"], cfg.rms_norm_eps, kernels=kernels)

    # FFN: packed gate|up matmul -> SwiGLU -> down (ffn.cpp:105-132)
    gate_up = linear(ffn_in, layer["w_gate_up"], kernels=kernels)
    act = silu_and_mul(gate_up, kernels=kernels)
    down = reduce_partial(linear(act, layer["w_down"], kernels=kernels))

    x_out = add_residual(down, resid, kernels=kernels)
    return x_out, k_layer, v_layer, ks_layer, vs_layer


def decoder_forward(cfg: ModelConfig, eng: EngineConfig, params, token_ids,
                    cache: kvc.KVCache, q_start, kv_len, model_axis=None):
    """Run all decoder layers. Returns (hidden [B,T,H], updated KVCache).

    token_ids: [B, T] int32 (prefill: padded prompt chunk; decode: T=1)
    q_start:   [B] write/attend offset (history length per slot)
    kv_len:    [B] total valid kv after this call (q_start + actual new)
    """
    B, T = token_ids.shape
    positions = q_start[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]

    x = embedding_lookup(params["embed"], token_ids, kernels=eng.kernels)
    x = x.astype(cfg.dtype)

    if cache.quantized:
        def body(x_carry, xs):
            layer, k_layer, v_layer, ks_layer, vs_layer = xs
            x_out, k_out, v_out, ks_out, vs_out = _layer_step(
                cfg, eng, x_carry, layer, k_layer, v_layer, positions,
                q_start, kv_len, model_axis=model_axis, ks_layer=ks_layer,
                vs_layer=vs_layer)
            return x_out, (k_out, v_out, ks_out, vs_out)

        x, (k_cache, v_cache, ks_cache, vs_cache) = jax.lax.scan(
            body, x, (params["layers"], cache.k, cache.v, cache.k_scale,
                      cache.v_scale))
        new_cache = kvc.KVCache(k=k_cache, v=v_cache, lengths=kv_len,
                                k_scale=ks_cache, v_scale=vs_cache)
    else:
        def body(x_carry, xs):
            layer, k_layer, v_layer = xs
            x_out, k_out, v_out, _, _ = _layer_step(
                cfg, eng, x_carry, layer, k_layer, v_layer, positions,
                q_start, kv_len, model_axis=model_axis)
            return x_out, (k_out, v_out)

        x, (k_cache, v_cache) = jax.lax.scan(
            body, x, (params["layers"], cache.k, cache.v))
        new_cache = kvc.KVCache(k=k_cache, v=v_cache, lengths=kv_len)

    x = rmsnorm(x, params["final_norm"], cfg.rms_norm_eps, kernels=eng.kernels)
    return x, new_cache


def lm_head_logits(cfg: ModelConfig, eng: EngineConfig, params, hidden_last):
    """hidden_last: [B, H] -> logits [B, V] (f32)."""
    return linear(hidden_last, params["lm_head"], out_dtype=jnp.float32,
                  kernels=eng.kernels)


def forward_hidden(cfg: ModelConfig, eng: EngineConfig, params, token_ids,
                   cache, q_start, kv_len):
    """decoder_forward + last-valid-token slice -> (logits [B,V], cache).

    The last valid token of sequence b sits at padded index
    kv_len[b]-q_start[b]-1 (reference slices it at llama.cpp:264-269).
    """
    hidden, cache = decoder_forward(cfg, eng, params, token_ids, cache,
                                    q_start, kv_len)
    B, T, H = hidden.shape
    last_idx = jnp.clip(kv_len - q_start - 1, 0, T - 1)           # [B]
    hidden_last = jnp.take_along_axis(
        hidden, last_idx[:, None, None], axis=1)[:, 0]            # [B, H]
    logits = lm_head_logits(cfg, eng, params, hidden_last)
    return logits, cache
