"""Unit tests: KV cache update at per-sequence offsets.

Mirrors reference tests/unit_tests/test_concat_past_kv.cu (print-and-inspect
in the reference, test_concat_past_kv.cu:13 — upgraded to asserts).
"""

import numpy as np
import jax.numpy as jnp

from llm_inference_engine_tpu.ops.kv_cache import (
    KVCache, new_kv_cache, update_layer_cache)


def test_update_layer_cache_offsets(rng):
    B, K, S, D, T = 3, 2, 32, 16, 5
    k_layer = jnp.zeros((B, S, K, D), jnp.float32)
    v_layer = jnp.zeros((B, S, K, D), jnp.float32)
    new_k = jnp.asarray(rng.normal(size=(B, T, K, D)).astype(np.float32))
    new_v = jnp.asarray(rng.normal(size=(B, T, K, D)).astype(np.float32))
    starts = jnp.asarray(np.array([0, 7, 20], np.int32))

    k_out, v_out, _, _ = update_layer_cache(k_layer, v_layer, new_k, new_v,
                                            starts)
    k_np, nk = np.asarray(k_out), np.asarray(new_k)
    for b, s in enumerate([0, 7, 20]):
        np.testing.assert_array_equal(k_np[b, s:s + T], nk[b])
        # untouched elsewhere
        assert (k_np[b, :s] == 0).all()
        assert (k_np[b, s + T:] == 0).all()


def test_quantized_cache_roundtrip(rng):
    B, K, S, D, T = 1, 2, 16, 32, 4
    c = new_kv_cache(1, B, K, S, D, quantized=True)
    assert c.quantized and c.k.dtype == jnp.int8
    new_k = jnp.asarray(rng.normal(size=(B, T, K, D)).astype(np.float32))
    new_v = jnp.asarray(rng.normal(size=(B, T, K, D)).astype(np.float32))
    starts = jnp.asarray(np.array([3], np.int32))
    k_out, v_out, ks, vs = update_layer_cache(
        c.k[0], c.v[0], new_k, new_v, starts, c.k_scale[0], c.v_scale[0])
    deq = np.asarray(k_out, np.float32) * np.asarray(ks)[..., None]
    want = np.asarray(new_k)[0]
    np.testing.assert_allclose(deq[0, 3:3 + T], want, atol=0.02)


def test_new_cache_shapes():
    c = new_kv_cache(4, 2, 8, 64, 128, dtype=jnp.bfloat16)
    assert c.k.shape == (4, 2, 64, 8, 128)
    assert c.num_layers == 4 and c.batch_size == 2 and c.max_seq_len == 64
    assert not c.quantized
