"""Unit tests: MXU block-diagonal decode attention (ops/attention.py).

The decode (Sq == 1) kernel feeds the kv stream to the MXU via a
block-diagonal query matrix — these tests pin its routing (aligned shapes
only) and its numerics against the XLA golden across MHA/GQA, plain and
layered caches, separate-scale int8 and embedded-scale int8. Tolerances
are bf16-dot level: the kernel's score/value dots run on the MXU in
bf16/int8 (same precision class as the prefill MXU path), while the
golden computes in f32.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_engine_tpu.ops.attention import (
    attention, attention_xla, can_decode_mxu)
from llm_inference_engine_tpu.ops.kv_cache import quantize_kv_embedded

TOL = dict(atol=2e-2, rtol=2e-2)


def test_routing_gate():
    assert can_decode_mxu((2, 1, 32, 128), 32, 128)        # 7B MHA
    assert can_decode_mxu((2, 1, 32, 128), 8, 128)         # Mistral GQA
    assert not can_decode_mxu((2, 2, 32, 128), 32, 128)    # Sq > 1
    assert not can_decode_mxu((2, 1, 4, 64), 4, 64)        # unaligned
    assert not can_decode_mxu((2, 1, 32, 128), 2, 128)     # Kst % 8


@pytest.mark.parametrize("K,G", [(8, 1), (8, 4), (16, 2)])
def test_mxu_decode_matches_xla(rng, K, G):
    B, D, S = 2, 128, 48
    H = K * G
    q = rng.normal(size=(B, 1, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, K, D)).astype(np.float32)
    v = rng.normal(size=(B, S, K, D)).astype(np.float32)
    qs = np.array([5, S - 1], np.int32)
    kl = qs + 1

    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(qs), jnp.asarray(kl))
    want = np.asarray(attention_xla(*args))
    got = np.asarray(attention(*args, kernels="pallas", block_kv=16))
    np.testing.assert_allclose(got, want, **TOL)


def test_mxu_decode_layered_with_watermark(rng):
    L, B, K, G, D, S = 3, 2, 8, 2, 128, 64
    H = K * G
    q = rng.normal(size=(B, 1, H, D)).astype(np.float32)
    k = rng.normal(size=(L, B, S, K, D)).astype(np.float32)
    v = rng.normal(size=(L, B, S, K, D)).astype(np.float32)
    qs = np.array([3, 30], np.int32)
    kl = qs + 1
    ly = jnp.asarray(2, jnp.int32)

    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(qs), jnp.asarray(kl))
    want = np.asarray(attention_xla(*args, layer=ly))
    got = np.asarray(attention(*args, kernels="pallas", layer=ly,
                               block_kv=16, kv_hi=32))
    np.testing.assert_allclose(got, want, **TOL)


def test_mxu_decode_separate_scale_int8(rng):
    B, K, G, D, S = 2, 8, 2, 128, 32
    H = K * G
    q = rng.normal(size=(B, 1, H, D)).astype(np.float32)
    kq = rng.integers(-127, 128, size=(B, S, K, D)).astype(np.int8)
    vq = rng.integers(-127, 128, size=(B, S, K, D)).astype(np.int8)
    ks = (rng.random((B, S, K)).astype(np.float32) * 0.02 + 0.001)
    vs = (rng.random((B, S, K)).astype(np.float32) * 0.02 + 0.001)
    qs = np.array([10, 31], np.int32)
    kl = qs + 1

    args = (jnp.asarray(q), jnp.asarray(kq), jnp.asarray(vq),
            jnp.asarray(qs), jnp.asarray(kl))
    kw = dict(k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs))
    want = np.asarray(attention_xla(*args, **kw))
    got = np.asarray(attention(*args, kernels="pallas", block_kv=16, **kw))
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("G", [1, 2])
def test_mxu_decode_embedded_int8(rng, G):
    B, K, D, S = 2, 8, 128, 32
    H = K * G
    q = rng.normal(size=(B, 1, H, D)).astype(np.float32)
    kf = rng.normal(size=(B, S, K, D)).astype(np.float32)
    vf = rng.normal(size=(B, S, K, D)).astype(np.float32)
    pk = quantize_kv_embedded(jnp.asarray(kf))
    pv = quantize_kv_embedded(jnp.asarray(vf))
    qs = np.array([4, 20], np.int32)
    kl = qs + 1

    args = (jnp.asarray(q), pk, pv, jnp.asarray(qs), jnp.asarray(kl))
    want = np.asarray(attention_xla(*args, embedded_kv=True))
    got = np.asarray(attention(*args, kernels="pallas", block_kv=16,
                               embedded_kv=True))
    np.testing.assert_allclose(got, want, **TOL)


def test_fused_mxu_decode_write_and_attend(rng):
    """The fused write+attend kernel (interpret mode): cache gains the new
    token AND the output attends history + current, for bf16 and embedded
    caches, MHA and GQA."""
    from llm_inference_engine_tpu.ops.attention import (
        attention_decode_fused_mxu)
    from llm_inference_engine_tpu.ops import kv_cache as kvc

    L, B, K, G, D, S = 2, 2, 8, 2, 128, 32
    H = K * G
    q = rng.normal(size=(B, 1, H, D)).astype(np.float32)
    kc = rng.normal(size=(L, B, S, K, D)).astype(np.float32)
    vc = rng.normal(size=(L, B, S, K, D)).astype(np.float32)
    kn = rng.normal(size=(B, 1, K, D)).astype(np.float32)
    vn = rng.normal(size=(B, 1, K, D)).astype(np.float32)
    hist = np.array([6, 17], np.int32)
    kv_len = hist + 1
    ly = jnp.asarray(1, jnp.int32)

    out, k2, v2 = attention_decode_fused_mxu(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(hist), jnp.asarray(kv_len), ly, block_kv=16)

    # cache must contain the new token at position hist (written layer only)
    k2 = np.asarray(k2)
    for b in range(B):
        np.testing.assert_allclose(k2[1, b, hist[b]], kn[b, 0], atol=1e-6)
    np.testing.assert_allclose(k2[0], kc[0], atol=0)       # other layer untouched

    # output == golden attention over the updated cache
    want = np.asarray(attention_xla(
        jnp.asarray(q), jnp.asarray(k2), jnp.asarray(np.asarray(v2)),
        jnp.asarray(hist), jnp.asarray(kv_len), layer=ly))
    np.testing.assert_allclose(np.asarray(out), want, **TOL)



def test_fused_decode_gate_covers_production_configs():
    """Every shipped model preset (with the engine's tile-padded cache
    where needed) must satisfy the fused MXU write+attend decode path's
    SHAPE gate — a False gate silently falls back to the slower
    write-then-attend chain (the silent-fallback class of the r4 13B
    matmul cliff). The backend half of the gate is environment-dependent
    and tested on hardware."""
    from llm_inference_engine_tpu.config import PRESETS
    from llm_inference_engine_tpu.ops import kv_cache as kvc
    from llm_inference_engine_tpu.ops.attention import fuse_decode_shapes_ok

    for name, cfg in PRESETS.items():
        if name == "debug":
            continue
        for kv_int8 in (False, True):
            # the engine pads small-head models up to the (8, 128) tile
            cache = kvc.new_kv_cache(
                2, 8, cfg.num_kv_heads, 64, cfg.head_dim,
                quantized=kv_int8, embedded=kv_int8 or None,
                pad_to_tiles=True)
            Kc, Dc = cache.num_kv_heads, cache.k.shape[-1]
            q_shape = (8, 1, Kc * (cfg.num_heads // cfg.num_kv_heads), Dc)
            assert fuse_decode_shapes_ok(q_shape, cache), (
                name, kv_int8, q_shape, cache.k.shape)
