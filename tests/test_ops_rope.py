"""Unit tests: RoPE and the fused QKV-split+RoPE.

Mirrors reference tests/unit_tests/test_qkv_bias_and_rope.cu (CPU RoPE
golden, test_qkv_bias_and_rope.cu:14-60) and the decode-path rope of
src/kernels/rope.cu. Verifies the exact half-split rotation at arbitrary
absolute positions (history offsets).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from llm_inference_engine_tpu.ops.rope import (
    apply_rope, apply_rope_xla, split_qkv_rope, split_qkv_rope_xla)


def np_rope(x, positions, theta):
    """x: [T, H, D]; positions: [T]."""
    T, H, D = x.shape
    half = D // 2
    inv = 1.0 / (theta ** (np.arange(half) * 2.0 / D))
    ang = positions[:, None].astype(np.float64) * inv       # [T, half]
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                          axis=-1)


@pytest.mark.parametrize("T,H,D,offset", [(16, 4, 64, 0), (9, 2, 128, 37)])
def test_apply_rope_matches_numpy(rng, T, H, D, offset):
    x = rng.normal(size=(T, H, D)).astype(np.float32)
    pos = np.arange(T, dtype=np.int32) + offset
    got = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos),
                                kernels="pallas"))
    want = np_rope(x, pos, 10000.0)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_split_qkv_rope_matches_xla(rng):
    T, H, K, D = 13, 8, 2, 64
    qkv = jnp.asarray(rng.normal(size=(T, (H + 2 * K) * D)).astype(np.float32))
    pos = jnp.arange(T, dtype=jnp.int32) + 5
    q1, k1, v1 = split_qkv_rope(qkv, pos, H, K, D, kernels="pallas")
    q2, k2, v2 = split_qkv_rope_xla(qkv, pos, H, K, D)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_rope_decode_step_matches_prefill(rng):
    """A single-token rope at position p equals row p of a batch rope —
    the prefill/decode split must agree (reference rope.cu vs
    qkv_bias_and_rope.cu consistency)."""
    H, D, T = 4, 64, 12
    x = rng.normal(size=(T, H, D)).astype(np.float32)
    pos = np.arange(T, dtype=np.int32)
    full = np.asarray(apply_rope_xla(jnp.asarray(x), jnp.asarray(pos)))
    for p in (0, 5, 11):
        one = np.asarray(apply_rope_xla(jnp.asarray(x[p:p + 1]),
                                        jnp.asarray(pos[p:p + 1])))
        np.testing.assert_allclose(one[0], full[p], atol=1e-6)
