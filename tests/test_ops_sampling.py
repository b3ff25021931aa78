"""Unit tests: top-K selection + sampling tail.

Mirrors reference tests/unit_tests/test_topk.cu and test_sampling.cu
(print-and-inspect there, topk.cu:12-15 — upgraded to statistical asserts).
"""

import numpy as np
import jax
import jax.numpy as jnp

from llm_inference_engine_tpu.ops.sampling import (
    greedy_sample, sample_top_k, top_k_logits)


def test_top_k_matches_numpy(rng):
    logits = rng.normal(size=(4, 1000)).astype(np.float32)
    vals, idx = top_k_logits(jnp.asarray(logits), 5)
    want = np.sort(logits, axis=-1)[:, ::-1][:, :5]
    np.testing.assert_allclose(np.asarray(vals), want, atol=1e-6)


def test_greedy(rng):
    logits = rng.normal(size=(3, 50)).astype(np.float32)
    got = np.asarray(greedy_sample(jnp.asarray(logits)))
    np.testing.assert_array_equal(got, logits.argmax(-1))


def test_sample_top_k_support(rng):
    """Samples must come only from the top-K set."""
    logits = rng.normal(size=(2, 100)).astype(np.float32)
    topk = set(np.argsort(logits[0])[::-1][:5]) | {-1}
    key = jax.random.PRNGKey(0)
    for i in range(20):
        key, sub = jax.random.split(key)
        s = np.asarray(sample_top_k(jnp.asarray(logits), sub, top_k=5))
        assert s[0] in set(np.argsort(logits[0])[::-1][:5])
        assert s[1] in set(np.argsort(logits[1])[::-1][:5])


def test_sample_distribution(rng):
    """With one dominant logit, sampling should pick it almost always."""
    logits = np.full((1, 100), -10.0, np.float32)
    logits[0, 42] = 10.0
    key = jax.random.PRNGKey(1)
    hits = 0
    for i in range(50):
        key, sub = jax.random.split(key)
        hits += int(np.asarray(
            sample_top_k(jnp.asarray(logits), sub, top_k=5))[0] == 42)
    assert hits >= 49


def test_temperature_zero_is_greedy(rng):
    logits = rng.normal(size=(2, 64)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    s = np.asarray(sample_top_k(jnp.asarray(logits), key, temperature=0.0))
    np.testing.assert_array_equal(s, logits.argmax(-1))
