"""Integration tests: full decoder forward — prefill/decode consistency.

The reference's equivalents are the examples/cpp layer drivers (dummy
weights, no asserts, e.g. context_decoder_example.cpp) plus manual tensor
dumps; here the invariant is asserted directly: running a sequence
token-by-token through the decode path (KV cache) must produce the same
logits as prefilling the whole sequence at once — and both must match a
cache-free full-context forward.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_engine_tpu.config import EngineConfig, get_config
from llm_inference_engine_tpu.models import llama as M
from llm_inference_engine_tpu.models.weights import init_dummy_params, quantize_params
from llm_inference_engine_tpu.ops import kv_cache as kvc

CFG = get_config("debug")
ENG = EngineConfig(max_batch_size=2, max_seq_len=64, kernels="xla")


def _full_context_logits(params, token_ids, upto):
    """Cache-free golden: fresh cache, prefill all, take logits."""
    B, T = token_ids.shape
    cache = kvc.new_kv_cache(CFG.num_layers, B, CFG.num_kv_heads, ENG.max_seq_len,
                             CFG.head_dim, dtype=CFG.dtype)
    q_start = jnp.zeros((B,), jnp.int32)
    kv_len = jnp.asarray(upto, jnp.int32)
    logits, _ = M.forward_hidden(CFG, ENG, params, token_ids, cache, q_start,
                                 kv_len)
    return np.asarray(logits)


@pytest.fixture(scope="module")
def params():
    return init_dummy_params(CFG, seed=0)


def test_prefill_then_decode_matches_full_context(params, rng):
    B, T = 2, 12
    ids = rng.integers(0, CFG.vocab_size, size=(B, T)).astype(np.int32)
    lens = np.array([12, 9], np.int32)

    # golden: full forward over all T tokens at once
    want = _full_context_logits(params, jnp.asarray(ids), lens)

    # prefill first part, then decode the last 3 tokens one by one
    split = lens - 3
    cache = kvc.new_kv_cache(CFG.num_layers, B, CFG.num_kv_heads,
                             ENG.max_seq_len, CFG.head_dim, dtype=CFG.dtype)
    q_start = jnp.zeros((B,), jnp.int32)
    logits, cache = M.forward_hidden(CFG, ENG, params, jnp.asarray(ids), cache,
                                     q_start, jnp.asarray(split))
    for step in range(3):
        pos = split + step
        tok = ids[np.arange(B), pos][:, None]          # [B, 1]
        logits, cache = M.forward_hidden(
            CFG, ENG, params, jnp.asarray(tok), cache,
            jnp.asarray(pos), jnp.asarray(pos + 1))
    # after consuming all tokens, decode-path logits == full-context logits
    np.testing.assert_allclose(np.asarray(logits), want, atol=2e-4, rtol=2e-4)


def test_ragged_batch_prefill(params, rng):
    """Sequences of different lengths in one padded batch must each match
    their solo forward."""
    ids_a = rng.integers(0, CFG.vocab_size, size=(1, 10)).astype(np.int32)
    ids_b = rng.integers(0, CFG.vocab_size, size=(1, 6)).astype(np.int32)

    solo_a = _full_context_logits(params, jnp.asarray(ids_a), [10])
    solo_b = _full_context_logits(params, jnp.asarray(ids_b), [6])

    batch = np.zeros((2, 10), np.int32)
    batch[0] = ids_a[0]
    batch[1, :6] = ids_b[0]
    both = _full_context_logits(params, jnp.asarray(batch), [10, 6])

    np.testing.assert_allclose(both[0], solo_a[0], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(both[1], solo_b[0], atol=2e-4, rtol=2e-4)


def test_pallas_interpret_full_forward_matches_xla(params, rng):
    """The whole model with pallas kernels (interpret) vs pure XLA."""
    eng_pl = EngineConfig(max_batch_size=1, max_seq_len=64, kernels="pallas",
                          block_q=8, block_kv=16)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 8)).astype(np.int32)
    cache1 = kvc.new_kv_cache(CFG.num_layers, 1, CFG.num_kv_heads, 64,
                              CFG.head_dim, dtype=CFG.dtype)
    cache2 = kvc.new_kv_cache(CFG.num_layers, 1, CFG.num_kv_heads, 64,
                              CFG.head_dim, dtype=CFG.dtype)
    qs = jnp.zeros((1,), jnp.int32)
    kl = jnp.asarray([8], jnp.int32)
    l_pl, _ = M.forward_hidden(CFG, eng_pl, params, jnp.asarray(ids), cache1,
                               qs, kl)
    l_xla, _ = M.forward_hidden(CFG, ENG, params, jnp.asarray(ids), cache2,
                                qs, kl)
    np.testing.assert_allclose(np.asarray(l_pl), np.asarray(l_xla),
                               atol=5e-4, rtol=5e-4)


def test_quantized_model_close_to_fp(params, rng):
    """INT8-quantized full forward stays close to fp32 logits."""
    qparams = quantize_params(params, "int8")
    ids = rng.integers(0, CFG.vocab_size, size=(1, 6)).astype(np.int32)

    def logits_of(p):
        cache = kvc.new_kv_cache(CFG.num_layers, 1, CFG.num_kv_heads, 64,
                                 CFG.head_dim, dtype=CFG.dtype)
        l, _ = M.forward_hidden(CFG, ENG, p, jnp.asarray(ids), cache,
                                jnp.zeros((1,), jnp.int32),
                                jnp.asarray([6], jnp.int32))
        return np.asarray(l)

    lf = logits_of(params)
    lq = logits_of(qparams)
    # top-1 agreement and small relative error
    assert lf.argmax() == lq.argmax()
    rel = np.abs(lf - lq).max() / (np.abs(lf).max() + 1e-9)
    assert rel < 0.05, rel
