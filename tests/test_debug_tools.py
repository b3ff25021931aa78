"""Intermediate-dump tooling (utils/debug.py) wired into the forward.

Capability parity with the reference's SAVE_DATA flow: dumps at kernel
boundaries for the first layers (reference: src/utils/debug_utils.h:49-119,
used at context_attention.cpp:193-304) plus the offline diff its comments
promise (debug_utils.h:15 references a test_data_compare.cu that does not
exist there — implemented here as compare_dumps).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_engine_tpu.config import EngineConfig, SamplingParams, get_config
from llm_inference_engine_tpu.models.weights import init_dummy_params
from llm_inference_engine_tpu.runtime.engine import InferenceEngine
from llm_inference_engine_tpu.utils import debug

CFG = get_config("debug")


def _run(dump_dir, seed=0):
    debug.set_dump_dir(str(dump_dir))
    try:
        eng = InferenceEngine(CFG, EngineConfig(max_batch_size=2,
                                                max_seq_len=64,
                                                kernels="xla"),
                              init_dummy_params(CFG, seed=seed))
        eng.generate([[1, 5, 9]], SamplingParams(greedy=True,
                                                 max_new_tokens=3),
                     eos_token_id=None,
                     stream_callback=lambda i, t: None)
    finally:
        debug.set_dump_dir(None)


def test_tap_dumps_execution_order_and_reproducibility(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    _run(a)
    names = sorted(os.listdir(a))
    assert names, "enabled tap produced no dumps"
    # model-level and per-layer boundary dumps are present
    joined = "\n".join(names)
    for want in ("embedding", "final_norm", "L0_attn_norm", "L0_qkv_proj",
                 "L0_q_rope", "L0_attn_out", "L0_ffn_act", "L1_layer_out"):
        assert want in joined, f"missing dump {want!r} in {names[:12]}"
    # an identical run produces identical intermediates (the offline-diff
    # workflow the reference's SAVE_DATA existed for)
    _run(b)
    diff = debug.compare_dumps(str(a), str(b))
    assert diff == [], diff


def test_tap_diff_catches_divergence(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    _run(a, seed=0)
    _run(b, seed=1)                      # different weights -> all diverge
    bad = debug.compare_dumps(str(a), str(b))
    assert any("layer_out" in n for n in bad)


def test_tap_disabled_is_free(tmp_path):
    """Disabled tap inserts nothing (trace-time no-op)."""
    assert not debug.tap.enabled
    eng = InferenceEngine(CFG, EngineConfig(max_batch_size=1, max_seq_len=32,
                                            kernels="xla"),
                          init_dummy_params(CFG, seed=0))
    eng.generate([[1, 2]], SamplingParams(greedy=True, max_new_tokens=2),
                 eos_token_id=None)
    assert not os.listdir(tmp_path)


def test_peek_runs_inside_jit(capfd):
    import jax

    @jax.jit
    def f(x):
        debug.peek("x", x)
        return x * 2

    np.testing.assert_array_equal(np.asarray(f(jnp.arange(4))),
                                  [0, 2, 4, 6])
    assert "x:" in capfd.readouterr().out
