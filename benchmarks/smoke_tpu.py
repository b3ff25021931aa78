"""Compiled-kernel smoke matrix for real TPU hardware.

The pytest suite runs in Pallas interpret mode (tests/conftest.py), which
exercises kernel MATH but cannot catch Mosaic lowering failures —
mixed-dtype MXU operands, block-shape legality, relayout support — the
exact class of bug that only appears when kernels actually compile.
This script runs a small engine end-to-end on the attached accelerator
across the dtype x quantization x GQA matrix and checks the Pallas path
against the XLA path. f32 configs must agree token-exactly. bf16 configs
legitimately differ by ~1% in logits (different accumulation orders), and
greedy decode amplifies one near-tie argmax flip into total downstream
divergence — so when tokens differ, the check falls back to a step-locked
(teacher-forced) forward comparison and asserts the two paths' logits
stay within a relative tolerance. A Mosaic miscompile produces logits
that are wrong by O(1) of the logit range, not O(epsilon), so this still
catches the target bug class.

    python benchmarks/smoke_tpu.py

(Run WITHOUT ``PYTHONPATH=.`` — putting the repo root on PYTHONPATH breaks
jax's PJRT plugin discovery for out-of-tree backends; this script adds the
repo root to ``sys.path`` itself.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASES = [
    # (name, dtype, quant, kv_dtype, heads, kv_heads, head_dim)
    ("f32 MHA aligned", "float32", "none", "", 8, 8, 128),
    ("bf16 GQA aligned", "bfloat16", "none", "", 16, 8, 128),
    ("bf16 GQA unaligned (padded cache)", "bfloat16", "none", "", 32, 4, 64),
    ("bf16 + int8 KV (embedded)", "bfloat16", "none", "int8", 16, 8, 128),
    ("int8 weights", "bfloat16", "int8", "", 16, 8, 128),
    ("int4 weights + int8 KV", "bfloat16", "int4", "int8", 16, 8, 128),
]


PROMPTS = [[1, 9, 42, 7, 77], [3, 5]]
STEPS = 12
REL_TOL = 0.05       # max |logit_pallas - logit_xla| / max |logit|


def _lockstep_logit_diff(cfg, engines):
    """Teacher-forced comparison: both paths follow the SAME token stream
    (the pallas path's greedy choices), so their logits stay comparable.
    Returns the worst relative logit difference over all decode steps."""
    import jax.numpy as jnp
    from llm_inference_engine_tpu.models.llama import forward_hidden

    logits = {k: e.prefill(PROMPTS) for k, e in engines.items()}
    worst = 0.0
    for _ in range(STEPS):
        la = np.asarray(logits["auto"], np.float32)
        lx = np.asarray(logits["xla"], np.float32)
        worst = max(worst, float(np.abs(la - lx).max()
                                 / max(np.abs(lx).max(), 1e-6)))
        tok = jnp.asarray(la.argmax(-1).astype(np.int32))[:, None]
        for k, e in engines.items():
            n = e.cache.lengths
            out, e.cache = forward_hidden(cfg, e.engine_config, e.params,
                                          tok, e.cache, n, n + 1, kv_hi=192)
            logits[k] = out
    return worst


def run_case(name, dtype, quant, kv, heads, kv_heads, head_dim):
    from llm_inference_engine_tpu.config import (EngineConfig,
                                                 SamplingParams, get_config)
    from llm_inference_engine_tpu.models.weights import (
        init_dummy_params, init_dummy_quantized_params)
    from llm_inference_engine_tpu.runtime.engine import InferenceEngine

    cfg = get_config("debug").replace(
        dtype_name=dtype, num_layers=3, num_heads=heads,
        num_kv_heads=kv_heads, head_dim=head_dim,
        hidden_size=heads * head_dim,
        intermediate_size=2 * heads * head_dim, vocab_size=512)
    if quant in ("int8", "int4"):
        params = init_dummy_quantized_params(cfg, mode=quant, seed=1)
    else:
        params = init_dummy_params(cfg, seed=1)

    outs, engines = {}, {}
    for kern in ("auto", "xla"):
        eng = EngineConfig(max_batch_size=2, max_seq_len=192, kernels=kern,
                           quant_mode=quant, kv_cache_dtype_name=kv)
        engines[kern] = InferenceEngine(cfg, eng, params)
        r = engines[kern].generate(
            PROMPTS, SamplingParams(greedy=True, max_new_tokens=STEPS),
            eos_token_id=None)
        outs[kern] = r.token_ids
    exact = outs["auto"] == outs["xla"]
    if exact:
        print(f"[OK ] {name}: token-exact", flush=True)
        return True
    if dtype == "float32" and not quant and not kv:
        print(f"[FAIL] {name}: f32 paths must be token-exact", flush=True)
        return False
    for e in engines.values():
        e.reset()
    rel = _lockstep_logit_diff(cfg, engines)
    ok = rel <= REL_TOL
    status = "OK " if ok else "FAIL"
    print(f"[{status}] {name}: tokens drift (near-tie flip), "
          f"lockstep rel logit diff={rel:.4f} (tol {REL_TOL})", flush=True)
    return ok


def main():
    import jax
    backend = jax.default_backend()
    print(f"backend: {backend} ({len(jax.devices())} device(s))", flush=True)
    if backend == "cpu":
        print("NOTE: cpu backend — this exercises interpret mode only; "
              "run on a TPU to validate compiled Mosaic lowering.",
              flush=True)
    results = [run_case(*case) for case in CASES]
    if not all(results):
        raise SystemExit("smoke matrix FAILED")
    print("smoke matrix passed", flush=True)


if __name__ == "__main__":
    main()
