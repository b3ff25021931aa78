"""Benchmark: Llama2-7B INT4 weight-only decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md: it could not even load
Llama2-7B), so ``vs_baseline`` is the fraction of the HBM-bandwidth
roofline achieved: a weight-only-quantized decode step is bound by
streaming the weights + KV cache once per token; roofline tok/s =
batch / (bytes_moved / HBM_BW).

Measurement: two device-side rollouts of different lengths from the SAME
start state, dt = (t_long - t_short) / (steps_long - steps_short). The
differencing cancels the host<->device round trip (~30 ms over the axon
tunnel — measured r4; inside r1-r3's single 64-step window it inflated
the per-step time by ~6%, docs/profile_decode_r04.log) and any other
fixed per-call overhead. Both rollouts run the same compiled program
(same static kv watermark), so the difference is purely the marginal
decode steps. The roofline's KV term uses the mean context of exactly
the differenced steps — not a guessed window.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

MODEL = "llama2-7b"
QUANT = "int4"
BATCH = 8
PROMPT_LEN = 128
MAX_SEQ = 1024
STEPS_LO = 64
STEPS_HI = 320
REPEATS = 3

HBM_BW_BYTES = 819e9  # v5e: 819 GB/s


def main():
    from llm_inference_engine_tpu.config import EngineConfig, get_config
    from llm_inference_engine_tpu.models.weights import (
        init_dummy_quantized_params, param_bytes)
    from llm_inference_engine_tpu.runtime.engine import InferenceEngine

    cfg = get_config(MODEL)
    eng = EngineConfig(max_batch_size=BATCH, max_seq_len=MAX_SEQ,
                       quant_mode=QUANT)
    params = init_dummy_quantized_params(cfg, mode=QUANT, seed=0)
    engine = InferenceEngine(cfg, eng, params)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, size=PROMPT_LEN).tolist()
               for _ in range(BATCH)]
    logits = engine.prefill(prompts)
    tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # one static watermark covers the longest rollout: both measured
    # program variants are IDENTICAL, so differencing isolates the steps
    kv_hi = engine._kv_watermark(np.full((BATCH,), PROMPT_LEN), STEPS_HI)

    def rollout(n):
        """n decode steps from ctx=PROMPT_LEN (lengths re-armed first —
        a FRESH array each call: the cache is donated into the rollout,
        which consumes the lengths buffer with it).
        NB: block_until_ready is unreliable over the axon tunnel — a
        small D2H transfer fences execution."""
        engine.cache = dataclasses.replace(
            engine.cache, lengths=jnp.full((BATCH,), PROMPT_LEN, jnp.int32))
        toks, engine.cache = engine._rollout_fn(
            engine.params, engine.cache, tokens, n, kv_hi=kv_hi)
        return np.asarray(toks[-1])

    best = {}
    for n in (STEPS_LO, STEPS_HI):
        _ = rollout(n)                                   # compile + warm
        b = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            _ = rollout(n)
            b = min(b, time.perf_counter() - t0)
        best[n] = b
    dt = (best[STEPS_HI] - best[STEPS_LO]) / (STEPS_HI - STEPS_LO)
    if dt <= 0:  # a tunnel stall polluted every LO repeat: fall back to
        dt = best[STEPS_HI] / STEPS_HI          # the long window alone
    tok_per_sec = BATCH / dt

    # roofline: weight bytes + KV bytes at the differenced steps' mean
    # context (steps STEPS_LO..STEPS_HI-1, ctx PROMPT_LEN+step)
    wbytes = param_bytes(params)
    avg_ctx = PROMPT_LEN + (STEPS_LO + STEPS_HI - 1) / 2
    kv_bytes = (cfg.num_layers * 2 * cfg.num_kv_heads * avg_ctx
                * cfg.head_dim * jnp.dtype(cfg.dtype).itemsize * BATCH)
    step_time_roofline = (wbytes + kv_bytes) / HBM_BW_BYTES
    roofline_tok_s = BATCH / step_time_roofline

    print(json.dumps({
        "metric": f"decode_tokens_per_sec_per_chip_{MODEL}_{QUANT}_bs{BATCH}",
        "value": round(tok_per_sec, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_per_sec / roofline_tok_s, 4),
    }))


if __name__ == "__main__":
    main()
