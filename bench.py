"""Benchmark: Llama2-7B INT4 weight-only decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md: it could not even load
Llama2-7B), so ``vs_baseline`` is the fraction of the HBM-bandwidth
roofline achieved: a weight-only-quantized decode step is bound by
streaming the weights + KV cache once per token; roofline tok/s =
batch / (bytes_moved / HBM_BW).

Decode runs as a device-side lax.scan rollout (one host call per N tokens)
so tunnel/host latency is excluded from the kernel measurement.
"""

from __future__ import annotations

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
ROLLOUT = 64
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

    # warmup (compile the rollout); NB: block_until_ready is unreliable over
    # the axon tunnel — force a small D2H transfer to fence execution
    toks = engine.decode_rollout(tokens, ROLLOUT)
    _ = np.asarray(toks[-1])

    best_dt = float("inf")
    for _ in range(REPEATS):
        last = toks[-1]
        t0 = time.perf_counter()
        toks = engine.decode_rollout(last, ROLLOUT)
        _ = np.asarray(toks[-1])                     # execution fence
        best_dt = min(best_dt, time.perf_counter() - t0)

    tok_per_sec = BATCH * ROLLOUT / best_dt

    # roofline: weight bytes + avg KV-cache bytes read per step
    wbytes = param_bytes(params)
    avg_ctx = PROMPT_LEN + ROLLOUT * (REPEATS + 1.5)      # mean during timing
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
