"""Decode throughput vs batch size (weight-stream amortization sweep).

Weight-only-quantized decode is HBM-bound: every step streams the full
weight set once regardless of batch, so tok/s should scale with batch
until the KV-cache stream (which grows linearly with batch) dominates.
This sweep measures where that crossover lands on the attached chip.

    python benchmarks/bench_decode_sweep.py [--model llama2-7b]
        [--quant int4] [--kv int8] [--batches 1 4 8 16 32]

Prints one JSON line per batch size (same schema as bench.py).
(Run WITHOUT ``PYTHONPATH=.`` — it breaks jax PJRT plugin discovery.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_BW_BYTES = 819e9  # v5e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b")
    ap.add_argument("--quant", default="int4")
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 4, 8, 16, 32])
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--rollout", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from llm_inference_engine_tpu.config import EngineConfig, get_config
    from llm_inference_engine_tpu.models.weights import (
        init_dummy_params, init_dummy_quantized_params, param_bytes)
    from llm_inference_engine_tpu.runtime.engine import InferenceEngine

    cfg = get_config(args.model)
    if args.quant in ("int8", "int4"):
        params = init_dummy_quantized_params(cfg, mode=args.quant, seed=0)
    else:
        params = init_dummy_params(cfg, seed=0)
    wbytes = param_bytes(params)
    kv_itemsize = 1 if args.kv == "int8" else jnp.dtype(cfg.dtype).itemsize

    rng = np.random.default_rng(0)
    for batch in args.batches:
        eng = EngineConfig(max_batch_size=batch, max_seq_len=args.max_seq,
                           quant_mode=args.quant,
                           kv_cache_dtype_name=args.kv)
        engine = InferenceEngine(cfg, eng, params)
        prompts = [rng.integers(0, cfg.vocab_size,
                                size=args.prompt_len).tolist()
                   for _ in range(batch)]
        logits = engine.prefill(prompts)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks = engine.decode_rollout(tokens, args.rollout)   # warmup/compile
        _ = np.asarray(toks[-1])

        best_dt = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            toks = engine.decode_rollout(toks[-1], args.rollout)
            _ = np.asarray(toks[-1])
            best_dt = min(best_dt, time.perf_counter() - t0)
        tok_s = batch * args.rollout / best_dt

        avg_ctx = args.prompt_len + args.rollout * (args.repeats + 1.5)
        kv_bytes = (cfg.num_layers * 2 * cfg.num_kv_heads * avg_ctx
                    * cfg.head_dim * kv_itemsize * batch)
        roofline = batch / ((wbytes + kv_bytes) / HBM_BW_BYTES)
        print(json.dumps({
            "metric": (f"decode_tokens_per_sec_per_chip_{args.model}"
                       f"_{args.quant}_kv{args.kv or 'native'}_bs{batch}"),
            "value": round(tok_s, 2),
            "unit": "tok/s",
            "vs_baseline": round(tok_s / roofline, 4),
        }), flush=True)
        del engine


if __name__ == "__main__":
    main()
