"""Benchmark: Llama2-7B INT4 weight-only decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md: it could not even load
Llama2-7B), so ``vs_baseline`` is the fraction of the HBM-bandwidth
roofline achieved: a weight-only-quantized decode step is bound by
streaming the weights + KV cache once per token; roofline tok/s =
batch / (bytes_moved / HBM_BW).

The measurement harness lives in benchmarks/bench_decode_sweep.py
(measure_config) and is SHARED with the full perf matrix: two
device-side rollouts of different lengths from the same start state,
differenced — cancelling the ~30 ms host<->device tunnel round trip and
fixed per-call overhead (r1-r3's single-window numbers carried ~6% RTT
inflation; docs/profile_decode_r04.log) — with the roofline's KV term
charged at the mean context of exactly the differenced steps, and a
fallback to the long window alone if a tunnel stall pollutes every
short-window repeat.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "benchmarks"))

MODEL = "llama2-7b"
QUANT = "int4"
BATCH = 8


def main():
    from bench_decode_sweep import measure_config
    tok_s, ratio = measure_config(MODEL, QUANT, kv="", batch=BATCH)
    print(json.dumps({
        "metric": f"decode_tokens_per_sec_per_chip_{MODEL}_{QUANT}_bs{BATCH}",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(ratio, 4),
    }))


if __name__ == "__main__":
    main()
