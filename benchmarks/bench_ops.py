"""Per-op decode-shape microbenchmarks vs HBM roofline.

Times each component of the Llama2-7B INT8 decode step at its real shapes
(batch 8, one token per slot) on the attached TPU, comparing Pallas vs XLA
paths against the bytes-streamed roofline. This is the tool for finding
which op is off speed-of-light — run after any kernel change:

    python benchmarks/bench_ops.py [--batch 8] [--ctx 192]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HBM_BW = 819e9  # v5e


def timeit(fn, *args, repeats=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_qmatmul(m, k, n, mode, kernels, key):
    from llm_inference_engine_tpu.ops.quant import quantize_tensor, quantized_linear
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (m, k), jnp.bfloat16)
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.02
    t = quantize_tensor(w, mode)
    f = jax.jit(lambda x, t: quantized_linear(x, t, kernels=kernels))
    dt = timeit(f, x, t)
    bytes_moved = t.q.size * t.q.dtype.itemsize + t.scale.nbytes + \
        x.nbytes + m * n * 2
    return dt, bytes_moved / dt / HBM_BW


def bench_attention(B, H, K, D, S, ctx, kernels, quant, key):
    from llm_inference_engine_tpu.ops.attention import attention
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (B, 1, H, D), jnp.bfloat16)
    if quant:
        kc = jax.random.randint(ks[1], (B, K, S, D), -127, 128, jnp.int8)
        vc = jax.random.randint(ks[2], (B, K, S, D), -127, 128, jnp.int8)
        kscale = jnp.abs(jax.random.normal(ks[3], (B, K, S, 1))) * 0.01
        vscale = jnp.abs(jax.random.normal(ks[4], (B, K, S, 1))) * 0.01
    else:
        kc = jax.random.normal(ks[1], (B, K, S, D), jnp.bfloat16)
        vc = jax.random.normal(ks[2], (B, K, S, D), jnp.bfloat16)
        kscale = vscale = None
    q_start = jnp.full((B,), ctx - 1, jnp.int32)
    kv_len = jnp.full((B,), ctx, jnp.int32)
    f = jax.jit(lambda *a: attention(*a, kernels=kernels,
                                     k_scale=kscale, v_scale=vscale))
    dt = timeit(f, q, kc, vc, q_start, kv_len)
    # bytes actually needed: ctx tokens of k+v per (b, kv-head)
    itemsize = 1 if quant else 2
    useful = B * K * ctx * D * 2 * itemsize
    return dt, useful / dt / HBM_BW


def bench_decode_step(batch, ctx, quant_mode, key):
    from llm_inference_engine_tpu.config import EngineConfig, get_config
    from llm_inference_engine_tpu.models.weights import init_dummy_quantized_params, param_bytes
    from llm_inference_engine_tpu.runtime.engine import InferenceEngine
    cfg = get_config("llama2-7b")
    eng = EngineConfig(max_batch_size=batch, max_seq_len=1024,
                       quant_mode=quant_mode)
    params = init_dummy_quantized_params(cfg, mode=quant_mode, seed=0)
    engine = InferenceEngine(cfg, eng, params)
    prompts = [list(range(1, ctx)) for _ in range(batch)]
    logits = engine.prefill(prompts)
    tokens = jnp.argmax(logits, -1).astype(jnp.int32)
    toks = engine.decode_rollout(tokens, 32)
    _ = np.asarray(toks[-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        toks = engine.decode_rollout(toks[-1], 32)
        _ = np.asarray(toks[-1])
        best = min(best, time.perf_counter() - t0)
    dt = best / 32
    wbytes = param_bytes(params)
    kv = cfg.num_layers * 2 * cfg.num_kv_heads * ctx * cfg.head_dim * 2 * batch
    roof = (wbytes + kv) / HBM_BW
    return dt, roof / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=192)
    ap.add_argument("--full", action="store_true",
                    help="also run the full decode step (loads 7B)")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    B = args.batch
    print(f"backend={jax.default_backend()} batch={B} ctx={args.ctx}")

    shapes = [
        ("wqkv", B, 4096, 12288),
        ("wo", B, 4096, 4096),
        ("gate_up", B, 4096, 22016),
        ("down", B, 11008, 4096),
        ("lm_head", B, 4096, 32000),
    ]
    for mode in ("int8", "int4"):
        for kernels in ("pallas", "xla"):
            rows = []
            per_layer = 0.0
            for name, m, k, n in shapes:
                dt, eff = bench_qmatmul(m, k, n, mode, kernels, key)
                rows.append(f"{name} {dt*1e6:7.1f}us {eff*100:5.1f}%")
                if name != "lm_head":
                    per_layer += dt
            print(f"[{mode}/{kernels}] " + " | ".join(rows)
                  + f" | layer {per_layer*1e6:7.1f}us")

    for kernels in ("pallas", "xla"):
        for quant in (False, True):
            dt, eff = bench_attention(B, 32, 32, 128, 1024, args.ctx,
                                      kernels, quant, key)
            tag = "int8kv" if quant else "bf16kv"
            print(f"[attn/{kernels}/{tag}] {dt*1e6:7.1f}us "
                  f"useful-bw {eff*100:5.1f}%")

    if args.full:
        for mode in ("int8", "int4"):
            dt, frac = bench_decode_step(B, args.ctx, mode, key)
            print(f"[full-step/{mode}] {dt*1e3:.2f} ms/step "
                  f"({frac*100:.1f}% of roofline)")


if __name__ == "__main__":
    main()
