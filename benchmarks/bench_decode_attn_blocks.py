"""Sweep decode_block_kv for the fused MXU decode attention kernel.

VERDICT r4 #3: decode attention streams ceil(kv_len/block)*block rows per
sequence; at ctx~416 the committed profile shows 67-71% of the HBM
roofline. This times `attention_decode_fused_mxu` at the exact decode
shapes (stacked cache, cycling layer index, donated carry — same method
as benchmarks/profile_decode.py) across block sizes and batch, separating
the two loss terms: tail rounding (independent of block size once kv_hi
is block-rounded) and per-step streaming efficiency (bigger blocks ->
bigger DMAs).

Usage: python benchmarks/bench_decode_attn_blocks.py [ctx [batch ...]]
"""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HBM_BW = 819e9
K, D, G = 32, 128, 1          # 7B MHA
L = 8
ITERS = 512

_RTT = [0.0]


def _measure_rtt():
    x = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def null_loop(c):
        def body(c, _):
            return c * 1.000001, None
        out, _ = jax.lax.scan(body, c, None, length=ITERS)
        return out

    out = null_loop(x)
    _ = np.asarray(out.ravel()[0])
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = null_loop(out)
        _ = np.asarray(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    _RTT[0] = best
    return best


def bench(B, ctx, block_kv, kv_hi=None):
    from llm_inference_engine_tpu.ops.attention import (
        attention_decode_fused_mxu)
    H = K * G
    kv_hi = kv_hi or int(-(-(ctx + 1) // 256) * 256)
    S = kv_hi
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, 1, H, D), jnp.bfloat16)
    kn = jax.random.normal(key, (B, 1, K, D), jnp.bfloat16)
    ck = jnp.zeros((L, B, S, K, D), jnp.bfloat16)
    cv = jnp.zeros((L, B, S, K, D), jnp.bfloat16)
    q_start = jnp.full((B,), ctx, jnp.int32)
    kv_len = q_start + 1
    sm_scale = 1.0 / math.sqrt(D)

    def step(c):
        qc, kc, vc, i = c
        out, kc, vc = attention_decode_fused_mxu(
            qc, kn, kn, kc, vc, q_start, kv_len, i % L,
            sm_scale=sm_scale, block_kv=block_kv, kv_hi=kv_hi)
        return (qc + out.astype(qc.dtype) * jnp.bfloat16(1e-8), kc, vc,
                i + 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def loop(c):
        def body(c, _):
            return step(c), None
        out, _ = jax.lax.scan(body, c, None, length=ITERS)
        return out

    carry = (q, ck, cv, jnp.int32(0))
    try:
        carry = loop(carry)
        _ = np.asarray(carry[0].ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            carry = loop(carry)
            _ = np.asarray(carry[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001
        print(f"  B={B:<3d} ctx={ctx} bk={block_kv:<4d} FAILED: "
              f"{str(e).splitlines()[0][:80]}", flush=True)
        return
    dt = max(best - _RTT[0], 1e-9) / ITERS
    roof_bytes = B * K * ctx * D * 2 * 2          # useful bytes (k+v)
    streamed = B * K * min(-(-(ctx + 1) // block_kv) * block_kv, kv_hi) \
        * D * 2 * 2
    print(f"  B={B:<3d} ctx={ctx} kv_hi={kv_hi} bk={block_kv:<4d} "
          f"{dt*1e6:8.2f} us  useful {roof_bytes/dt/HBM_BW*100:5.1f}%  "
          f"streamed {streamed/dt/HBM_BW*100:5.1f}% of BW", flush=True)


def main():
    ctx = int(sys.argv[1]) if len(sys.argv) > 1 else 416
    batches = [int(x) for x in sys.argv[2:]] or [8, 16]
    rtt = _measure_rtt()
    print(f"# bench_decode_attn_blocks — 7B MHA K={K} D={D} L={L} "
          f"(rtt={rtt*1e3:.2f}ms subtracted)", flush=True)
    for B in batches:
        for bk in (32, 64, 96, 128, 256):
            bench(B, ctx, bk)


if __name__ == "__main__":
    main()
