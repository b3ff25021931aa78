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


_ITERS = 50


def timeit_scan(step, x0, iters=_ITERS, repeats=3):
    """Time ``step`` (carry -> carry) run ``iters`` times inside ONE jitted
    lax.scan — a single host dispatch per measurement, so tunnel RTT and
    per-call dispatch overhead are excluded (host-side timing of individual
    device calls is meaningless over the tunnel; see bench.py note). The
    carry threads a data dependency through every iteration so XLA cannot
    hoist or elide the op. Fenced by a D2H copy of ONE element, indexed
    on-device first — ``np.asarray(out).ravel()[0]`` would ship the whole
    array through the tunnel (~50 MB/s) and dominate the measurement for
    prefill-sized carries."""

    @jax.jit
    def loop(x):
        def body(c, _):
            return step(c), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    out = loop(x0)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])   # warmup + fence
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = loop(x0)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_qmatmul(m, k, n, mode, kernels, key):
    from llm_inference_engine_tpu.ops.quant import quantize_tensor, quantized_linear
    kx, kw = jax.random.split(key)
    x0 = jax.random.normal(kx, (m, k), jnp.bfloat16)
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.02
    t = quantize_tensor(w, mode)

    def step(x):
        y = quantized_linear(x, t, kernels=kernels)
        # feed a negligible slice of y back into x: forces sequential,
        # non-hoistable iterations
        return x + y[:, :k].astype(x.dtype) * jnp.bfloat16(1e-8)

    dt = timeit_scan(step, x0)
    bytes_moved = t.q.size * t.q.dtype.itemsize + t.scale.nbytes + \
        x0.nbytes + m * n * 2
    return dt, bytes_moved / dt / HBM_BW


def bench_attention(B, H, K, D, S, ctx, kernels, quant, key):
    from llm_inference_engine_tpu.ops.attention import attention
    ks = jax.random.split(key, 5)
    q0 = jax.random.normal(ks[0], (B, 1, H, D), jnp.bfloat16)
    if quant:
        kc = jax.random.randint(ks[1], (B, S, K, D), -127, 128, jnp.int8)
        vc = jax.random.randint(ks[2], (B, S, K, D), -127, 128, jnp.int8)
        kscale = jnp.abs(jax.random.normal(ks[3], (B, S, K))) * 0.01
        vscale = jnp.abs(jax.random.normal(ks[4], (B, S, K))) * 0.01
    else:
        kc = jax.random.normal(ks[1], (B, S, K, D), jnp.bfloat16)
        vc = jax.random.normal(ks[2], (B, S, K, D), jnp.bfloat16)
        kscale = vscale = None
    q_start = jnp.full((B,), ctx - 1, jnp.int32)
    kv_len = jnp.full((B,), ctx, jnp.int32)
    import math
    kv_hi = min(S, 256 * math.ceil(ctx / 256))

    def step(q):
        out = attention(q, kc, vc, q_start, kv_len, kernels=kernels,
                        k_scale=kscale, v_scale=vscale, kv_hi=kv_hi)
        return q + out.astype(q.dtype) * jnp.bfloat16(1e-8)

    dt = timeit_scan(step, q0)
    # bytes actually needed: ctx tokens of k+v per (b, kv-head)
    itemsize = 1 if quant else 2
    useful = B * K * ctx * D * 2 * itemsize
    return dt, useful / dt / HBM_BW


def bench_cache_traffic(B, K, S, D, L, variant):
    """Measure pure KV-cache dataflow cost per decode step for two scan
    layouts (no attention/matmuls — isolates copy overhead):

    - 'xs': the cache is scanned as xs and re-emitted as ys per layer
      (decoder_forward's layout). If XLA cannot alias xs->ys this costs a
      full cache read+write per step.
    - 'carry': the whole [L, ...] cache rides the scan carry and each layer
      updates its slice via dynamic_update_index_in_dim (in-place when
      donated).
    """
    import functools
    kc = jnp.zeros((L, B, K, S, D), jnp.bfloat16)
    vc = jnp.zeros((L, B, K, S, D), jnp.bfloat16)
    new = jnp.ones((B, 1, K, D), jnp.bfloat16)

    def write(kl, pos):
        # one token per sequence at position pos (same for all seqs here)
        return jax.lax.dynamic_update_slice(
            kl, new.transpose(0, 2, 1, 3), (0, 0, pos, 0))

    if variant == "xs":
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(kc, vc, pos, x):
            def body(xc, kv):
                kl, vl = kv
                kl = write(kl, pos)
                vl = write(vl, pos)
                # tiny read dependency so nothing is dead code
                return xc + kl[0, 0, 0, 0] + vl[0, 0, 0, 0], (kl, vl)
            x, (kc, vc) = jax.lax.scan(body, x, (kc, vc))
            return kc, vc, pos + 1, x
    elif variant == "carry":
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(kc, vc, pos, x):
            def body(carry, l):
                kc, vc, xc = carry
                kl = write(kc[l], pos)
                vl = write(vc[l], pos)
                kc = jax.lax.dynamic_update_index_in_dim(kc, kl, l, 0)
                vc = jax.lax.dynamic_update_index_in_dim(vc, vl, l, 0)
                return (kc, vc, xc + kl[0, 0, 0, 0]), None
            (kc, vc, x), _ = jax.lax.scan(body, (kc, vc, x),
                                          jnp.arange(L))
            return kc, vc, pos + 1, x
    elif variant == "dus5":  # write the new token straight into the 5-D cache
        new5 = new.transpose(0, 2, 1, 3)[None]          # [1, B, K, 1, D]

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(kc, vc, pos, x):
            def body(carry, l):
                kc, vc, xc = carry
                kc = jax.lax.dynamic_update_slice(kc, new5, (l, 0, 0, pos, 0))
                vc = jax.lax.dynamic_update_slice(vc, new5, (l, 0, 0, pos, 0))
                return (kc, vc, xc + kc[0, 0, 0, 0, 0]), None
            (kc, vc, x), _ = jax.lax.scan(body, (kc, vc, x), jnp.arange(L))
            return kc, vc, pos + 1, x
    else:  # dus5-unrolled: straight-line python loop over layers
        new5 = new.transpose(0, 2, 1, 3)[None]

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(kc, vc, pos, x):
            for l in range(L):
                kc = jax.lax.dynamic_update_slice(kc, new5, (l, 0, 0, pos, 0))
                vc = jax.lax.dynamic_update_slice(vc, new5, (l, 0, 0, pos, 0))
                x = x + kc[0, 0, 0, 0, 0]
            return kc, vc, pos + 1, x

    pos = jnp.int32(0)
    x = jnp.bfloat16(0)
    kc, vc, pos, x = step(kc, vc, pos, x)      # compile
    _ = float(x)
    best = float("inf")
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        kc, vc, pos, x = step(kc, vc, pos, x)
    _ = float(x)
    best = (time.perf_counter() - t0) / iters
    cache_bytes = kc.nbytes + vc.nbytes
    return best, cache_bytes


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
    ap.add_argument("--cache", action="store_true",
                    help="only run the KV-cache dataflow probe")
    ap.add_argument("--ops", action="store_true",
                    help="only run matmul/attention microbenches")
    args = ap.parse_args()

    if args.cache:
        for variant in ("xs", "carry", "dus5", "dus5-unroll"):
            dt, nbytes = bench_cache_traffic(args.batch, 32, 1024, 128, 32,
                                             variant)
            print(f"[cache/{variant}] {dt*1e3:8.3f} ms/step "
                  f"(cache {nbytes/1e9:.2f} GB; full-copy cost would be "
                  f"{2*nbytes/HBM_BW*1e3:.2f} ms)")
        return

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
