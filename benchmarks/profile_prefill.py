"""Prefill attribution profile: where does TTFT live? (VERDICT r4 #5)

Decode got a three-level reconciling profiler (profile_decode.py); TTFT
was only ever host-timed, with ~30 ms of tunnel RTT buried inside. This
tool decomposes prefill at 128/512/2048-token prompts into:

- per-op isolation at the exact prefill shapes (m = B*T tokens): the four
  quantized matmuls (large-m path: dequant-materialize + bf16 MXU dot for
  int4), flash prefill attention, rmsnorm/rope/silu glue, lm head;
- the full jitted prefill step DEVICE-timed (lax.scan over the step with
  the cache carried — single dispatch, RTT excluded);
- the host-observed TTFT (what a CLI user sees over this tunnel) and the
  RTT share, so "TTFT" is never again quoted with transport inside.

Per-op rooflines are max(HBM-bytes/BW, FLOPs/MXU-peak): prefill matmuls
at m >= 1024 are MXU-bound, unlike decode's bandwidth-bound m=8.

Run on the chip:
    python benchmarks/profile_prefill.py | tee docs/profile_prefill_r05.log
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HBM_BW = 819e9        # v5e nominal
MXU_BF16 = 197e12     # v5e nominal bf16 peak
MODEL = "llama2-7b"
QUANT = "int4"
BATCH = 8
ITERS = 64

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


def timeit_scan(step, carry0, consts=(), iters=ITERS, repeats=3,
                donate=False):
    """Same method as profile_decode.timeit_scan (single dispatch per
    measurement, RTT subtracted, donated carries re-threaded)."""
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def loop(c, *cs):
        def body(c, _):
            return step(c, *cs), None
        out, _ = jax.lax.scan(body, c, None, length=iters)
        return out

    out = loop(carry0, *consts)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = loop(out if donate else carry0, *consts)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - _RTT[0], 1e-9 * iters) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--prompts", type=int, nargs="+",
                    default=[128, 512, 2048])
    ap.add_argument("--quant", default=QUANT)
    args = ap.parse_args()
    B = args.batch

    from llm_inference_engine_tpu.config import EngineConfig, get_config
    from llm_inference_engine_tpu.models.weights import (
        init_dummy_params, init_dummy_quantized_params, param_bytes)
    from llm_inference_engine_tpu.ops import kv_cache as kvc
    from llm_inference_engine_tpu.ops.activations import silu_and_mul
    from llm_inference_engine_tpu.ops.attention import attention
    from llm_inference_engine_tpu.ops.linear import linear
    from llm_inference_engine_tpu.ops.rmsnorm import rmsnorm
    from llm_inference_engine_tpu.ops.rope import split_qkv_rope
    from llm_inference_engine_tpu.ops.quant import QuantizedTensor
    from llm_inference_engine_tpu.runtime.engine import InferenceEngine

    cfg = get_config(MODEL)
    rtt = _measure_rtt()
    print(f"# profile_prefill — {MODEL} {args.quant} B={B} "
          f"prompts={args.prompts} backend={jax.default_backend()} "
          f"tunnel_rtt={rtt*1e3:.2f}ms (subtracted from device timings; "
          f"{ITERS} iters/dispatch)", flush=True)

    if args.quant in ("int8", "int4"):
        params = init_dummy_quantized_params(cfg, mode=args.quant, seed=0)
    else:
        params = init_dummy_params(cfg, seed=0)
    wbytes = param_bytes(params)
    L, Hd, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    K, D, Hq = cfg.num_kv_heads, cfg.head_dim, cfg.num_heads
    lay = params["layers"]

    def qbytes(t):
        if isinstance(t, QuantizedTensor):
            return (t.q.size * t.q.dtype.itemsize + t.scale.size * 4) // L
        return t.nbytes // L

    for T in args.prompts:
        # long prompts profile at B=1 (the TTFT question) — at B=8 a
        # T=2048 cache alone is 17 GB and OOMs the 16 GB chip (r5)
        B = 1 if args.batch * T > 8192 else args.batch
        max_seq = T + 256
        eng = EngineConfig(max_batch_size=B, max_seq_len=max_seq,
                           quant_mode=args.quant,
                           max_prefill_len=T)
        m = B * T
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, T, Hd), jnp.bfloat16)
        sm_scale = 1.0 / math.sqrt(D)
        print(f"\n== prompt T={T} (m={m} tokens) ==", flush=True)
        rows = []

        def add(name, dt, calls, roof_bytes, flops=0):
            roof_t = max(roof_bytes / HBM_BW, flops / MXU_BF16)
            rows.append((name, dt, calls, roof_t))
            bound = "mxu" if flops / MXU_BF16 > roof_bytes / HBM_BW else "hbm"
            print(f"  {name:18s} {dt*1e6:9.2f} us x{calls:3d} "
                  f"roof {roof_t/dt*100 if dt else 0:6.1f}% ({bound})",
                  flush=True)

        # ---- matmuls at prefill m (cycling layer idx) -------------------
        def mm(name, x_in, out_dim):
            t = lay[name]
            flops = 2 * m * x_in.shape[-1] * (
                out_dim if t.q.ndim != 4 else 2 * t.q.shape[-1]) \
                if isinstance(t, QuantizedTensor) else \
                2 * m * x_in.shape[-1] * out_dim

            def step(c, t_):
                xc, i = c
                y = linear(xc, t_, kernels=eng.kernels, layer=i % L)
                y2 = y.reshape(B, T, -1)
                w = min(y2.shape[-1], xc.shape[-1])
                return (xc.at[..., :w].add(
                    y2[..., :w].astype(xc.dtype) * jnp.bfloat16(1e-8)),
                    i + 1)

            dt, _ = timeit_scan(step, (x_in, jnp.int32(0)), consts=(t,))
            add(name, dt, L, qbytes(t) + x_in.nbytes, flops)
            return dt

        mm("wqkv", x, cfg.qkv_size)
        mm("wo", x, Hd)
        mm("w_gate_up", x, 2 * I)
        xi = jax.random.normal(key, (B, T, I), jnp.bfloat16)
        mm("w_down", xi, Hd)

        # ---- rmsnorm / rope / silu glue --------------------------------
        g = lay["attn_norm"][0]
        dt, _ = timeit_scan(
            lambda c: rmsnorm(c, g, cfg.rms_norm_eps, kernels=eng.kernels),
            x)
        add("rmsnorm", dt, L + 1, 2 * x.nbytes)

        qkv = jax.random.normal(key, (B, T, cfg.qkv_size), jnp.bfloat16)
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                                     (B, T))

        def rope_step(c):
            q, k_, v_ = split_qkv_rope(c, positions, Hq, K, D,
                                       cfg.rope_theta, cfg.rope_scaling,
                                       kernels=eng.kernels)
            return c.at[..., :Hq * D].add(
                q.reshape(B, T, -1).astype(c.dtype) * jnp.bfloat16(1e-8))
        dt, _ = timeit_scan(rope_step, qkv)
        add("split_qkv_rope", dt, L, 2 * qkv.nbytes)

        gu = jax.random.normal(key, (B, T, 2 * I), jnp.bfloat16)
        dt, _ = timeit_scan(
            lambda c: (silu_and_mul(c, kernels=eng.kernels)
                       .repeat(2, -1) * jnp.bfloat16(1e-8) + c), gu)
        add("silu_and_mul", dt, L, gu.nbytes * 3 // 2)

        # ---- flash prefill attention (write+attend, cycling layers) ----
        del qkv, gu, xi
        # a 4-layer cycling cache keeps the timing honest (layer-indexed
        # BlockSpec steering exactly as in the model) without the full
        # L-layer allocation the isolated measurement doesn't need
        Lc = min(L, 4)
        cache = kvc.new_kv_cache(Lc, B, K, max_seq, D, dtype=cfg.dtype,
                                 pad_to_tiles=None)
        qh = jax.random.normal(key, (B, T, Hq, D), jnp.bfloat16)
        kn = jax.random.normal(key, (B, T, K, D), jnp.bfloat16)
        q0 = jnp.zeros((B,), jnp.int32)
        kl = jnp.full((B,), T, jnp.int32)

        def attn_step(c):
            q, ck, cv, i = c
            cc = kvc.KVCache(ck, cv, q0)
            cc = kvc.update_cache_at_layer(cc, i % Lc, kn, kn, q0,
                                           kernels=eng.kernels)
            out = attention(q, cc.k, cc.v, q0, kl, causal=True,
                            sm_scale=sm_scale, block_q=eng.block_q,
                            block_kv=eng.block_kv, kernels=eng.kernels,
                            layer=i % Lc, kv_hi=T)
            return (q + out.astype(q.dtype) * jnp.bfloat16(1e-8),
                    cc.k, cc.v, i + 1)

        dt, out = timeit_scan(attn_step, (qh, cache.k, cache.v,
                                          jnp.int32(0)), donate=True)
        del cache, out
        attn_flops = 2 * 2 * B * Hq * T * T // 2 * D   # q@k + p@v, causal
        add("attn_prefill", dt, L,
            2 * B * T * K * D * 2 + 2 * qh.nbytes, attn_flops)
        del qh, kn

        # ---- lm head (last token only) ---------------------------------
        xh = x[:, -1]
        def lm_step(c, w):
            y = linear(c, w, out_dtype=jnp.float32, kernels=eng.kernels)
            return c + y[:, :Hd].astype(c.dtype) * jnp.bfloat16(1e-8)
        dt, _ = timeit_scan(lm_step, xh, consts=(params["lm_head"],))
        lmb = qbytes(params["lm_head"]) * L if isinstance(
            params["lm_head"], QuantizedTensor) else params["lm_head"].nbytes
        add("lm_head", dt, 1, lmb + B * cfg.vocab_size * 4,
            2 * B * Hd * cfg.vocab_size)

        # ---- full jitted prefill step, device-timed --------------------
        import dataclasses as _dc
        from llm_inference_engine_tpu.models import llama as llama_model
        cache_b = kvc.new_kv_cache(L, B, K, max_seq, D, dtype=cfg.dtype,
                                   pad_to_tiles=None)
        ids = jnp.zeros((B, T), jnp.int32)

        def full_step(c, params_):
            ck, cv, tok = c
            cc = kvc.KVCache(ck, cv, q0)
            logits, cc = llama_model.forward_hidden(
                cfg, eng, params_, tok, cc, q0, kl, kv_hi=T)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (cc.k, cc.v, tok.at[:, 0].set(nxt[:B]))

        dt_full, out = timeit_scan(full_step, (cache_b.k, cache_b.v, ids),
                                   consts=(params,), iters=16, donate=True)
        del cache_b, out

        # ---- host-observed TTFT through the engine ---------------------
        engine = InferenceEngine(cfg, eng, params)
        rng = np.random.default_rng(0)
        prompts = [rng.integers(0, cfg.vocab_size, size=T).tolist()
                   for _ in range(B)]
        _ = np.asarray(engine.prefill(prompts))      # compile
        best = float("inf")
        for _ in range(3):
            engine.reset()
            t0 = time.perf_counter()
            _ = np.asarray(engine.prefill(prompts))
            best = min(best, time.perf_counter() - t0)
        del engine

        per_op = sum(dt * c for name, dt, c, _ in rows)
        roof = sum(rt * c for name, dt, c, rt in rows)
        print(f"  sum(per-op)        {per_op*1e3:9.3f} ms")
        print(f"  roofline(sum)      {roof*1e3:9.3f} ms "
              f"(weights {wbytes/1e9:.2f} GB stream once)")
        print(f"  FULL device step   {dt_full*1e3:9.3f} ms "
              f"(vs sum-of-parts {per_op*1e3:.3f}: "
              f"delta {(dt_full-per_op)*1e3:+.3f})")
        print(f"  achieved           {roof/dt_full*100:.1f}% of roofline")
        print(f"  host TTFT          {best*1e3:9.3f} ms = device "
              f"{dt_full*1e3:.3f} + transport/host "
              f"{(best-dt_full)*1e3:.3f} (tunnel RTT ~{rtt*1e3:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
