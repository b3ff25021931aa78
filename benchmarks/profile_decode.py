"""Decode-step attribution profile: where does the non-roofline time live?

VERDICT r2 #1: the driver-measured decode (Llama2-7B INT4 bs=8) reaches
~0.86 of the HBM roofline; this tool attributes the remaining gap. It
times every op of one decoder layer IN ISOLATION at the exact decode
shapes (same dtypes, same stacked layer-indexed weights, same fused
cache write+attend), then the real ``_layer_step``, then the full jitted
rollout step — so the table reconciles:

    sum(per-op) <= layer_in_situ * L + fixed  <=  full step

Any spread between the three is scan/fusion/invocation overhead, which is
exactly what a per-op table cannot see. All timing uses one lax.scan per
measurement (single host dispatch — tunnel RTT excluded; bench_ops.py).

Run on the chip:  python benchmarks/profile_decode.py | tee docs/profile_decode_r04.log
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

HBM_BW = 819e9  # v5e nominal
MODEL = "llama2-7b"
QUANT = "int4"
BATCH = 8
CTX = 416            # bench.py's mean context during timing
MAX_SEQ = 1024
ITERS = 1024

# One host dispatch + D2H fence over the axon tunnel costs ~33 ms
# (measured r4: a 1024-iter trivial scan and a 32-iter one both total
# 33.4 ms). Every timing below therefore (a) runs >=1024 iterations per
# dispatch and (b) subtracts this measured round-trip baseline — without
# both, sub-100us ops read as ~1 ms and the full-step number inflates ~6%.
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
    """``donate=True`` donates and re-threads the carry call-to-call:
    multi-GB cache carries would otherwise hold input+output copies alive
    at once (OOM next to the 7B weights on a 16 GB chip). Donated inputs
    are consumed — callers must not reuse them afterwards.

    ``consts``: large read-only arrays (stacked weights) the step needs.
    They MUST be arguments, not closures — jit embeds closed-over arrays
    as literal constants in the program, and the serialized module then
    carries the bytes (hundreds of MB for 7B weight stacks), which hangs
    the remote AOT compile over the tunnel. KB-sized closures are fine.
    """
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
    ap.add_argument("--ctx", type=int, default=CTX)
    args = ap.parse_args()
    B, ctx = args.batch, args.ctx
    if ctx >= MAX_SEQ:
        ap.error(f"--ctx {ctx} must be < max_seq {MAX_SEQ}")

    from llm_inference_engine_tpu.config import EngineConfig, get_config
    from llm_inference_engine_tpu.models import llama as llama_model
    from llm_inference_engine_tpu.models.weights import (
        init_dummy_quantized_params, param_bytes)
    from llm_inference_engine_tpu.ops import kv_cache as kvc
    from llm_inference_engine_tpu.ops.activations import (add_residual,
                                                          silu_and_mul)
    from llm_inference_engine_tpu.ops.attention import (
        attention_decode_fused_mxu)
    from llm_inference_engine_tpu.ops.embedding import embedding_lookup
    from llm_inference_engine_tpu.ops.linear import linear
    from llm_inference_engine_tpu.ops.rmsnorm import (add_residual_rmsnorm,
                                                      rmsnorm)
    from llm_inference_engine_tpu.ops.rope import split_qkv_rope
    from llm_inference_engine_tpu.ops.quant import QuantizedTensor
    from llm_inference_engine_tpu.runtime.engine import InferenceEngine

    cfg = get_config(MODEL)
    eng = EngineConfig(max_batch_size=B, max_seq_len=MAX_SEQ,
                       quant_mode=QUANT)
    # same watermark rule as engine.py:_kv_watermark (ADVICE r3: KV_HI must
    # follow --ctx, not stay pinned at the default ctx's 512)
    bucket = max(256, eng.block_kv)
    KV_HI = int(min(MAX_SEQ, -(-(ctx + 1) // bucket) * bucket))
    rtt = _measure_rtt()
    print(f"# profile_decode — {MODEL} {QUANT} B={B} ctx={ctx} "
          f"kv_hi={KV_HI} backend={jax.default_backend()} "
          f"tunnel_rtt={rtt*1e3:.2f}ms (subtracted; {ITERS} iters/dispatch)",
          flush=True)

    params = init_dummy_quantized_params(cfg, mode=QUANT, seed=0)
    L, Hd = cfg.num_layers, cfg.hidden_size
    K, D, Hq = cfg.num_kv_heads, cfg.head_dim, cfg.num_heads
    lay = params["layers"]
    kernels = eng.kernels

    cache = kvc.new_kv_cache(L, B, K, KV_HI, D, dtype=cfg.dtype,
                             pad_to_tiles=None)
    embedded = cache.embedded_scales
    # put real-looking lengths in
    q_start = jnp.full((B,), ctx, jnp.int32)
    kv_len = q_start + 1
    positions = q_start[:, None]
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, 1, Hd), jnp.bfloat16)
    sm_scale = 1.0 / math.sqrt(D)

    rows = []      # (name, per_call_s, calls_per_step, roofline_bytes)

    def add(name, dt, calls, roof_bytes):
        rows.append((name, dt, calls, roof_bytes))
        print(f"  {name:24s} {dt*1e6:9.2f} us x{calls:3d} "
              f"roof {roof_bytes/dt/HBM_BW*100 if dt else 0:6.1f}% "
              f"({roof_bytes/1e6:8.2f} MB)", flush=True)

    def qbytes(t: QuantizedTensor):
        # per-layer slice of the stacked tensor
        return (t.q.size * t.q.dtype.itemsize + t.scale.nbytes) // L

    print("# per-op isolation (layer index cycles 0..L-1 via carry):",
          flush=True)

    # ---- rmsnorm -----------------------------------------------------
    g = lay["attn_norm"][0]
    dt, _o = timeit_scan(lambda x: rmsnorm(x, g, cfg.rms_norm_eps,
                                           kernels=kernels), x0)
    add("rmsnorm", dt, L + 1, 2 * x0.nbytes + g.nbytes)

    # ---- stacked quantized matmuls (cycling layer idx) ---------------
    def mm_stacked(name, x_in, out_slice):
        t = lay[name]

        def step(c, t_):
            x, i = c
            y = linear(x, t_, kernels=kernels, layer=i % L)
            y2 = y.reshape(B, 1, -1)
            w = min(y2.shape[-1], x.shape[-1])
            return (x.at[..., :w].add(
                y2[..., :w].astype(x.dtype) * jnp.bfloat16(1e-8)), i + 1)

        dt, _o = timeit_scan(step, (x_in, jnp.int32(0)), consts=(t,))
        add(name, dt, L, qbytes(t) + x_in.nbytes + out_slice * B * 2)
        return dt

    mm_stacked("wqkv", x0, cfg.qkv_size)
    mm_stacked("wo", x0, Hd)
    mm_stacked("w_gate_up", x0, 2 * cfg.intermediate_size)
    xi = jax.random.normal(key, (B, 1, cfg.intermediate_size), jnp.bfloat16)
    mm_stacked("w_down", xi, Hd)

    # ---- rope split ---------------------------------------------------
    qkv = jax.random.normal(key, (B, 1, cfg.qkv_size), jnp.bfloat16)
    def rope_step(c):
        q, k, v = split_qkv_rope(c, positions, Hq, K, D, cfg.rope_theta,
                                 cfg.rope_scaling, kernels=kernels)
        return c.at[..., :Hq * D].add(
            q.reshape(B, 1, -1).astype(c.dtype) * jnp.bfloat16(1e-8))
    dt, _o = timeit_scan(rope_step, qkv)
    add("split_qkv_rope", dt, L, 2 * qkv.nbytes)

    # ---- fused decode attention (write+attend, cycling layers) -------
    qh = jax.random.normal(key, (B, 1, Hq, D), jnp.bfloat16)
    kn = jax.random.normal(key, (B, 1, K, D), jnp.bfloat16)

    def attn_step(c):
        q, kc, vc, i = c
        out, kc, vc = attention_decode_fused_mxu(
            q, kn, vn_const, kc, vc, q_start, kv_len, i % L,
            sm_scale=sm_scale, block_kv=eng.decode_block_kv, kv_hi=KV_HI,
            embedded=embedded, window=cfg.sliding_window)
        return (q + out.astype(q.dtype) * jnp.bfloat16(1e-8), kc, vc, i + 1)

    vn_const = kn
    ck, cv = cache.k, cache.v
    del cache
    dt, out = timeit_scan(attn_step, (qh, ck, cv, jnp.int32(0)),
                          donate=True)
    del ck, cv
    _, ck, cv, _ = out
    add("attn_decode_fused", dt, L, B * K * ctx * D * 2 * 2)

    # ---- add_residual_rmsnorm / silu / add_residual -------------------
    dt, _o = timeit_scan(lambda x: add_residual_rmsnorm(
        x, x0, g, cfg.rms_norm_eps, kernels=kernels)[0], x0)
    add("add_resid_rmsnorm", dt, L, 3 * x0.nbytes)

    gu = jax.random.normal(key, (B, 1, 2 * cfg.intermediate_size),
                           jnp.bfloat16)
    dt, _o = timeit_scan(lambda c: (silu_and_mul(c, kernels=kernels)
                                    .repeat(2, -1) * jnp.bfloat16(1e-8) + c),
                         gu)
    add("silu_and_mul", dt, L, gu.nbytes * 3 // 2)

    dt, _o = timeit_scan(lambda x: add_residual(x, x0, kernels=kernels),
                         x0)
    add("add_residual", dt, L, 3 * x0.nbytes)

    # ---- fixed tail ----------------------------------------------------
    ids = jnp.zeros((B, 1), jnp.int32)
    dt, _o = timeit_scan(lambda c, emb: embedding_lookup(
        emb, ids, kernels=kernels).astype(jnp.bfloat16)
        * jnp.bfloat16(1e-8) + c, x0, consts=(params["embed"],))
    add("embedding", dt, 1, B * Hd * 2)

    xh = x0[:, 0]
    def lm_step(c, w):
        y = linear(c, w, out_dtype=jnp.float32, kernels=kernels)
        return c + y[:, :Hd].astype(c.dtype) * jnp.bfloat16(1e-8)
    dt, _o = timeit_scan(lm_step, xh, consts=(params["lm_head"],))
    lmb = (qbytes(params["lm_head"]) * L if isinstance(
        params["lm_head"], QuantizedTensor) else params["lm_head"].nbytes)
    add("lm_head", dt, 1, lmb + B * cfg.vocab_size * 4)

    logits = jax.random.normal(key, (B, cfg.vocab_size), jnp.float32)
    dt, _o = timeit_scan(lambda c: c.at[:, 0].add(
        jnp.argmax(c, -1).astype(jnp.float32) * 1e-8), logits)
    add("greedy_argmax", dt, 1, logits.nbytes)

    # ---- the real _layer_step in situ (cycling layers) ----------------
    xs_layers = {k: v for k, v in lay.items()
                 if not isinstance(v, QuantizedTensor)}
    stacked = {k: v for k, v in lay.items() if isinstance(v, QuantizedTensor)}

    def layer_step(c, xs_l, stacked_):
        x, kc, vc, i = c
        li = i % L
        layer = {k: v[li] for k, v in xs_l.items()}
        layer["__stacked__"] = stacked_
        cc = kvc.KVCache(kc, vc, q_start)
        x_out, cc = llama_model._layer_step(
            cfg, eng, x, layer, li, cc, positions, q_start, kv_len,
            kv_hi=KV_HI)
        return (x_out, cc.k, cc.v, i + 1)

    dt_layer, out = timeit_scan(
        layer_step, (x0 + 0, ck, cv, jnp.int32(0)),
        consts=(xs_layers, stacked), donate=True)
    _, ck, cv, _ = out
    add("LAYER_IN_SITU", dt_layer, L, 0)

    # ---- layer ablation: attribute the in-situ minus sum-of-parts gap ---
    # Each variant rebuilds the layer sandwich with pieces replaced by
    # identities; the in-situ delta between variants is that piece's REAL
    # (non-overlapped) cost — isolated per-op numbers miss DMA/compute
    # overlap (the silu A/B lesson: 12 us isolated, ~0 in situ).
    def layer_variant(c, xs_l, stacked_, *, rope=True, norms=True,
                      act=True, resid=True):
        x, kc, vc, i = c
        li = i % L
        layer = {kname: v[li] for kname, v in xs_l.items()}

        def lin(name, inp):
            return linear(inp, stacked_[name], kernels=kernels, layer=li)

        h = (rmsnorm(x, layer["attn_norm"], cfg.rms_norm_eps,
                     kernels=kernels) if norms else x)
        qkv_ = lin("wqkv", h)
        if rope:
            qq, kk, vv = split_qkv_rope(qkv_, positions, Hq, K, D,
                                        cfg.rope_theta, cfg.rope_scaling,
                                        kernels=kernels)
        else:
            qq = qkv_[..., :Hq * D].reshape(B, 1, Hq, D)
            kk = qkv_[..., Hq * D:(Hq + K) * D].reshape(B, 1, K, D)
            vv = qkv_[..., (Hq + K) * D:].reshape(B, 1, K, D)
        out_a, kc, vc = attention_decode_fused_mxu(
            qq, kk, vv, kc, vc, q_start, kv_len, li, sm_scale=sm_scale,
            block_kv=eng.decode_block_kv, kv_hi=KV_HI, embedded=embedded,
            window=cfg.sliding_window)
        attn_o = lin("wo", out_a.reshape(B, 1, Hq * D))
        if resid and norms:
            ffn_in, res = add_residual_rmsnorm(
                attn_o, x, layer["ffn_norm"], cfg.rms_norm_eps,
                kernels=kernels)
        else:
            ffn_in, res = attn_o, x
        gu_ = lin("w_gate_up", ffn_in)
        a = (silu_and_mul(gu_, kernels=kernels) if act
             else gu_[..., :cfg.intermediate_size])
        dn = lin("w_down", a)
        x_out = add_residual(dn, res, kernels=kernels) if resid else dn
        return (x_out.astype(x.dtype), kc, vc, i + 1)

    variants = [
        ("full(rebuilt)", {}),
        ("-rope", dict(rope=False)),
        ("-norms", dict(norms=False)),
        ("-silu", dict(act=False)),
        ("-resid", dict(resid=False)),
        ("bare(mm+attn)", dict(rope=False, norms=False, act=False,
                               resid=False)),
    ]
    print("# layer ablation (in-situ deltas attribute non-overlapped "
          "cost):", flush=True)
    for vname, kw in variants:
        def step_v(c, xs_l, stacked_, _kw=kw):
            return layer_variant(c, xs_l, stacked_, **_kw)
        dt_v, out = timeit_scan(step_v, (x0 + 0, ck, cv, jnp.int32(0)),
                                consts=(xs_layers, stacked), donate=True)
        _, ck, cv, _ = out
        print(f"  {vname:16s} {dt_v*1e6:9.2f} us/layer "
              f"(delta vs full {1e6*(dt_v-dt_layer):+8.2f})", flush=True)
    del ck, cv, out

    # ---- rollout bisect: the same decode step rebuilt in layers ---------
    # (a) bare forward_hidden in a scan (embed -> 32 layers -> final norm
    #     -> lm head last-token) + argmax feedback — the rollout body
    #     minus the engine's wrapping. Gap between (a) and the engine
    #     rollout below = engine-level overhead (donation, lengths
    #     bookkeeping); gap between LAYER_IN_SITU*32+fixed and (a) =
    #     cross-layer scheduling effects.
    cache_b = kvc.new_kv_cache(L, B, K, MAX_SEQ, D, dtype=cfg.dtype,
                               pad_to_tiles=None)
    import dataclasses as _dc
    cache_b = _dc.replace(cache_b, lengths=jnp.full((B,), ctx, jnp.int32))
    tok0 = jnp.zeros((B,), jnp.int32)

    def fwd_step(c, params_):
        ck_, cv_, ln, tok = c
        cc = kvc.KVCache(ck_, cv_, ln)
        logits_, cc = llama_model.forward_hidden(
            cfg, eng, params_, tok[:, None], cc, ln, ln + 1, kv_hi=KV_HI)
        nxt = jnp.argmax(logits_, axis=-1).astype(jnp.int32)
        # hold ctx fixed: write always lands at `ctx` (same work per iter,
        # no cache overflow across the 1024-iter timing scans)
        return (cc.k, cc.v, ln * 0 + ctx, nxt)

    dt_fwd, out = timeit_scan(
        fwd_step, (cache_b.k, cache_b.v, cache_b.lengths, tok0),
        consts=(params,), iters=256, donate=True)
    del cache_b, out
    print(f"# fwd_hidden-in-scan step {dt_fwd*1e3:9.3f} ms "
          f"(vs sum-of-parts: see reconciliation)", flush=True)

    # ---- whole rollout step (bench.py config) --------------------------
    import gc
    gc.collect()
    engine = InferenceEngine(cfg, eng, params)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, size=128).tolist()
               for _ in range(B)]
    logits = engine.prefill(prompts)
    tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    toks = engine.decode_rollout(tokens, 64)
    _ = np.asarray(toks[-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        toks = engine.decode_rollout(toks[-1], 64)
        _ = np.asarray(toks[-1])
        best = min(best, time.perf_counter() - t0)
    dt_step = (best - _RTT[0]) / 64

    # ---- reconciliation -------------------------------------------------
    per_op_layer = sum(dt * c for name, dt, c, _ in rows
                       if name not in ("LAYER_IN_SITU", "embedding",
                                       "lm_head", "greedy_argmax")) / L
    fixed = sum(dt for name, dt, c, _ in rows
                if name in ("embedding", "lm_head", "greedy_argmax"))
    wbytes = param_bytes(params)
    kv_bytes = L * 2 * K * ctx * D * 2 * B
    roof_step = (wbytes + kv_bytes) / HBM_BW

    print(f"\n# sum(per-op)/layer      {per_op_layer*1e6:9.2f} us")
    print(f"# layer in-situ          {dt_layer*1e6:9.2f} us "
          f"(fusion/overhead delta {(dt_layer-per_op_layer)*1e6:+.2f} us)")
    print(f"# layers x{L}            {dt_layer*L*1e3:9.3f} ms")
    print(f"# fixed tail             {fixed*1e6:9.2f} us")
    print(f"# sum-of-parts step      {(dt_layer*L+fixed)*1e3:9.3f} ms")
    print(f"# FULL rollout step      {dt_step*1e3:9.3f} ms "
          f"(scan/residual overhead "
          f"{(dt_step-dt_layer*L-fixed)*1e3:+.3f} ms)")
    print(f"# roofline step          {roof_step*1e3:9.3f} ms "
          f"({wbytes/1e9:.2f} GB weights + {kv_bytes/1e9:.2f} GB KV)")
    print(f"# achieved               {roof_step/dt_step*100:.1f}% of roofline"
          f" ({B/dt_step:,.0f} tok/s)")


if __name__ == "__main__":
    main()
