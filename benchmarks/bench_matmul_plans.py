"""Block-plan sweep for the fused int4/int8 dequant-matmul at decode shapes.

VERDICT r4 #1: wo (K=4096, N=4096) and w_down (K=11008, N=4096) stream at
50.7% of the HBM roofline while wqkv (K=4096, N=12288) reaches 81%. This
tool times `_quantized_matmul_pallas` directly at the exact decode shapes
(m=8, stacked layer-indexed weights, cycling layer index per scan step —
identical to benchmarks/profile_decode.py's per-op rows) across a grid of
(bm, bn, bk) plans plus a K-padded variant (11008 -> 11264, zeros in the
tail) that restores a grouped-divisor bk.

Usage: python benchmarks/bench_matmul_plans.py [shape ...]
       shapes: wqkv wo gate_up w_down (default: all)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import llm_inference_engine_tpu.ops.quant as Q

HBM_BW = 819e9
M = 8
L = 8            # stacked layers to cycle through (enough to defeat reuse)
GS = 128
ITERS = 1024

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


def timeit_scan(step, carry0, consts=()):
    @jax.jit
    def loop(c, *cs):
        def body(c, _):
            return step(c, *cs), None
        out, _ = jax.lax.scan(body, c, None, length=ITERS)
        return out

    out = loop(carry0, *consts)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(carry0, *consts)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - _RTT[0], 1e-9 * ITERS) / ITERS


def make_stacked(k, n, structured=False, seed=0):
    rng = np.random.default_rng(seed)
    if structured:
        q = rng.integers(-127, 127, size=(L, 2, k // 2, n)).astype(np.int8)
        sc = (rng.standard_normal((L, 2, k // GS, n)).astype(np.float32) ** 2
              + 1e-3)
    else:
        q = rng.integers(-127, 127, size=(L, k // 2, n)).astype(np.int8)
        sc = (rng.standard_normal((L, k // GS, n)).astype(np.float32) ** 2
              + 1e-3)
    return jnp.asarray(q), jnp.asarray(sc)


def bench_plan(name, k, n, bm, bn, bk, structured=False, k_pad=0):
    """Time the stacked int4 kernel at (bm, bn, bk); returns GB/s of weight
    stream (the roofline-defining quantity). k_pad > 0 appends zero rows to
    the weight/scale/x so bk divides (k + k_pad)."""
    kk = k + k_pad
    q, sc = make_stacked(kk, n, structured)
    if k_pad:
        # zero the padded tail so numerics stay exact
        if structured:
            q = q.at[:, :, k // 2:, :].set(0)
        else:
            q = q.at[:, k // 2:, :].set(0)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((M, kk)), jnp.bfloat16)
    if k_pad:
        x = x.at[:, k:].set(0)

    def step(c, q_, sc_):
        x_, i = c
        y = Q._quantized_matmul_pallas(
            x_, q_, sc_, "int4", GS, jnp.dtype(jnp.bfloat16),
            bm, bn, bk, False, layer=i % L)
        y2 = y.reshape(M, -1)
        w = min(y2.shape[-1], kk)
        return (x_.at[:, :w].add(y2[:, :w] * jnp.bfloat16(1e-8)), i + 1)

    try:
        dt = timeit_scan(step, (x, jnp.int32(0)), consts=(q, sc))
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:90]
        print(f"  {name:10s} bm={bm:<4d} bn={bn:<5d} bk={bk:<6d} "
              f"pad={k_pad:<4d} FAILED: {msg}", flush=True)
        return None
    wbytes = (q.size + sc.size * 4) // L
    gbs = wbytes / dt / 1e9
    print(f"  {name:10s} bm={bm:<4d} bn={bn:<5d} bk={bk:<6d} pad={k_pad:<4d} "
          f"{dt*1e6:8.2f} us  {gbs:6.1f} GB/s  roof {gbs*1e9/HBM_BW*100:5.1f}%",
          flush=True)
    return dt


def main():
    which = sys.argv[1:] or ["wqkv", "wo", "gate_up", "w_down"]
    rtt = _measure_rtt()
    print(f"# bench_matmul_plans — int4 m={M} L={L} stacked, cycling layer "
          f"(backend={jax.default_backend()}, rtt={rtt*1e3:.2f}ms subtracted)",
          flush=True)

    if "wqkv" in which:
        print("wqkv K=4096 N=12288 (r4: 81.2%)", flush=True)
        for bn in (1024, 2048, 4096):
            bench_plan("wqkv", 4096, 12288, 8, bn, 1024)
        bench_plan("wqkv", 4096, 12288, 8, 1024, 4096)
        bench_plan("wqkv", 4096, 12288, 8, 2048, 4096)

    if "wo" in which:
        print("wo K=4096 N=4096 (r4: 50.7%)", flush=True)
        for bn in (1024, 2048, 4096):
            for bk in (1024, 2048, 4096):
                bench_plan("wo", 4096, 4096, 8, bn, bk)

    if "gate_up" in which:
        print("gate_up K=4096 N=2x11008 structured (r4: 76.3%)", flush=True)
        for bn in (1376, 2752, 5504):
            bench_plan("gate_up", 4096, 11008, 8, bn, 1024, structured=True)
        bench_plan("gate_up", 4096, 11008, 8, 2752, 2048, structured=True)
        bench_plan("gate_up", 4096, 11008, 8, 1376, 4096, structured=True)
        bench_plan("gate_up", 4096, 11008, 8, 2752, 4096, structured=True)

    if "w_down" in which:
        print("w_down K=11008 N=4096 (r4: 50.7%, full-K fallback)",
              flush=True)
        # current full-K fallback at a few bn
        for bn in (512, 1024):
            bench_plan("w_down", 11008, 4096, 8, bn, 11008)
        # K-padded to 11264 = 11 * 1024: grouped-divisor blocks return
        for bk in (1024, 2048):
            for bn in (1024, 2048, 4096):
                if bk == 2048 and 11264 % 2048:
                    continue
                bench_plan("w_down", 11008, 4096, 8, bn, bk, k_pad=256)
        # K-padded to 11264 with larger divisor blocks
        bench_plan("w_down", 11008, 4096, 8, 1024, 5632, k_pad=256)
        # K-padded to 12288 (heavier pad, 2048-divisor)
        bench_plan("w_down", 11008, 4096, 8, 2048, 2048, k_pad=1280)


if __name__ == "__main__":
    main()


def bench_prod(name, k, n, structured=False, layers=L, mode="int4"):
    """Time the full production `quantized_linear` stacked path (what
    profile_decode.py's per-op rows go through) for comparison with the
    direct-kernel rows."""
    q, sc = make_stacked(k, n, structured, )
    if layers != L:
        reps = layers // L
        q = jnp.concatenate([q] * reps, axis=0)
        sc = jnp.concatenate([sc] * reps, axis=0)
    t = Q.QuantizedTensor(q=q, scale=sc, mode=mode, group_size=GS)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((M, 1, k)), jnp.bfloat16)

    def step(c, q_, sc_):
        x_, i = c
        t_ = Q.QuantizedTensor(q=q_, scale=sc_, mode=mode, group_size=GS)
        y = Q.quantized_linear(x_, t_, layer=i % layers, kernels="pallas")
        y2 = y.reshape(M, 1, -1)
        w = min(y2.shape[-1], k)
        return (x_.at[..., :w].add(y2[..., :w] * jnp.bfloat16(1e-8)), i + 1)

    dt = timeit_scan(step, (x, jnp.int32(0)), consts=(q, sc))
    wbytes = (q.size + sc.size * 4) // layers
    gbs = wbytes / dt / 1e9
    print(f"  {name:10s} PROD L={layers:<3d} {'':14s} "
          f"{dt*1e6:8.2f} us  {gbs:6.1f} GB/s  roof {gbs*1e9/HBM_BW*100:5.1f}%",
          flush=True)
    return dt
