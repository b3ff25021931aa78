"""Micro-bench: INT4 fused dequant-matmul kernel variants (TPU).

Compares the shipped kernel against bitcast-based prototypes:
- current: manual i32 shift unpack + weight-side scales (ops/quant.py)
- wscale:  pltpu.bitcast int8->int4 hardware unpack, weight-side scales
- pscale:  bitcast unpack, per-group batched dots, scales on partials
- noscale: bitcast unpack only (lower-bound probe, wrong numerics)

Usage: python benchmarks/bench_int4_variants.py [M] [variant ...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, N, GS = 4096, 4096, 128
S_LO, S_HI = 500, 4500


def scan_bench(step_fn, x0, *wargs):
    """Per-step time via two scan lengths: the difference cancels the fixed
    host<->device tunnel round-trip (~30 ms), which otherwise swamps
    microsecond kernels."""
    def make(steps):
        @jax.jit
        def run(x, *w):
            def body(c, _):
                y = step_fn(c, *w)
                return c + 1e-6 * y[:, :1].astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, None, length=steps)
            return c
        return run

    times = {}
    for steps in (S_LO, S_HI):
        run = make(steps)
        _ = np.asarray(run(x0, *wargs))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run(x0, *wargs))
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    return (times[S_HI] - times[S_LO]) / (S_HI - S_LO)


def kern_wscale(x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk, gs):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    w = pltpu.bitcast(q_ref[...], jnp.int4).astype(jnp.float32)
    gb = w.shape[0] // gs
    s = s_ref[...].reshape(gb, 1, -1)
    w = (w.reshape(gb, gs, -1) * s).reshape(w.shape).astype(x_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(x_ref[:], w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def kern_pscale(x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk, gs):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    w = pltpu.bitcast(q_ref[...], jnp.int4).astype(x_ref.dtype)
    bk = w.shape[0]
    gb = bk // gs
    xb = x_ref[:]
    xg = xb.reshape(xb.shape[0], gb, gs).swapaxes(0, 1)
    wg = w.reshape(gb, gs, -1)
    p = jax.lax.dot_general(xg, wg, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s_ref[...]
    acc_ref[:] += jnp.sum(p * s[:, None, :], axis=0)

    @pl.when(ik == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def kern_noscale(x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk, gs):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    w = pltpu.bitcast(q_ref[...], jnp.int4).astype(x_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(x_ref[:], w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


KERNS = {"wscale": kern_wscale, "pscale": kern_pscale, "noscale": kern_noscale}


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    variants = sys.argv[2:] or ["current", "wscale", "pscale", "noscale"]
    rng = np.random.default_rng(0)
    w_np = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    scale_np = (rng.standard_normal((K // GS, N)).astype(np.float32) ** 2
                + 0.01)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

    import llm_inference_engine_tpu.ops.quant as Q
    lo = w_np[0::2].astype(np.uint8) & 0xF
    hi = (w_np[1::2].astype(np.uint8) & 0xF) << 4
    packed = jnp.asarray((lo | hi).astype(np.int8))
    scales = jnp.asarray(scale_np)

    bk, bn = 1024, 1024
    nk = K // bk
    gb = bk // GS
    bm = min(M, 256)

    for name in variants:
        if name == "current":
            qt = Q.QuantizedTensor(
                q=jnp.asarray(np.asarray(Q._pack_int4(jnp.asarray(w_np), GS))),
                scale=scales, mode="int4", group_size=GS)
            t = scan_bench(
                lambda c, qt=qt: Q.quantized_linear(c, qt, kernels="pallas"),
                x)
        else:
            f = pl.pallas_call(
                functools.partial(KERNS[name], nk=nk, gs=GS),
                grid=(M // bm, N // bn, nk),
                in_specs=[
                    pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                    pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j)),
                    pl.BlockSpec((gb, bn), lambda i, j, k: (k, j))],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary")),
            )
            t = scan_bench(lambda c, f=f: f(c, packed, scales), x)
        print(f"M={M} {name}: {t*1e6:7.0f} us  {(K*N/2)/t/1e9:6.1f} GB/s eff",
              flush=True)


if __name__ == "__main__":
    main()
