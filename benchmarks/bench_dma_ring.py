"""Probe: HBM streaming rate of small blocks vs DMA pipeline depth.

The fused decode attention streams [bk, K*D] kv blocks through the
standard Pallas double-buffered grid. Measured rates (bench_decode_attn_
blocks): bk=128 (1 MB DMAs) -> 96% of BW, bk=32 (256 KB) -> 59%. If the
small-block loss is outstanding-request starvation (2 buffers x ~2-3 us
DMA latency), a manual ring of N in-flight copies recovers it and a
fine-grained-tail decode kernel becomes viable; if HBM simply dislikes
256 KB requests, it will not.

Usage: python benchmarks/bench_dma_ring.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HBM_BW = 819e9
KD = 4096           # K*D lanes of a 7B kv row
ROWS = 4096         # total rows to stream per call
ITERS = 256

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


def ring_kernel(off_ref, src_ref, o_ref, buf, sems, acc, *, bkt, nbuf,
                nblk):
    """Stream src [ROWS, KD] through a VMEM ring of nbuf [bkt, KD]
    buffers, reducing each block into acc (keeps the VPU lightly busy,
    like the attention kernel's per-block softmax math)."""
    off = off_ref[0]

    def issue(i):
        pltpu.make_async_copy(
            src_ref.at[pl.ds(off + i * bkt, bkt), :], buf.at[i % nbuf],
            sems.at[i % nbuf]).start()

    def wait(i):
        pltpu.make_async_copy(
            src_ref.at[pl.ds(off + i * bkt, bkt), :], buf.at[i % nbuf],
            sems.at[i % nbuf]).wait()

    acc[...] = jnp.zeros_like(acc)
    for i in range(min(nbuf, nblk)):
        issue(i)

    def body(i, carry):
        wait(i)
        a = acc[...]
        acc[...] = a + jnp.sum(buf[i % nbuf].astype(jnp.float32), axis=0,
                               keepdims=True)

        @pl.when(i + nbuf < nblk)
        def _():
            issue(i + nbuf)
        return carry

    jax.lax.fori_loop(0, nblk, body, 0)
    o_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("bkt", "nbuf"))
def run_ring(src, off, bkt, nbuf):
    nblk = ROWS // bkt
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, KD), lambda i, o: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nbuf, bkt, KD), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.VMEM((1, KD), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(ring_kernel, bkt=bkt, nbuf=nbuf, nblk=nblk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, KD), jnp.float32),
    )(off.reshape(1), src)


def bench(bkt, nbuf):
    src = jnp.ones((ROWS + 128, KD), jnp.bfloat16)

    @jax.jit
    def loop(c, s):
        def body(carry, _):
            c, i = carry
            y = run_ring(s, i % 64, bkt, nbuf)
            return (c + y[:, :1] * 1e-9, i + 1), None
        (out, _), _ = jax.lax.scan(body, (c, jnp.int32(0)), None,
                                   length=ITERS)
        return out

    c0 = jnp.zeros((1, 1), jnp.float32)
    try:
        _ = np.asarray(loop(c0, src))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(loop(c0, src))
            best = min(best, time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001
        print(f"  bkt={bkt:<4d} nbuf={nbuf}  FAILED: "
              f"{str(e).splitlines()[0][:80]}", flush=True)
        return
    dt = max(best - _RTT[0], 1e-9) / ITERS
    gbs = src.nbytes / dt / 1e9
    print(f"  bkt={bkt:<4d} nbuf={nbuf}  {dt*1e6:8.2f} us  {gbs:6.1f} GB/s "
          f"({gbs*1e9/HBM_BW*100:5.1f}%)", flush=True)


def main():
    rtt = _measure_rtt()
    print(f"# bench_dma_ring — stream {ROWS}x{KD} bf16 "
          f"({ROWS*KD*2//2**20} MB) per call, rtt={rtt*1e3:.2f}ms",
          flush=True)
    for bkt in (32, 64, 128):
        for nbuf in (2, 4, 8):
            bench(bkt, nbuf)


if __name__ == "__main__":
    main()
