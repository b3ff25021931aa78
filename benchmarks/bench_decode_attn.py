"""Micro-bench: decode attention kernel variants at 7B shapes (TPU).

Compares the shipped VPU matvec decode path against an MXU block-diagonal
prototype: kv blocks [bk, K, D] are viewed as [bk, K*D] (free reshape in
the token-major layout) and dotted against a block-diagonal query matrix
[K*D, H] built once per sequence — the kv stream feeds the MXU natively
(int8 too), the VPU never touches it.

Usage: python benchmarks/bench_decode_attn.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, G, D, S = 8, 32, 1, 128, 512     # 7B MHA decode, kv_hi=512
H = K * G
KD = K * D
NEG = -1e30


def scan_bench(step_fn, x0, *wargs, lo=300, hi=2300):
    def make(steps):
        @jax.jit
        def run(x, *w):
            def body(c, _):
                y = step_fn(c, *w)
                return c + 1e-6 * y.reshape(-1)[:1].astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, None, length=steps)
            return c
        return run
    times = {}
    for steps in (lo, hi):
        run = make(steps)
        _ = np.asarray(run(x0, *wargs))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run(x0, *wargs))
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    return (times[hi] - times[lo]) / (hi - lo)


# ---------------------------------------------------------------------------
# shipped VPU matvec (simplified, bf16, no layer axis)
# ---------------------------------------------------------------------------

def vpu_kernel(kl_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
               bk, nkv, sm_scale):
    b = pl.program_id(0)
    ikv = pl.program_id(1)
    kv_len = kl_ref[b]

    @pl.when(ikv == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    start = ikv * bk

    @pl.when(start < kv_len)
    def _():
        q = q_ref[0].astype(jnp.float32)              # [K, D]
        kf = k_ref[0].astype(jnp.float32)             # [bk, K, D]
        vf = v_ref[0].astype(jnp.float32)
        cols = (jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) + start)
        mask = cols < kv_len
        s = jnp.sum(kf * q[None], axis=2) * sm_scale  # [bk, K]
        s = jnp.where(mask, s, NEG)
        m_prev, l_prev = m_ref[:], l_ref[:]
        m_curr = jnp.max(s, axis=0)[:, None]
        m_new = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new.reshape(-1)[None, :])
        p = jnp.where(mask, p, 0.0)
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=0)[:, None]
        pv = jnp.sum(vf * p[:, :, None], axis=0)      # [K, D]
        acc_ref[:] = acc_ref[:] * alpha[:, :, None] + pv[:, None, :]
        m_ref[:] = m_new

    @pl.when(ikv == nkv - 1)
    def _():
        l = l_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l[:, :, None]).reshape(K, D).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# MXU block-diagonal prototype
# ---------------------------------------------------------------------------

def mxu_kernel(kl_ref, q_ref, k_ref, v_ref, o_ref, qd_ref, m_ref, l_ref,
               acc_ref, *, bk, nkv, sm_scale, kv_dtype):
    b = pl.program_id(0)
    ikv = pl.program_id(1)
    kv_len = kl_ref[b]

    @pl.when(ikv == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # block-diagonal q: qd[k*D+d, h] = q[h, d] where k == h // G
        q = q_ref[0]                                   # [H, D]
        qT = q.reshape(H, D)
        row = jax.lax.broadcasted_iota(jnp.int32, (KD, H), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (KD, H), 1)
        qexp = jnp.take(qT, col % H, axis=0)  # placeholder; real build below
        del qexp
        # build via reshape-broadcast: [K, D, H] where slot (k, d, h)
        # holds q[h, d] iff h//G == k
        qkdh = jnp.broadcast_to(
            jnp.swapaxes(qT, 0, 1)[None, :, :], (K, D, H))  # q[h, d] at (., d, h)
        kk = jax.lax.broadcasted_iota(jnp.int32, (K, D, H), 0)
        hh = jax.lax.broadcasted_iota(jnp.int32, (K, D, H), 2)
        qd = jnp.where(hh // G == kk, qkdh, 0)
        qd_ref[:] = qd.reshape(KD, H).astype(qd_ref.dtype)

    start = ikv * bk

    @pl.when(start < kv_len)
    def _():
        k2 = k_ref[0].reshape(bk, KD)                  # int8/bf16, no VPU touch
        v2 = v_ref[0].reshape(bk, KD)
        s = jax.lax.dot_general(
            k2, qd_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale   # [bk, H]
        cols = (jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) + start)
        mask = cols < kv_len
        s = jnp.where(mask, s, NEG)
        m_prev, l_prev = m_ref[:], l_ref[:]            # [H, 1]
        m_curr = jnp.max(s, axis=0)[:, None]
        m_new = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new.reshape(-1)[None, :])
        p = jnp.where(mask, p, 0.0)                    # [bk, H]
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=0)[:, None]
        pv2 = jax.lax.dot_general(
            p.astype(kv_dtype if kv_dtype == jnp.bfloat16 else jnp.bfloat16),
            v2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [H, KD]
        acc_ref[:] = acc_ref[:] * alpha + pv2
        m_ref[:] = m_new

    @pl.when(ikv == nkv - 1)
    def _():
        l = l_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)
        acc = acc_ref[:] / l                           # [H, KD]
        # extract diagonal blocks: out[h, d] = acc[h, (h//G)*D + d]
        a3 = acc.reshape(H, K, D)
        hh = jax.lax.broadcasted_iota(jnp.int32, (H, K, D), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (H, K, D), 1)
        out = jnp.sum(jnp.where(hh // G == kk, a3, 0.0), axis=1)   # [H, D]
        o_ref[0] = out.astype(o_ref.dtype)


def run_variant(name, kern_builder, kv_dtype, bk):
    key = jax.random.PRNGKey(0)
    nkv = S // bk
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, H, D), jnp.bfloat16)
    if kv_dtype == jnp.int8:
        kc = jax.jit(lambda k: jax.random.randint(
            k, (B, S, K, D), -127, 128, jnp.int32).astype(jnp.int8))(
                jax.random.fold_in(key, 2))
        vc = jax.jit(lambda k: jax.random.randint(
            k, (B, S, K, D), -127, 128, jnp.int32).astype(jnp.int8))(
                jax.random.fold_in(key, 3))
    else:
        kc = jax.random.normal(jax.random.fold_in(key, 2), (B, S, K, D),
                               jnp.bfloat16)
        vc = jax.random.normal(jax.random.fold_in(key, 3), (B, S, K, D),
                               jnp.bfloat16)
    kl = jnp.full((B,), S, jnp.int32)
    f = kern_builder(kv_dtype, bk, nkv)
    y = f(kl, q, kc, vc)
    t = scan_bench(lambda c, kc=kc, vc=vc: f(kl, c, kc, vc), q)
    bytes_mv = B * S * K * D * 2 * (1 if kv_dtype == jnp.int8 else 2)
    print(f"{name}: {t*1e6:6.1f} us  {bytes_mv/t/1e9:6.1f} GB/s eff",
          flush=True)
    return y


def build_vpu(kv_dtype, bk, nkv):
    kern = functools.partial(vpu_kernel, bk=bk, nkv=nkv,
                             sm_scale=1.0 / np.sqrt(D))
    return jax.jit(pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nkv),
            in_specs=[pl.BlockSpec((1, H, D), lambda b, j, kl: (b, 0, 0)),
                      pl.BlockSpec((1, bk, K, D), lambda b, j, kl: (b, j, 0, 0)),
                      pl.BlockSpec((1, bk, K, D), lambda b, j, kl: (b, j, 0, 0))],
            out_specs=pl.BlockSpec((1, K, D), lambda b, j, kl: (b, 0, 0)),
            scratch_shapes=[pltpu.VMEM((K, 1), jnp.float32),
                            pltpu.VMEM((K, 1), jnp.float32),
                            pltpu.VMEM((K, 1, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, K, D), jnp.bfloat16),
    ))


def build_mxu(kv_dtype, bk, nkv):
    kern = functools.partial(mxu_kernel, bk=bk, nkv=nkv,
                             sm_scale=1.0 / np.sqrt(D), kv_dtype=kv_dtype)
    return jax.jit(pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nkv),
            in_specs=[pl.BlockSpec((1, H, D), lambda b, j, kl: (b, 0, 0)),
                      pl.BlockSpec((1, bk, K, D), lambda b, j, kl: (b, j, 0, 0)),
                      pl.BlockSpec((1, bk, K, D), lambda b, j, kl: (b, j, 0, 0))],
            out_specs=pl.BlockSpec((1, H, D), lambda b, j, kl: (b, 0, 0)),
            scratch_shapes=[pltpu.VMEM((KD, H), jnp.bfloat16),
                            pltpu.VMEM((H, 1), jnp.float32),
                            pltpu.VMEM((H, 1), jnp.float32),
                            pltpu.VMEM((H, KD), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), jnp.bfloat16),
    ))


def main():
    # numerics: MXU bf16 vs VPU bf16 on same inputs
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, H, D), jnp.bfloat16)
    kc = jax.random.normal(jax.random.fold_in(key, 2), (B, S, K, D), jnp.bfloat16)
    vc = jax.random.normal(jax.random.fold_in(key, 3), (B, S, K, D), jnp.bfloat16)
    kl = jnp.full((B,), S, jnp.int32)
    bk = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    nkv = S // bk
    y_vpu = np.asarray(build_vpu(jnp.bfloat16, bk, nkv)(kl, q, kc, vc), np.float32)
    y_mxu = np.asarray(build_mxu(jnp.bfloat16, bk, nkv)(kl, q, kc, vc), np.float32)
    err = np.abs(y_vpu - y_mxu).max() / np.abs(y_vpu).max()
    print(f"bf16 MXU vs VPU rel err: {err:.5f}", flush=True)

    run_variant(f"vpu bf16 bk={bk}", build_vpu, jnp.bfloat16, bk)
    run_variant(f"mxu bf16 bk={bk}", build_mxu, jnp.bfloat16, bk)
    run_variant(f"mxu int8 bk={bk}", build_mxu, jnp.int8, bk)


if __name__ == "__main__":
    main()
