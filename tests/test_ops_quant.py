"""Unit tests: INT8/INT4 weight quantization + fused dequant matmul.

No reference counterpart exists — quantization was planned, never built
(reference README.md:36-39) — so the goldens here are the quantization
error bound and the XLA dequant matmul.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from llm_inference_engine_tpu.ops.quant import (
    QuantizedTensor, dequantize_tensor, quantize_tensor, quantized_linear,
    quantized_linear_xla)


@pytest.mark.parametrize("mode,tol", [("int8", 0.012), ("int4", 0.16)])
def test_quantize_roundtrip_error(rng, mode, tol):
    w = rng.normal(size=(256, 128)).astype(np.float32)
    t = quantize_tensor(jnp.asarray(w), mode, 128)
    back = np.asarray(dequantize_tensor(t))
    # absmax-symmetric error bound: half an LSB of the per-col/group scale
    err = np.abs(back - w).max()
    assert err < tol * np.abs(w).max(), err


@pytest.mark.parametrize("mode", ["int8", "int4"])
@pytest.mark.parametrize("m,k,n", [(5, 256, 128), (64, 512, 384), (1, 128, 256)])
def test_quantized_linear_pallas_vs_xla(rng, mode, m, k, n):
    w = rng.normal(size=(k, n)).astype(np.float32)
    x = rng.normal(size=(m, k)).astype(np.float32)
    t = quantize_tensor(jnp.asarray(w), mode, 128)
    got = np.asarray(quantized_linear(jnp.asarray(x), t, kernels="pallas"))
    want = np.asarray(quantized_linear_xla(jnp.asarray(x), t))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quantized_linear_close_to_full_precision(rng, mode):
    k, n = 512, 256
    w = (rng.normal(size=(k, n)) * 0.02).astype(np.float32)
    x = rng.normal(size=(8, k)).astype(np.float32)
    t = quantize_tensor(jnp.asarray(w), mode, 128)
    got = np.asarray(quantized_linear(jnp.asarray(x), t, kernels="pallas"))
    want = x @ w
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < (0.02 if mode == "int8" else 0.2), rel


@pytest.mark.parametrize("mode", ["int8", "int4"])
@pytest.mark.parametrize("k", [1280, 1408])
def test_quantized_linear_ragged_k(rng, mode, k):
    """Contraction dims that 1024 does not divide (Llama's 11008 FFN dim is
    the production case). The int8 kernel masks the ragged last K block's x
    tail; the int4 kernel picks a divisor block (ops/quant._pick_bk) — on
    real hardware the unmasked/non-divisor form read unspecified
    out-of-bounds block data (~16% error at 7B)."""
    n, m = 256, 8
    w = (rng.normal(size=(k, n)) * 0.02).astype(np.float32)
    x = rng.normal(size=(m, k)).astype(np.float32)
    t = quantize_tensor(jnp.asarray(w), mode, 128)
    got = np.asarray(quantized_linear(jnp.asarray(x), t, kernels="pallas"))
    want = np.asarray(quantized_linear_xla(jnp.asarray(x), t))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_pick_bk_divisor_plan():
    from llm_inference_engine_tpu.ops.quant import _pick_bk
    assert _pick_bk(4096, 128) == 1024
    assert _pick_bk(11008, 128) == 5504     # only tiny divisors <= 1024
    assert _pick_bk(13824, 128) == 768      # 13B FFN dim
    assert _pick_bk(5632, 128) == 512       # TinyLlama FFN dim
    assert _pick_bk(512, 128) == 512        # k <= target: one full block
    for k, bk in ((4096, 1024), (11008, 5504), (13824, 768), (5632, 512)):
        assert k % bk == 0


def test_int4_pack_is_sublane_interleaved(rng):
    """Byte r must hold row 2r in the low nibble and row 2r+1 in the high —
    the exact layout pltpu.bitcast(..., int4) unpacks (hardware sub-byte
    cast; any other layout silently permutes the weight rows)."""
    from llm_inference_engine_tpu.ops.quant import _pack_int4, _unpack_int4
    q = rng.integers(-8, 8, size=(16, 4)).astype(np.int8)
    packed = np.asarray(_pack_int4(jnp.asarray(q)))
    assert packed.shape == (8, 4)
    assert (packed[0] & 0xF == (q[0] & 0xF)).all()          # row 0 -> low
    assert ((packed[0] >> 4) & 0xF == (q[1] & 0xF)).all()   # row 1 -> high
    np.testing.assert_array_equal(np.asarray(_unpack_int4(jnp.asarray(packed))), q)


def test_quantized_tensor_is_pytree():
    """Scan/tree_map must preserve static fields when slicing stacked
    quantized layers (models/weights.py stacks on a leading L axis)."""
    import jax

    w = jnp.ones((2, 128, 64))
    qs = [quantize_tensor(w[i], "int4", 64) for i in range(2)]
    stacked = QuantizedTensor(
        q=jnp.stack([t.q for t in qs]), scale=jnp.stack([t.scale for t in qs]),
        mode="int4", group_size=64)
    sliced = jax.tree.map(lambda a: a[0], stacked)
    assert isinstance(sliced, QuantizedTensor)
    assert sliced.mode == "int4" and sliced.group_size == 64
    assert sliced.q.shape == qs[0].q.shape


@pytest.mark.parametrize("mode", ["int8", "int4"])
@pytest.mark.parametrize("structured", [False, True])
def test_quantized_linear_large_m_prefill_path(rng, mode, structured):
    """m >= _PREFILL_M routes to the dequant-once + bf16-dot path
    (ops/quant._large_m_linear). int8 must match the XLA golden to bf16
    accumulation noise (int8->bf16 cast is exact, scales post-dot); int4
    additionally bakes grouped scales into bf16 weights (~2^-9 relative).
    Covers per-layer, stacked, and the structured gate|up stack layouts."""
    from llm_inference_engine_tpu.ops.quant import _PREFILL_M
    m, k, n, L = _PREFILL_M, 256, 128, 2
    x = rng.normal(size=(m, k)).astype(np.float32)
    if structured:
        ws = [(rng.normal(size=(2, k, n)) * 0.02).astype(np.float32)
              for _ in range(L)]
        ts = [[quantize_tensor(jnp.asarray(w[s]), mode, 128)
               for s in range(2)] for w in ws]
        qk = k // 2 if mode == "int4" else k
        stacked = QuantizedTensor(
            q=jnp.stack([jnp.stack([t.q for t in row]) for t in [None]
                         for row in ts]).reshape(L, 2, qk, n),
            scale=jnp.stack([jnp.stack([t.scale for t in row])
                             for row in ts]),
            mode=mode, group_size=128)
        got = np.asarray(quantized_linear(
            jnp.asarray(x), stacked, kernels="pallas", layer=jnp.int32(1)))
        want = np.concatenate(
            [np.asarray(quantized_linear_xla(jnp.asarray(x), ts[1][s]))
             for s in range(2)], axis=-1)
    else:
        w = (rng.normal(size=(k, n)) * 0.02).astype(np.float32)
        t = quantize_tensor(jnp.asarray(w), mode, 128)
        got = np.asarray(quantized_linear(jnp.asarray(x), t,
                                          kernels="pallas"))
        want = np.asarray(quantized_linear_xla(jnp.asarray(x), t))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02, rel


def test_dequant_int4_pallas_matches_golden(rng):
    """The dequant-materialize kernel (large-m int4 prefill path) must
    reproduce dequantize_tensor up to one bf16 rounding."""
    from llm_inference_engine_tpu.ops.quant import (
        _dequant_int4_pallas, _plan_dequant_blocks)
    k, n, g = 512, 256, 128
    w = (rng.normal(size=(k, n)) * 0.02).astype(np.float32)
    t = quantize_tensor(jnp.asarray(w), "int4", g)
    plan = _plan_dequant_blocks(k, n, g)
    assert plan is not None
    got = np.asarray(_dequant_int4_pallas(t.q, t.scale, g, *plan, True))
    want = np.asarray(dequantize_tensor(t))
    rel = np.abs(got.astype(np.float32) - want).max() / np.abs(want).max()
    assert rel < 2 ** -8, rel


def test_dequant_plan_shapes():
    """Block plans for the real model contractions: blocks always DIVIDE
    both dims (ragged blocks read unspecified memory on hardware)."""
    from llm_inference_engine_tpu.ops.quant import _plan_dequant_blocks
    for k, n in [(4096, 11008), (11008, 4096), (4096, 12288),
                 (5120, 13824), (2048, 5632), (4096, 32000)]:
        plan = _plan_dequant_blocks(k, n, 128)
        assert plan is not None, (k, n)
        bk, bn = plan
        assert k % bk == 0 and n % bn == 0 and bk % 128 == 0, (k, n, plan)
    # shapes the kernel must refuse (fall back to XLA unpack)
    assert _plan_dequant_blocks(384 + 16, 128, 128) is None


def test_plan_blocks_never_drops_production_shapes():
    """Every production (m, n, k) matmul shape must get a Pallas plan —
    a None plan silently falls back to XLA dequant-materialization,
    measured as a 9.8x decode cliff when 13B's down projection hit it
    (r4: inter=13824 has no grouped-divisor K block, and the full-K
    weight block needed bn to shrink below its default)."""
    from llm_inference_engine_tpu.ops.quant import _plan_blocks, quantize_tensor

    shapes = {
        "7b": dict(h=4096, i=11008, qkv=12288, v=32000),
        "13b": dict(h=5120, i=13824, qkv=15360, v=32000),
        "tinyllama": dict(h=2048, i=5632, qkv=2560, v=32000),
        "llama3-8b": dict(h=4096, i=14336, qkv=6144, v=128256),
        "qwen2-7b": dict(h=3584, i=18944, qkv=4608, v=152064),
    }
    for mode in ("int8", "int4"):
        for name, s in shapes.items():
            mats = [  # (m, n, k) decode + prefill-chunk shapes
                (8, s["qkv"], s["h"]),      # wqkv
                (8, s["h"], s["h"]),        # wo (approx: q_size ~ h)
                (8, 2 * s["i"], s["h"]),    # gate_up
                (8, s["h"], s["i"]),        # down  <- the 13B cliff
                (8, s["v"], s["h"]),        # lm_head
                (512, s["h"], s["i"]),      # prefill-chunk down
                (512, s["v"], s["h"]),      # prefill-chunk lm head
            ]
            for m, n, k in mats:
                w = np.zeros((k, n), np.float32)
                t = quantize_tensor(jnp.asarray(w), mode)
                plan = _plan_blocks(m, n, k, t)
                assert plan is not None, (mode, name, m, n, k)
                bm, bn, bk = plan
                if mode == "int4":   # int8 masks a ragged last K block
                    assert bk == k or k % bk == 0, (mode, name, plan)
