"""On-chip validation of the compiled Pallas paths against XLA goldens.

Interpret mode can't see Mosaic-only failures (tiling, DMA legality,
layout rules), so every kernel family gets one compiled run on the real
chip compared against its XLA golden at production-like shapes:

    python benchmarks/validate_tpu.py            # all checks
    python benchmarks/validate_tpu.py --only paged,swa

Prints one PASS/FAIL line per check and exits non-zero on any failure.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _ok(name, fn):
    try:
        fn()
        print(f"PASS {name}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — report-and-continue harness
        print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
        traceback.print_exc(limit=3)
        return False


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", default="",
                    help="comma list: paged,swa,rope,decode,write,engine,"
                         "fused,spec,quant")
    args = ap.parse_args(argv)
    want = set(filter(None, args.only.split(","))) or {
        "paged", "swa", "rope", "decode", "write", "engine", "fused",
        "spec", "quant"}

    import jax
    import jax.numpy as jnp

    from llm_inference_engine_tpu.ops import paged_kv as PK
    from llm_inference_engine_tpu.ops.attention import (
        attention, attention_xla)
    from llm_inference_engine_tpu.ops.kv_cache import (
        new_kv_cache, update_cache_at_layer)
    from llm_inference_engine_tpu.ops.rope import apply_rope, apply_rope_xla
    from llm_inference_engine_tpu.config import RopeScaling

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    results = []

    # production-like shapes: K=8 kv heads, D=128, GQA group 4
    L, B, S, K, D, H = 2, 4, 512, 8, 128, 32
    PAGE = 128

    def rand(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    if "write" in want:
        def check_slot_write():
            cache = new_kv_cache(L, B, K, S, D, dtype=jnp.bfloat16)
            nk, nv = rand(B, 1, K, D), rand(B, 1, K, D)
            starts = jnp.asarray([0, 5, 100, 17], jnp.int32)
            c2 = update_cache_at_layer(cache, jnp.int32(1), nk, nv, starts,
                                       kernels="pallas")
            got = np.asarray(c2.k[1])
            for b, s0 in enumerate([0, 5, 100, 17]):
                np.testing.assert_allclose(
                    got[b, s0], np.asarray(nk)[b, 0], rtol=0, atol=0)
        results.append(_ok("slot-cache aliased DMA write", check_slot_write))

    if "paged" in want:
        def paged_fixture():
            maxp = S // PAGE
            cache = PK.new_paged_kv_cache(L, B, K, 1 + B * maxp, PAGE, D,
                                          maxp, dtype=jnp.bfloat16)
            table = rng.permutation(np.arange(1, 1 + B * maxp)).reshape(
                B, maxp).astype(np.int32)
            import dataclasses
            return dataclasses.replace(
                cache, block_table=jnp.asarray(table)), table, maxp

        def check_paged_write():
            cache, table, maxp = paged_fixture()
            # chunk write (page-aligned) + decode write (odd offset)
            nk = rand(B, PAGE, K, D)
            nv = rand(B, PAGE, K, D)
            starts = jnp.zeros((B,), jnp.int32)
            cache = PK.paged_update_at_layer(
                cache, jnp.int32(0), nk, nv, starts,
                jnp.full((B,), PAGE, jnp.int32), kernels="pallas")
            tk, tv = rand(B, 1, K, D), rand(B, 1, K, D)
            st = jnp.asarray([PAGE + 3, 7, PAGE - 1, 1], jnp.int32)
            cache = PK.paged_update_at_layer(
                cache, jnp.int32(0), tk, tv, st,
                jnp.ones((B,), jnp.int32), kernels="pallas")
            kd, _ = PK.gather_layer_pages(cache, jnp.int32(0))
            got = np.asarray(kd)
            np.testing.assert_array_equal(got[:, :PAGE][:, 3],
                                          np.asarray(nk)[:, 3])
            for b, s0 in enumerate([PAGE + 3, 7, PAGE - 1, 1]):
                np.testing.assert_array_equal(got[b, s0],
                                              np.asarray(tk)[b, 0])
        results.append(_ok("paged write kernel (chunk + token DMA)",
                           check_paged_write))

        def check_paged_attention():
            cache, table, maxp = paged_fixture()
            # fill pool coherently with a dense reference
            dense_k = rng.standard_normal((L, B, S, K, D)).astype(np.float32)
            dense_v = rng.standard_normal((L, B, S, K, D)).astype(np.float32)
            kpool = np.zeros(cache.k.shape, np.float32)
            vpool = np.zeros(cache.v.shape, np.float32)
            for b in range(B):
                for j in range(maxp):
                    kpool[:, table[b, j]] = dense_k[:, b,
                                                    j * PAGE:(j + 1) * PAGE]
                    vpool[:, table[b, j]] = dense_v[:, b,
                                                    j * PAGE:(j + 1) * PAGE]
            import dataclasses
            cache = dataclasses.replace(
                cache, k=jnp.asarray(kpool, jnp.bfloat16),
                v=jnp.asarray(vpool, jnp.bfloat16))
            lengths = np.array([500, 512, 130, 1], np.int32)
            kv_len = jnp.asarray(lengths)

            # decode (Sq=1, MXU path)
            q = rand(B, 1, H, D)
            got = attention(q, cache.k, cache.v, kv_len - 1, kv_len,
                            kernels="pallas", block_kv=PAGE,
                            layer=jnp.int32(1), table=cache.block_table)
            want_ = attention_xla(
                q, jnp.asarray(dense_k[1], jnp.bfloat16),
                jnp.asarray(dense_v[1], jnp.bfloat16), kv_len - 1, kv_len)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(want_, np.float32),
                rtol=5e-2, atol=5e-2)

            # prefill (flash path)
            Sq = 64
            q2 = rand(B, Sq, H, D)
            qs = jnp.maximum(kv_len - Sq, 0)
            got2 = attention(q2, cache.k, cache.v, qs, kv_len,
                             kernels="pallas", block_q=128, block_kv=PAGE,
                             layer=jnp.int32(0), table=cache.block_table)
            want2 = attention_xla(
                q2, jnp.asarray(dense_k[0], jnp.bfloat16),
                jnp.asarray(dense_v[0], jnp.bfloat16), qs, kv_len)
            np.testing.assert_allclose(
                np.asarray(got2, np.float32), np.asarray(want2, np.float32),
                rtol=5e-2, atol=5e-2)
        results.append(_ok("paged attention (MXU decode + flash prefill)",
                           check_paged_attention))

    if "swa" in want:
        def check_swa():
            W = 96
            cache_k = rand(B, S, K, D)
            cache_v = rand(B, S, K, D)
            lengths = np.array([400, 512, 90, 2], np.int32)
            kv_len = jnp.asarray(lengths)
            q = rand(B, 1, H, D)
            got = attention(q, cache_k, cache_v, kv_len - 1, kv_len,
                            kernels="pallas", block_kv=128, window=W)
            want_ = attention_xla(q, cache_k, cache_v, kv_len - 1, kv_len,
                                  window=W)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(want_, np.float32),
                rtol=5e-2, atol=5e-2)
            # prefill with window
            Sq = 32
            q2 = rand(B, Sq, H, D)
            qs = jnp.maximum(kv_len - Sq, 0)
            got2 = attention(q2, cache_k, cache_v, qs, kv_len,
                             kernels="pallas", block_q=128, block_kv=128,
                             window=W)
            want2 = attention_xla(q2, cache_k, cache_v, qs, kv_len, window=W)
            np.testing.assert_allclose(
                np.asarray(got2, np.float32), np.asarray(want2, np.float32),
                rtol=5e-2, atol=5e-2)
        results.append(_ok("sliding-window attention (decode + prefill)",
                           check_swa))

    if "rope" in want:
        def check_rope():
            rs = RopeScaling(factor=8.0, low_freq_factor=1.0,
                             high_freq_factor=4.0,
                             original_max_position_embeddings=8192)
            x = jnp.asarray(rng.standard_normal((2, 16, H, D)), jnp.float32)
            pos = jnp.asarray(rng.integers(0, 30000, size=(2, 16)), jnp.int32)
            a = apply_rope(x, pos, theta=500000.0, scaling=rs,
                           kernels="pallas")
            b = apply_rope_xla(x, pos, theta=500000.0, scaling=rs)
            # the kernel derives inv_freq via exp/log (float iota is not
            # lowerable); at positions ~30k the ulp difference in
            # inv_freq scales into the angle — tolerance reflects that
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-2, atol=1e-2)
        results.append(_ok("llama3 rope scaling in-kernel", check_rope))

    if "fused" in want:
        def check_fused_decode(window=None):
            from llm_inference_engine_tpu.ops.attention import (
                attention_decode_fused_mxu)
            cache_k = jnp.zeros((L, B, S, K, D), jnp.bfloat16)
            cache_v = jnp.zeros((L, B, S, K, D), jnp.bfloat16)
            hist = rng.standard_normal((L, B, S, K, D)).astype(np.float32)
            histv = rng.standard_normal((L, B, S, K, D)).astype(np.float32)
            cache_k = jnp.asarray(hist, jnp.bfloat16)
            cache_v = jnp.asarray(histv, jnp.bfloat16)
            lengths = np.array([200, 512 - 1, 33, 0], np.int32)
            q = rand(B, 1, H, D)
            kn, vn = rand(B, 1, K, D), rand(B, 1, K, D)
            q_start = jnp.asarray(lengths)
            kv_len = q_start + 1
            out, kc, vc = attention_decode_fused_mxu(
                q, kn, vn, cache_k, cache_v, q_start, kv_len,
                jnp.int32(1), block_kv=128, window=window)
            # golden: write then attend on the dense layer
            k1 = np.array(jnp.asarray(cache_k[1], jnp.float32))
            v1 = np.array(jnp.asarray(cache_v[1], jnp.float32))
            for b, s0 in enumerate(lengths):
                k1[b, s0] = np.asarray(kn, np.float32)[b, 0]
                v1[b, s0] = np.asarray(vn, np.float32)[b, 0]
            want_ = attention_xla(q, jnp.asarray(k1, jnp.bfloat16),
                                  jnp.asarray(v1, jnp.bfloat16),
                                  q_start, kv_len, window=window)
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(want_, np.float32),
                rtol=5e-2, atol=5e-2)
            got_k = np.asarray(kc[1], np.float32)
            for b, s0 in enumerate(lengths):
                np.testing.assert_allclose(
                    got_k[b, s0], np.asarray(kn, np.float32)[b, 0])
        results.append(_ok("fused MXU decode write+attend",
                           lambda: check_fused_decode(None)))
        results.append(_ok("fused MXU decode write+attend (window)",
                           lambda: check_fused_decode(96)))

    if "spec" in want:
        def check_spec_round():
            from llm_inference_engine_tpu.config import (
                EngineConfig, SamplingParams, get_config)
            from llm_inference_engine_tpu.models.weights import (
                init_dummy_params)
            from llm_inference_engine_tpu.runtime.engine import (
                InferenceEngine)
            from llm_inference_engine_tpu.runtime.speculative import (
                SpeculativeDecoder)
            cfg = get_config("debug").replace(
                dtype_name="bfloat16", num_layers=2, hidden_size=1024,
                num_heads=8, num_kv_heads=8, head_dim=128,
                intermediate_size=2048)

            def eng(seed):
                return InferenceEngine(
                    cfg, EngineConfig(max_batch_size=2, max_seq_len=256),
                    init_dummy_params(cfg, seed=seed))
            target = eng(0)
            spec = SpeculativeDecoder(target, eng(0), num_draft=3)
            res = spec.generate([[1, 2, 3], [9, 8, 7]], max_new_tokens=8,
                                eos_token_id=None)
            plain = eng(0).generate(
                [[1, 2, 3], [9, 8, 7]],
                SamplingParams(greedy=True, max_new_tokens=8),
                eos_token_id=None)
            # bf16 MXU noise between the T=1 decode and T=k+1 verify paths
            # can flip near-ties (speculative.py docstring), so allow a
            # small slack on hardware; interpret/f32 runs hit 100%
            assert res.acceptance_rate >= 0.8, res.acceptance_rate
            match = sum(a == b for a, b in
                        zip(res.token_ids, plain.token_ids))
            assert match >= 1, (res.token_ids, plain.token_ids)
        results.append(_ok("speculative round (identical draft, lossless)",
                           check_spec_round))

    if "engine" in want:
        def check_engine_paged_parity():
            from llm_inference_engine_tpu.config import (
                EngineConfig, SamplingParams, get_config)
            from llm_inference_engine_tpu.models.weights import (
                init_dummy_params)
            from llm_inference_engine_tpu.runtime.engine import (
                InferenceEngine)
            cfg = get_config("debug").replace(
                dtype_name="bfloat16", num_layers=2, hidden_size=1024,
                num_heads=8, num_kv_heads=8, head_dim=128,
                intermediate_size=2048)
            sp = SamplingParams(greedy=True, max_new_tokens=8)
            outs = {}
            for layout in ("slot", "paged"):
                eng = InferenceEngine(
                    cfg, EngineConfig(max_batch_size=2, max_seq_len=512,
                                      max_prefill_len=128,
                                      kv_layout=layout, page_size=128),
                    init_dummy_params(cfg, seed=0))
                r = eng.generate([list(range(1, 150)), [5, 6, 7]], sp,
                                 eos_token_id=None)
                outs[layout] = r.token_ids
            assert outs["paged"] == outs["slot"], (
                f"paged {outs['paged']} != slot {outs['slot']}")
        results.append(_ok("engine paged==slot greedy parity (compiled)",
                           check_engine_paged_parity))

    if "quant" in want:
        def check_quant_matmuls():
            """Fused dequant-matmul vs XLA golden at the REAL 7B decode
            shapes (every weight in the model, both quant modes, stacked
            layer-prefetch path). Block plans differ per shape — each can
            hit its own Mosaic tiling/OOB hazard, which interpret-mode CPU
            tests cannot see (ops/quant.py module docstring)."""
            from llm_inference_engine_tpu.ops.quant import (
                dequantize_tensor, quantize_tensor, quantized_linear,
                QuantizedTensor)
            Ll = 2
            shapes = [("qkv", 4096, 12288, None),
                      ("gate_up", 4096, 11008, 2),
                      ("down", 11008, 4096, None),
                      ("lm_head", 4096, 32000, None)]
            for mode in ("int8", "int4"):
                for name, k, n, struct in shapes:
                    x = jnp.asarray(rng.standard_normal((8, k)) * 0.1,
                                    jnp.bfloat16)
                    ts = [quantize_tensor(
                        jnp.asarray(rng.standard_normal((k, n)) * 0.02,
                                    jnp.float32), mode) for _ in range(Ll)]
                    # golden on the HOST (bf16-rounded x @ f32 dequant) —
                    # a TPU-compiled golden would double the compile bill
                    xw = np.asarray(x, np.float32)
                    goldens = [xw @ np.asarray(dequantize_tensor(t))
                               for t in ts]
                    q = jnp.stack([t.q for t in ts])
                    s = jnp.stack([t.scale for t in ts])
                    if struct:
                        q = q.reshape(Ll, q.shape[1], 2, -1).transpose(
                            0, 2, 1, 3)
                        s = s.reshape(Ll, s.shape[1], 2, -1).transpose(
                            0, 2, 1, 3)
                    t = QuantizedTensor(q=q, scale=s, mode=mode,
                                        group_size=128)
                    for layer in (0, Ll - 1):
                        got = quantized_linear(x, t, kernels="pallas",
                                               layer=jnp.int32(layer),
                                               out_dtype=jnp.float32)
                        np.testing.assert_allclose(
                            np.asarray(got), goldens[layer],
                            rtol=2e-2, atol=2e-2,
                            err_msg=f"{name} {mode} layer {layer}")
        results.append(_ok("quantized matmuls (7B shapes, stacked)",
                           check_quant_matmuls))

    n_fail = results.count(False)
    print(f"{len(results) - n_fail}/{len(results)} checks passed", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
