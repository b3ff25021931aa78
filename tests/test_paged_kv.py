"""Paged KV cache tests (ops/paged_kv.py).

Goldens: a dense slot cache scattered into randomized page assignments.
The Pallas write kernel and the table-indirected attention index maps run
in interpret mode (the same discipline as test_stacked_paths.py); the XLA
scatter/gather paths are compared against the same dense reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_inference_engine_tpu.ops.attention import attention, attention_xla
from llm_inference_engine_tpu.ops import paged_kv as PK

L, PAGE, K, D = 2, 16, 8, 128
B, MAXP = 3, 4
S = MAXP * PAGE       # 64 logical tokens per slot


def _mk_cache(rng, quantized=False):
    """Pool + a shuffled (non-identity) table covering every slot."""
    num_pages = 1 + B * MAXP + 2
    cache = PK.new_paged_kv_cache(L, B, K, num_pages, PAGE, D, MAXP,
                                  dtype=jnp.float32, quantized=quantized)
    perm = rng.permutation(np.arange(1, 1 + B * MAXP)).reshape(B, MAXP)
    cache = PK.PagedKVCache(
        k=cache.k, v=cache.v, block_table=jnp.asarray(perm, jnp.int32),
        lengths=cache.lengths, embedded_scales=cache.embedded_scales)
    return cache


def _dense_of(cache):
    """[B, S, Kst, D] dense views via the golden gather."""
    outs = []
    for l in range(L):
        outs.append(PK.gather_layer_pages(cache, jnp.int32(l)))
    kd = jnp.stack([o[0] for o in outs])
    vd = jnp.stack([o[1] for o in outs])
    return kd, vd   # [L, B, S, Kst, D]


@pytest.mark.parametrize("path", ["xla", "pallas"])
def test_paged_write_matches_dense(rng, path):
    cache = _mk_cache(rng)
    # dense reference cache
    ref_k = np.zeros((L, B, S, K, D), np.float32)
    ref_v = np.zeros((L, B, S, K, D), np.float32)

    writes = [
        # (starts, nlen) — page-aligned chunk rows + single-token rows
        (np.array([0, 16, 0], np.int32), np.array([16, 16, 0], np.int32)),
        (np.array([16, 32, 0], np.int32), np.array([1, 1, 16], np.int32)),
        (np.array([17, 33, 16], np.int32), np.array([1, 1, 1], np.int32)),
    ]
    for step, (starts, nlen) in enumerate(writes):
        T = int(nlen.max())
        for l in range(L):
            nk = rng.standard_normal((B, T, K, D)).astype(np.float32)
            nv = rng.standard_normal((B, T, K, D)).astype(np.float32)
            cache = PK.paged_update_at_layer(
                cache, jnp.int32(l), jnp.asarray(nk), jnp.asarray(nv),
                jnp.asarray(starts), jnp.asarray(nlen),
                kernels=path)
            for b in range(B):
                n = int(nlen[b])
                s0 = int(starts[b])
                ref_k[l, b, s0:s0 + n] = nk[b, :n]
                ref_v[l, b, s0:s0 + n] = nv[b, :n]

    kd, vd = _dense_of(cache)
    lengths = np.array([18, 34, 17])
    for b in range(B):
        n = lengths[b]
        np.testing.assert_allclose(np.asarray(kd)[:, b, :n], ref_k[:, b, :n],
                                   err_msg=f"k b={b} path={path}")
        np.testing.assert_allclose(np.asarray(vd)[:, b, :n], ref_v[:, b, :n])


def _fill_cache(rng, cache, lengths):
    """Scatter random dense content into the pool; returns dense arrays."""
    dense_k = rng.standard_normal((L, B, S, K, D)).astype(np.float32)
    dense_v = rng.standard_normal((L, B, S, K, D)).astype(np.float32)
    k = np.zeros(cache.k.shape, np.float32)
    v = np.zeros(cache.v.shape, np.float32)
    table = np.asarray(cache.block_table)
    for b in range(B):
        for j in range(MAXP):
            p = table[b, j]
            k[:, p] = dense_k[:, b, j * PAGE:(j + 1) * PAGE]
            v[:, p] = dense_v[:, b, j * PAGE:(j + 1) * PAGE]
    cache = PK.PagedKVCache(
        k=jnp.asarray(k), v=jnp.asarray(v), block_table=cache.block_table,
        lengths=jnp.asarray(lengths, jnp.int32),
        embedded_scales=cache.embedded_scales)
    return cache, dense_k, dense_v


def test_paged_prefill_attention_matches_dense(rng):
    cache = _mk_cache(rng)
    lengths = np.array([40, 64, 9], np.int32)
    cache, dense_k, dense_v = _fill_cache(rng, cache, lengths)
    Sq, H = 8, 16                   # GQA group 2
    q = rng.standard_normal((B, Sq, H, D)).astype(np.float32)
    q_start = jnp.asarray(lengths - Sq)
    kv_len = jnp.asarray(lengths)

    for l in range(L):
        got = attention(jnp.asarray(q), cache.k, cache.v, q_start, kv_len,
                        kernels="pallas", block_q=16, block_kv=PAGE,
                        layer=jnp.int32(l), table=cache.block_table)
        want = attention_xla(jnp.asarray(q), jnp.asarray(dense_k[l]),
                             jnp.asarray(dense_v[l]), q_start, kv_len)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5, err_msg=f"l={l}")


def test_paged_decode_mxu_matches_dense(rng):
    cache = _mk_cache(rng)
    lengths = np.array([33, 64, 1], np.int32)
    cache, dense_k, dense_v = _fill_cache(rng, cache, lengths)
    H = 16
    q = rng.standard_normal((B, 1, H, D)).astype(np.float32)
    kv_len = jnp.asarray(lengths)
    q_start = kv_len - 1

    for l in range(L):
        got = attention(jnp.asarray(q), cache.k, cache.v, q_start, kv_len,
                        kernels="pallas", block_kv=PAGE,
                        layer=jnp.int32(l), table=cache.block_table)
        want = attention_xla(jnp.asarray(q), jnp.asarray(dense_k[l]),
                             jnp.asarray(dense_v[l]), q_start, kv_len)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5, err_msg=f"l={l}")


def test_paged_xla_fallback_matches_dense(rng):
    cache = _mk_cache(rng)
    lengths = np.array([20, 50, 3], np.int32)
    cache, dense_k, dense_v = _fill_cache(rng, cache, lengths)
    q = rng.standard_normal((B, 4, K, D)).astype(np.float32)
    q_start = jnp.asarray(lengths - 4)
    kv_len = jnp.asarray(lengths)
    got = attention(jnp.asarray(q), cache.k, cache.v, q_start, kv_len,
                    kernels="xla", layer=jnp.int32(1),
                    table=cache.block_table)
    want = attention_xla(jnp.asarray(q), jnp.asarray(dense_k[1]),
                         jnp.asarray(dense_v[1]), q_start, kv_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_allocator():
    a = PK.PageAllocator(8)         # page 0 reserved -> 7 usable
    assert a.free_pages == 7
    got = a.alloc(3)
    assert len(set(got)) == 3 and 0 not in got
    a.free(got[:2])
    assert a.free_pages == 6
    with pytest.raises(MemoryError):
        a.alloc(7)
    with pytest.raises(ValueError):
        a.free([0])
