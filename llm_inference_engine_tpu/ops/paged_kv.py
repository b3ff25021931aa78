"""Paged KV cache: block-table indirection over a shared page pool.

The slot cache (kv_cache.py) preallocates max_seq_len rows per slot, so
HBM bounds max_batch_size x max_seq_len even when most requests are
short. The paged cache allocates KV in fixed-size pages from one shared
pool — concurrency is bounded by TOKENS IN FLIGHT, not by the worst-case
sequence length, which is what lifts batch (and therefore serving
throughput) for realistic length mixes. The reference had neither (its
allocator pooled raw buffers for a bs=1 engine, cuda_allocator.h:23).

TPU design:
- pool [L, P, page, Kst, D], token-major within a page, SAME block
  content as the slot cache's [bk, Kst, D] attention blocks — the
  attention kernels are reused as-is; only their BlockSpec index maps
  change: ``(ly, b, j)`` becomes ``(ly, table[b, j], 0)`` with the block
  table arriving via scalar prefetch. A page is the unit of allocation
  ACROSS layers (physical page p = pool[:, p] on every layer), so the
  table is per-sequence, not per-layer.
- writes stay aliased Pallas DMAs with STATIC shapes under dynamic
  predicates: a multi-token chunk write is one [T, Kst, D] DMA that must
  start page-aligned (T <= page); a decode write is one [1, Kst, D] DMA
  at any offset. The engine keeps the page-alignment invariant: prompts
  admit from 0 in page-multiple chunks, and only a prompt's FINAL chunk
  is partial (after which all writes are single-token).
- the allocator is host-side bookkeeping (free list); the device only
  ever sees the [B, max_pages] int32 table.

Off-TPU (interpret/xla) every operation has a gather/scatter golden.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_engine_tpu.ops.kv_cache import EMBED_PAD, quantize_kv_embedded
from llm_inference_engine_tpu.utils import cdiv, pallas_interpret, use_pallas

__all__ = ["PagedKVCache", "PageAllocator", "new_paged_kv_cache",
           "paged_update_at_layer", "gather_layer_pages"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """k/v: [L, P, page, Kst, D] page pool; block_table: [B, max_pages]
    int32 physical page per (slot, logical block); lengths: [B] valid
    tokens per slot. Quantized variant: int8 pool with embedded scale
    rows (kv_cache.py quantize_kv_embedded layout)."""

    k: jax.Array
    v: jax.Array
    block_table: jax.Array
    lengths: jax.Array
    embedded_scales: bool = dataclasses.field(
        metadata=dict(static=True), default=False)

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def batch_size(self) -> int:
        return self.block_table.shape[0]

    @property
    def max_pages_per_seq(self) -> int:
        return self.block_table.shape[1]

    @property
    def max_seq_len(self) -> int:
        return self.max_pages_per_seq * self.page_size

    @property
    def num_kv_heads(self) -> int:
        return self.k.shape[3] - (EMBED_PAD if self.embedded_scales else 0)

    @property
    def quantized(self) -> bool:
        return self.embedded_scales

    # slot-cache interface shims (model/engine code paths share logic)
    k_scale = None
    v_scale = None


def new_paged_kv_cache(num_layers: int, batch_size: int, num_kv_heads: int,
                       num_pages: int, page_size: int, head_dim: int,
                       max_pages_per_seq: int, dtype=jnp.bfloat16,
                       quantized: bool = False) -> PagedKVCache:
    Kst = num_kv_heads + (EMBED_PAD if quantized else 0)
    shape = (num_layers, num_pages, page_size, Kst, head_dim)
    dt = jnp.int8 if quantized else dtype
    return PagedKVCache(
        k=jnp.zeros(shape, dt), v=jnp.zeros(shape, dt),
        block_table=jnp.zeros((batch_size, max_pages_per_seq), jnp.int32),
        lengths=jnp.zeros((batch_size,), jnp.int32),
        embedded_scales=quantized)


class PageAllocator:
    """Host-side free list over the pool's physical pages, with reference
    counting so pages can be SHARED read-only across slots (zero-copy
    prefix caching: one prefix's pages appear in many block tables).
    Page 0 is RESERVED as the scratch target every unused table entry
    points at (clamped index maps may touch it; it never holds live
    data)."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free = list(range(num_pages - 1, 0, -1))   # stack, 0 reserved
        self._rc: dict[int, int] = {}

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> list[int]:
        if n > len(self._free):
            raise MemoryError(f"paged KV pool exhausted: want {n} pages, "
                              f"{len(self._free)} free")
        pages = [self._free.pop() for _ in range(n)]
        for p in pages:
            self._rc[p] = 1
        return pages

    def share(self, pages: Sequence[int]) -> None:
        """Add a reference to already-allocated pages (a slot adopting a
        shared prefix's pages)."""
        for p in pages:
            if p not in self._rc:
                raise ValueError(f"page {p} is not allocated")
            self._rc[p] += 1

    def free(self, pages: Sequence[int]) -> None:
        """Drop one reference per page; a page returns to the pool when
        its last reference goes."""
        for p in pages:
            if not 0 < p < self.num_pages:
                raise ValueError(f"bad page id {p}")
            rc = self._rc.get(p, 0)
            if rc <= 0:
                raise ValueError(f"double free of page {p}")
            if rc == 1:
                del self._rc[p]
                self._free.append(p)
            else:
                self._rc[p] = rc - 1


# ---------------------------------------------------------------------------
# Writes
# ---------------------------------------------------------------------------

def _paged_write_kernel(starts_ref, nlen_ref, layer_ref, table_ref,
                        knew_ref, vnew_ref, kin_ref, vin_ref,
                        kout_ref, vout_ref, sem, *, T, page):
    """One grid step per sequence. Chunk rows (nlen > 1) write one
    [T, Kst, D] span starting page-aligned; decode rows (nlen == 1) write
    one token at any in-page offset. Static DMA shapes, dynamic
    predicates."""
    del kin_ref, vin_ref
    b = pl.program_id(0)
    ly = layer_ref[0]
    pos = starts_ref[b]
    n = nlen_ref[b]
    p = table_ref[b, pos // page]
    off = pos % page

    @pl.when(n > 1)
    def _chunk():
        # engine invariant: multi-token writes start at a multiple of the
        # chunk size C, with T <= C and page % C == 0 — so [off, off+T)
        # never crosses the page boundary
        copies = [
            pltpu.make_async_copy(knew_ref.at[0],
                                  kout_ref.at[ly, p, pl.ds(off, T)],
                                  sem.at[0]),
            pltpu.make_async_copy(vnew_ref.at[0],
                                  vout_ref.at[ly, p, pl.ds(off, T)],
                                  sem.at[1]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    @pl.when(n == 1)
    def _token():
        copies = [
            pltpu.make_async_copy(knew_ref.at[0, pl.ds(0, 1)],
                                  kout_ref.at[ly, p, pl.ds(off, 1)],
                                  sem.at[0]),
            pltpu.make_async_copy(vnew_ref.at[0, pl.ds(0, 1)],
                                  vout_ref.at[ly, p, pl.ds(off, 1)],
                                  sem.at[1]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _paged_write_pallas(k, v, knew, vnew, starts, nlen, layer, table):
    B, T, Kst, D = knew.shape
    page = k.shape[2]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    new_spec = pl.BlockSpec((1, T, Kst, D), lambda b, *_: (b, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B,),
        in_specs=[new_spec, new_spec, any_spec, any_spec],
        out_specs=[any_spec, any_spec],
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    # flat operands: starts, nlen, layer, table, knew, vnew, k, v -> 6, 7
    return pl.pallas_call(
        functools.partial(_paged_write_kernel, T=T, page=page),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=pallas_interpret(),
    )(starts.astype(jnp.int32), nlen.astype(jnp.int32),
      jnp.asarray(layer, jnp.int32).reshape(1), table, knew, vnew, k, v)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _paged_write_xla(k, v, knew, vnew, starts, nlen, layer, table):
    """Golden/interpret path: per-token scatter into the pool."""
    L, P, page, Kst, D = k.shape
    B, T = knew.shape[0], knew.shape[1]
    pos = starts[:, None] + jnp.arange(T)[None, :]            # [B, T]
    valid = jnp.arange(T)[None, :] < nlen[:, None]
    pg = jnp.take_along_axis(table, pos // page, axis=1)      # [B, T]
    off = pos % page
    # flatten pool pages to rows [L, P*page, Kst, D] for one scatter
    flat_idx = jnp.where(valid, pg * page + off, 0)
    kf = k.reshape(L, P * page, Kst, D)
    vf = v.reshape(L, P * page, Kst, D)
    kn = jnp.where(valid[:, :, None, None], knew.astype(k.dtype),
                   jnp.take(kf[layer], flat_idx.reshape(-1), axis=0
                            ).reshape(B, T, Kst, D))
    vn = jnp.where(valid[:, :, None, None], vnew.astype(v.dtype),
                   jnp.take(vf[layer], flat_idx.reshape(-1), axis=0
                            ).reshape(B, T, Kst, D))
    kf = kf.at[layer, flat_idx.reshape(-1)].set(
        kn.reshape(-1, Kst, D))
    vf = vf.at[layer, flat_idx.reshape(-1)].set(
        vn.reshape(-1, Kst, D))
    return kf.reshape(k.shape), vf.reshape(v.shape)


def paged_update_at_layer(cache: PagedKVCache, layer, new_k, new_v,
                          starts, new_len=None,
                          kernels: str = "auto") -> PagedKVCache:
    """Write new tokens for one layer into the page pool.

    new_k/new_v: [B, T, K, D] float (quantized pools pack them via
    quantize_kv_embedded); starts: [B] absolute token offsets; new_len:
    [B] valid tokens (0 skips the row; 1 = decode write at any offset;
    >1 = chunk write that must start page-aligned — engine invariant).
    """
    if new_len is None:
        new_len = jnp.full(starts.shape, new_k.shape[1], jnp.int32)
    if cache.embedded_scales:
        new_k = quantize_kv_embedded(new_k)
        new_v = quantize_kv_embedded(new_v)
    Kst, D = new_k.shape[2], new_k.shape[3]
    # (interpret mode runs the DMA kernel too — pinned by test_paged_kv)
    pallas_ok = (use_pallas(kernels) and D % 128 == 0 and Kst % 8 == 0
                 and new_k.shape[1] <= cache.page_size)
    fn = _paged_write_pallas if pallas_ok else _paged_write_xla
    k, v = fn(cache.k, cache.v, new_k.astype(cache.k.dtype),
              new_v.astype(cache.v.dtype), starts.astype(jnp.int32),
              new_len.astype(jnp.int32), layer, cache.block_table)
    return dataclasses.replace(cache, k=k, v=v)


def gather_layer_pages(cache: PagedKVCache, layer):
    """Dense [B, max_seq, Kst, D] view of one layer (XLA golden path —
    gathers the table; rows past ``lengths`` are whatever page 0 holds
    and must be masked by the caller's kv_len)."""
    kl = jax.lax.dynamic_index_in_dim(cache.k, layer, 0, keepdims=False)
    vl = jax.lax.dynamic_index_in_dim(cache.v, layer, 0, keepdims=False)
    B, MP = cache.block_table.shape
    page, Kst, D = cache.k.shape[2], cache.k.shape[3], cache.k.shape[4]
    kd = jnp.take(kl, cache.block_table.reshape(-1), axis=0).reshape(
        B, MP * page, Kst, D)
    vd = jnp.take(vl, cache.block_table.reshape(-1), axis=0).reshape(
        B, MP * page, Kst, D)
    return kd, vd
