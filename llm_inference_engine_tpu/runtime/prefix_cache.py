"""Prefix caching: reuse the KV cache of a shared prompt prefix.

Capability beyond the reference (which recomputes the full accumulated
history every round and serves one request at a time, llama.cpp:137-155,
llama.h:31): a prefix shared by many requests — the classic system prompt —
is prefilled ONCE, its KV rows are snapshotted off the cache, and every
later request that starts with those tokens restores the snapshot into its
slot and prefills only the tail. TTFT for a request with an S-token shared
prefix and a t-token tail drops from prefill(S + t) to one device-side
copy of S rows + prefill(t).

TPU design notes:
- Snapshots hold STORAGE-form rows ([L, Tpad, Kst, D] in the cache dtype,
  plus separate scale planes when the int8 cache keeps them), so restore
  is an exact byte copy — no dequant/requant round trip, identical logits
  to recomputing the prefix (pinned by tests/test_prefix_cache.py).
- Restore is one jitted donated dynamic_update_slice program per
  Tpad bucket (lengths round up to RESTORE_BUCKET to bound retraces);
  the slot index is traced, so one program serves every slot.
- The store is host-side bookkeeping over device-resident snapshots with
  an LRU token budget; match() picks the longest registered prefix.

The single-host continuous-batching scheduler consults the store at
admission (scheduler.py). The multi-host lockstep scheduler does NOT —
restore is a per-host program launch, and hosts without a local match
would fall out of lockstep; routing-based (DP) deployments get it via
their per-host schedulers.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import OrderedDict
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from llm_inference_engine_tpu.utils import round_up

__all__ = ["PrefixEntry", "PrefixStore", "PagedPrefixEntry",
           "PagedPrefixStore", "DualPrefixEntry", "DualPrefixStore",
           "RESTORE_BUCKET"]

RESTORE_BUCKET = 64   # snapshot lengths round up to this (bounds the number
                      # of compiled restore variants to max_seq/bucket)


@dataclasses.dataclass
class PrefixEntry:
    """Device-resident KV snapshot of one registered prefix."""
    tokens: tuple[int, ...]
    length: int                       # true token count (<= k.shape[1])
    k: jax.Array                      # [L, Tpad, Kst, D] storage dtype
    v: jax.Array
    k_scale: Optional[jax.Array]      # [L, Tpad, K] when separate-scale int8
    v_scale: Optional[jax.Array]

    @property
    def padded_length(self) -> int:
        return self.k.shape[1]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                   static_argnames=("with_scales",))
def _restore_kv(k, v, k_scale, v_scale, pk, pv, pks, pvs, slot, plen,
                lengths, with_scales=False):
    """Write snapshot rows into one slot of the stacked cache (exact
    storage-form copy) and set that slot's length. Donated in/out."""
    slot = jnp.asarray(slot, jnp.int32)
    zero = jnp.int32(0)
    k = jax.lax.dynamic_update_slice(k, pk[:, None], (zero, slot, zero,
                                                      zero, zero))
    v = jax.lax.dynamic_update_slice(v, pv[:, None], (zero, slot, zero,
                                                      zero, zero))
    lengths = lengths.at[slot].set(jnp.asarray(plen, lengths.dtype))
    if with_scales:
        k_scale = jax.lax.dynamic_update_slice(
            k_scale, pks[:, None], (zero, slot, zero, zero))
        v_scale = jax.lax.dynamic_update_slice(
            v_scale, pvs[:, None], (zero, slot, zero, zero))
    return k, v, k_scale, v_scale, lengths


def snapshot_prefix(cache, slot: int, length: int) -> PrefixEntry:
    """Slice ``length`` KV rows of ``slot`` out of the cache in storage
    form. The pad rows up to RESTORE_BUCKET carry whatever the cache held
    (they restore beyond the entry's valid length and are never attended,
    exactly like a slot's own unwritten tail)."""
    if hasattr(cache, "block_table"):
        raise NotImplementedError(
            "prefix caching requires the slot KV layout (kv_layout='slot'):"
            " a page pool has no contiguous per-slot rows to snapshot")
    tpad = min(round_up(max(length, 1), RESTORE_BUCKET), cache.max_seq_len)
    k = cache.k[:, slot, :tpad]
    v = cache.v[:, slot, :tpad]
    ks = vs = None
    if cache.k_scale is not None:
        ks = cache.k_scale[:, slot, :tpad]
        vs = cache.v_scale[:, slot, :tpad]
    return PrefixEntry(tokens=(), length=length, k=k, v=v,
                       k_scale=ks, v_scale=vs)


def restore_prefix(cache, slot: int, entry: PrefixEntry):
    """Return a cache with ``entry``'s rows copied into ``slot`` and the
    slot's length set to the prefix length."""
    if not hasattr(cache, "max_seq_len") or hasattr(cache, "block_table"):
        raise NotImplementedError(
            "prefix caching requires the slot KV layout (kv_layout='slot')")
    with_scales = entry.k_scale is not None
    k, v, ks, vs, lengths = _restore_kv(
        cache.k, cache.v, cache.k_scale, cache.v_scale,
        entry.k, entry.v, entry.k_scale, entry.v_scale,
        slot, entry.length, cache.lengths, with_scales=with_scales)
    if not with_scales:
        ks, vs = cache.k_scale, cache.v_scale
    return dataclasses.replace(cache, k=k, v=v, k_scale=ks, v_scale=vs,
                               lengths=lengths)


class PrefixStore:
    """LRU store of prefix KV snapshots for one engine.

    ``max_tokens`` bounds the device memory held by snapshots (in KV rows
    across all entries); registering past the budget evicts least-recently
    matched entries.
    """

    def __init__(self, engine, max_tokens: int = 16384):
        self.engine = engine
        self.max_tokens = max_tokens
        self._entries: OrderedDict[tuple, PrefixEntry] = OrderedDict()

    # -- bookkeeping ----------------------------------------------------

    @property
    def stored_tokens(self) -> int:
        return sum(e.padded_length for e in self._entries.values())

    def _evict_to_fit(self, incoming: int) -> None:
        while (self._entries
               and self.stored_tokens + incoming > self.max_tokens):
            self._entries.popitem(last=False)

    def evict(self, tokens: Sequence[int]) -> bool:
        return self._entries.pop(tuple(tokens), None) is not None

    def __len__(self) -> int:
        return len(self._entries)

    # -- core API --------------------------------------------------------

    def register(self, tokens: Sequence[int], slot: int = 0) -> PrefixEntry:
        """Prefill ``tokens`` through the engine (scratch ``slot``, which
        must not hold a live request), snapshot the KV rows, and reset the
        slot. Idempotent per token sequence."""
        key = tuple(int(t) for t in tokens)
        if key in self._entries:
            self._entries.move_to_end(key)
            return self._entries[key]
        if not key:
            raise ValueError("empty prefix")
        if len(key) >= self.engine.engine_config.max_seq_len:
            raise ValueError(
                f"prefix of {len(key)} tokens >= max_seq_len "
                f"{self.engine.engine_config.max_seq_len}")
        eng = self.engine
        eng.reset([slot])
        eng.prefill([list(key)], slots=[slot])
        entry = snapshot_prefix(eng.cache, slot, len(key))
        entry = dataclasses.replace(entry, tokens=key)
        eng.reset([slot])
        self._evict_to_fit(entry.padded_length)
        self._entries[key] = entry
        return entry

    def match(self, prompt: Sequence[int]) -> Optional[PrefixEntry]:
        """Longest registered prefix that strictly prefixes ``prompt``
        (strict: at least one tail token must remain to produce the
        first-sample logits)."""
        best = None
        for key, entry in self._entries.items():
            if (len(key) < len(prompt)
                    and (best is None or len(key) > len(best.tokens))
                    and tuple(prompt[:len(key)]) == key):
                best = entry
        if best is not None:
            self._entries.move_to_end(best.tokens)
        return best

    def restore(self, slot: int, entry: PrefixEntry) -> int:
        """Copy ``entry`` into ``slot`` on the engine; returns the number
        of prompt tokens the caller may skip."""
        self.engine.cache = restore_prefix(self.engine.cache, slot, entry)
        return entry.length


@dataclasses.dataclass
class DualPrefixEntry:
    """Paired snapshots of one prefix in a target+draft engine pair.
    Exposes the PrefixEntry surface the scheduler reads (tokens/length)."""
    target: PrefixEntry
    draft: PrefixEntry

    @property
    def tokens(self):
        return self.target.tokens

    @property
    def length(self) -> int:
        return self.target.length

    @property
    def padded_length(self) -> int:
        return self.target.padded_length


class DualPrefixStore:
    """Prefix caching under speculative decoding (VERDICT r2 ask #6): the
    round invariant requires the draft cache length to equal the target's
    at every boundary, so a restored prefix must land in BOTH caches.
    Entries are registered, stored, evicted and restored as PAIRS — the
    two stores can never disagree about what is cached."""

    def __init__(self, target_engine, draft_engine, max_tokens: int = 16384):
        self.target = target_engine
        self.draft = draft_engine
        self.max_tokens = max_tokens
        self._entries: OrderedDict[tuple, DualPrefixEntry] = OrderedDict()

    @property
    def stored_tokens(self) -> int:
        """Budget in TARGET rows (the draft snapshot is typically much
        smaller; one shared budget keeps eviction paired)."""
        return sum(e.padded_length for e in self._entries.values())

    def _evict_to_fit(self, incoming: int) -> None:
        while (self._entries
               and self.stored_tokens + incoming > self.max_tokens):
            self._entries.popitem(last=False)

    def evict(self, tokens: Sequence[int]) -> bool:
        return self._entries.pop(tuple(tokens), None) is not None

    def __len__(self) -> int:
        return len(self._entries)

    @staticmethod
    def _snap(engine, key: tuple, slot: int) -> PrefixEntry:
        engine.reset([slot])
        engine.prefill([list(key)], slots=[slot])
        entry = snapshot_prefix(engine.cache, slot, len(key))
        entry = dataclasses.replace(entry, tokens=key)
        engine.reset([slot])
        return entry

    def register(self, tokens: Sequence[int], slot: int = 0
                 ) -> DualPrefixEntry:
        key = tuple(int(t) for t in tokens)
        if key in self._entries:
            self._entries.move_to_end(key)
            return self._entries[key]
        if not key:
            raise ValueError("empty prefix")
        if len(key) >= self.target.engine_config.max_seq_len:
            raise ValueError(
                f"prefix of {len(key)} tokens >= max_seq_len "
                f"{self.target.engine_config.max_seq_len}")
        entry = DualPrefixEntry(target=self._snap(self.target, key, slot),
                                draft=self._snap(self.draft, key, slot))
        self._evict_to_fit(entry.padded_length)
        self._entries[key] = entry
        return entry

    def match(self, prompt: Sequence[int]) -> Optional[DualPrefixEntry]:
        best = None
        for key, entry in self._entries.items():
            if (len(key) < len(prompt)
                    and (best is None or len(key) > len(best.tokens))
                    and tuple(prompt[:len(key)]) == key):
                best = entry
        if best is not None:
            self._entries.move_to_end(best.tokens)
        return best

    def restore(self, slot: int, entry: DualPrefixEntry) -> int:
        """Copy the pair into ``slot`` on BOTH engines (the draft/target
        cache-length lockstep invariant holds by construction)."""
        self.target.cache = restore_prefix(self.target.cache, slot,
                                           entry.target)
        self.draft.cache = restore_prefix(self.draft.cache, slot,
                                          entry.draft)
        return entry.length


# ---------------------------------------------------------------------------
# Zero-copy prefix caching for the paged layout
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PagedPrefixEntry:
    """A prefix held as SHARED read-only pool pages. Restoring it is a
    block-table edit — no bytes move. Only whole pages are shareable, so
    ``length`` is the page-aligned floor of the registered prefix; the
    partial tail re-prefills per request (cheap, < one page)."""
    tokens: tuple[int, ...]           # the SHARED (page-aligned) tokens
    length: int                       # == len(tokens), multiple of page
    pages: list

    @property
    def padded_length(self) -> int:   # budget accounting parity
        return self.length


class PagedPrefixStore:
    """PrefixStore interface over shared pool pages (paged engines).

    Unlike the slot-layout store (storage-form copies), entries here cost
    ZERO copies to restore and their pages are protected by the
    allocator's refcounts — an entry evicted while slots still reference
    its pages merely drops one reference."""

    def __init__(self, engine, max_tokens: int = 16384):
        if not getattr(engine, "paged", False):
            raise ValueError("PagedPrefixStore needs a paged engine")
        self.engine = engine
        self.max_tokens = max_tokens
        self._entries: OrderedDict[tuple, PagedPrefixEntry] = OrderedDict()

    @property
    def stored_tokens(self) -> int:
        return sum(e.length for e in self._entries.values())

    def _evict_to_fit(self, incoming: int) -> None:
        while (self._entries
               and self.stored_tokens + incoming > self.max_tokens):
            _, e = self._entries.popitem(last=False)
            self.engine._allocator.free(e.pages)

    def evict(self, tokens: Sequence[int]) -> bool:
        e = self._entries.pop(tuple(tokens), None)
        if e is None:
            return False
        self.engine._allocator.free(e.pages)
        return True

    def __len__(self) -> int:
        return len(self._entries)

    def register(self, tokens: Sequence[int], slot: int = 0):
        """Prefill ``tokens`` on scratch ``slot`` and take its FULL pages
        as the shared entry (the partial tail page stays with the slot
        and is freed by the reset)."""
        key = tuple(int(t) for t in tokens)
        page = self.engine.engine_config.page_size
        n_full = len(key) // page
        shared = key[:n_full * page]
        if shared in self._entries:
            self._entries.move_to_end(shared)
            return self._entries[shared]
        if n_full == 0:
            raise ValueError(
                f"prefix of {len(key)} tokens is shorter than one page "
                f"({page}): nothing shareable")
        if len(key) >= self.engine.max_pool_tokens():
            raise ValueError("prefix exceeds the pool")
        eng = self.engine
        eng.reset([slot])
        eng.prefill([list(shared)], slots=[slot])
        pages = eng.take_slot_pages(slot, n_full)
        eng.reset([slot])                 # frees any tail page only
        entry = PagedPrefixEntry(tokens=shared, length=len(shared),
                                 pages=pages)
        self._evict_to_fit(entry.length)
        self._entries[shared] = entry
        return entry

    def match(self, prompt: Sequence[int]):
        best = None
        for key, entry in self._entries.items():
            if (len(key) < len(prompt)
                    and (best is None or len(key) > len(best.tokens))
                    and tuple(prompt[:len(key)]) == key):
                best = entry
        if best is not None:
            self._entries.move_to_end(best.tokens)
        return best

    def match_len(self, prompt: Sequence[int]) -> int:
        """Reusable token count WITHOUT touching LRU order (admission
        gating peek; entries are page-aligned by construction)."""
        best = 0
        for key in self._entries:
            if (best < len(key) < len(prompt)
                    and tuple(prompt[:len(key)]) == key):
                best = len(key)
        return best

    def restore(self, slot: int, entry: PagedPrefixEntry) -> int:
        """Adopt the shared pages into ``slot`` (block-table edit, zero
        copies); returns the prompt tokens the caller may skip."""
        self.engine.adopt_prefix_pages(slot, entry.pages, entry.length)
        return entry.length


class AutoPrefixCache:
    """Automatic prefix caching for paged engines (the vLLM-APC idea):
    every FINISHED request donates its page-aligned context pages to a
    hash cache — no registration — and every admission adopts the longest
    cached chain matching its prompt. Multi-turn chat over the stateless
    HTTP endpoint is the killer case: round N+1 resends round N's whole
    conversation, whose pages are all still here.

    Entry i of a donated context covers tokens[:i*page] and holds a
    reference on pages[:i] (the allocator refcounts; eviction and slot
    frees each drop one reference, the page returns to the pool with the
    last). ``max_pages`` bounds the cache's distinct page references
    (LRU)."""

    def __init__(self, engine, max_pages: int = 1024):
        if not getattr(engine, "paged", False):
            raise ValueError("AutoPrefixCache needs a paged engine")
        self.engine = engine
        self.max_pages = max_pages
        self._chains: OrderedDict[tuple, list] = OrderedDict()
        self.hits = 0
        self.misses = 0
        self.tokens_reused = 0

    @property
    def cached_pages(self) -> int:
        """DISTINCT pages held by the cache (chains share their common
        prefix pages — that is the whole point — so the HBM footprint is
        the union, not the sum of chain lengths)."""
        pages: set = set()
        for chain in self._chains.values():
            pages.update(chain)
        return len(pages)

    def _evict_to_fit(self, incoming: int) -> None:
        while (self._chains
               and self.cached_pages + incoming > self.max_pages):
            _, pages = self._chains.popitem(last=False)
            self.engine._allocator.free(pages)

    def insert(self, tokens: Sequence[int], slot_pages: Sequence[int],
               valid_tokens: int) -> None:
        """Donate a finishing slot's pages: one chain entry per page-
        aligned prefix of ``tokens[:valid_tokens]`` not already cached.
        Call BEFORE the slot releases its pages."""
        page = self.engine.engine_config.page_size
        n_full = min(valid_tokens // page, len(slot_pages))
        for i in range(n_full, 0, -1):
            key = tuple(int(t) for t in tokens[:i * page])
            if key in self._chains:
                self._chains.move_to_end(key)
                continue
            if i > self.max_pages:
                continue
            chain = list(slot_pages[:i])
            # budget only the DISTINCT pages this chain adds — its prefix
            # chains (inserted next, i-1, i-2, ...) share every page, and
            # charging them again would evict the longer chain just added
            cached: set = set()
            for c in self._chains.values():
                cached.update(c)
            self._evict_to_fit(len(set(chain) - cached))
            self.engine._allocator.share(chain)
            self._chains[key] = chain

    def match(self, prompt: Sequence[int]):
        """Longest cached chain strictly prefixing ``prompt`` (at least
        one tail token must remain). Returns (tokens, pages) or None."""
        page = self.engine.engine_config.page_size
        max_i = (len(prompt) - 1) // page
        for i in range(max_i, 0, -1):
            key = tuple(int(t) for t in prompt[:i * page])
            chain = self._chains.get(key)
            if chain is not None:
                self._chains.move_to_end(key)
                self.hits += 1
                self.tokens_reused += i * page
                return key, chain
        self.misses += 1
        return None

    def restore(self, slot: int, match) -> int:
        tokens, pages = match
        self.engine.adopt_prefix_pages(slot, pages, len(tokens))
        return len(tokens)

    def match_len(self, prompt: Sequence[int]) -> int:
        """Reusable (page-aligned) token count for ``prompt`` WITHOUT
        touching LRU order or hit/miss counters — admission gating peeks
        at what a later real match would reuse."""
        page = self.engine.engine_config.page_size
        for i in range((len(prompt) - 1) // page, 0, -1):
            if tuple(int(t) for t in prompt[:i * page]) in self._chains:
                return i * page
        return 0

    def evict_for(self, n_pages: int) -> int:
        """Free LRU chains until the POOL gained ``n_pages`` free pages
        (shared pages only return with their last reference, so chains
        are dropped until the allocator actually shows the gain). Returns
        the pages actually freed. Called by the scheduler when admission
        or in-flight growth cannot get pages — cached-but-idle prefixes
        must never starve live work (vLLM-APC frees cached blocks under
        allocation pressure the same way)."""
        start = self.engine.free_pages
        while self._chains and self.engine.free_pages - start < n_pages:
            _, pages = self._chains.popitem(last=False)
            self.engine._allocator.free(pages)
        return self.engine.free_pages - start

    def clear(self) -> None:
        for pages in self._chains.values():
            self.engine._allocator.free(pages)
        self._chains.clear()
