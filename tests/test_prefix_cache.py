"""Prefix caching tests (runtime/prefix_cache.py).

No reference counterpart (the reference recomputes the whole accumulated
history each round, llama.cpp:137-155). Invariants: restoring a snapshot
and prefilling only the tail is indistinguishable from prefilling the full
prompt — logits, greedy tokens, every cache variant — and the store's
match/LRU semantics hold.
"""

import numpy as np
import pytest

from llm_inference_engine_tpu.config import EngineConfig, SamplingParams, get_config
from llm_inference_engine_tpu.models.weights import init_dummy_params
from llm_inference_engine_tpu.runtime.engine import InferenceEngine
from llm_inference_engine_tpu.runtime.prefix_cache import PrefixStore
from llm_inference_engine_tpu.runtime.scheduler import ContinuousBatchingScheduler

CFG = get_config("debug")
PREFIX = list(range(5, 21))          # 16 tokens == one chunk at C=16
TAILS = [[40, 41], [50, 51, 52, 53], [60]]


def make_engine(batch=2, seq=96, **kw):
    eng = EngineConfig(max_batch_size=batch, max_seq_len=seq, kernels="xla",
                       max_prefill_len=16, **kw)
    return InferenceEngine(CFG, eng, init_dummy_params(CFG, seed=0))


def test_restore_then_tail_matches_full_prefill():
    """prefix-restore + tail prefill == full prefill, bit-for-bit (the
    chunk boundaries coincide when the prefix is chunk-aligned)."""
    full = make_engine()
    logits_full = np.asarray(full.prefill([PREFIX + TAILS[0]], slots=[0]))

    eng = make_engine()
    store = PrefixStore(eng)
    entry = store.register(PREFIX, slot=1)
    assert entry.length == len(PREFIX)
    assert int(np.asarray(eng.cache.lengths)[1]) == 0   # scratch slot reset

    store.restore(0, entry)
    assert int(np.asarray(eng.cache.lengths)[0]) == len(PREFIX)
    logits_reused = np.asarray(eng.prefill([TAILS[0]], slots=[0]))

    np.testing.assert_array_equal(logits_full[0], logits_reused[0])


def test_restore_into_any_slot():
    """One compiled restore serves every slot (slot index is traced)."""
    eng = make_engine(batch=3)
    store = PrefixStore(eng)
    entry = store.register(PREFIX, slot=0)
    for slot in (2, 1, 0):
        store.restore(slot, entry)
        assert int(np.asarray(eng.cache.lengths)[slot]) == len(PREFIX)


def test_match_longest_strict_and_lru_eviction():
    eng = make_engine()
    store = PrefixStore(eng, max_tokens=192)   # room for 3 padded-64 entries
    short = PREFIX[:8]
    store.register(short, slot=0)
    long_e = store.register(PREFIX, slot=0)

    # longest strict prefix wins
    assert store.match(PREFIX + [99]) is long_e
    # a prompt equal to the prefix must NOT match (no tail to sample from)
    assert store.match(PREFIX) is not None      # the SHORT entry matches
    assert store.match(PREFIX).length == len(short)
    assert store.match([1, 2, 3]) is None

    # LRU: registering past the budget evicts the least-recently matched
    store.match(list(short) + [7])              # refresh `short`
    store.register([70, 71, 72], slot=0)
    store.register([80, 81, 82], slot=0)        # budget forces an eviction
    # the 16-token entry (least-recently matched) went; `short` still hits
    assert store.match(PREFIX + [99]).length == len(short)
    assert store.match(list(short) + [7]) is not None

    with pytest.raises(ValueError):
        store.register([], slot=0)
    with pytest.raises(ValueError):
        store.register(list(range(200)), slot=0)  # >= max_seq_len


def _run_sched(prompts, sp, prefix=None, **eng_kw):
    eng = make_engine(**eng_kw)
    sched = ContinuousBatchingScheduler(eng, eos_token_id=None)
    if prefix is not None:
        sched.register_prefix(prefix)
    reqs = [sched.submit(p, sp) for p in prompts]
    sched.run()
    return reqs


def test_scheduler_prefix_reuse_token_parity():
    """Requests sharing a registered prefix produce exactly the tokens of
    a prefix-less run, skip the prefix's prefill, and non-matching
    requests are untouched."""
    prompts = [PREFIX + t for t in TAILS] + [[3, 1, 4, 1, 5]]
    sp = SamplingParams(greedy=True, max_new_tokens=6)

    base = _run_sched(prompts, sp)
    reused = _run_sched(prompts, sp, prefix=PREFIX)

    assert [r.output_ids for r in reused] == [r.output_ids for r in base]
    assert [r.reused_prefix_len for r in reused] == [16, 16, 16, 0]
    assert all(r.reused_prefix_len == 0 for r in base)


def test_scheduler_prefix_reuse_int8_kv_cache():
    """Storage-form snapshot restore is exact for the int8 KV cache too."""
    prompts = [PREFIX + t for t in TAILS[:2]]
    sp = SamplingParams(greedy=True, max_new_tokens=5)
    kw = dict(kv_cache_dtype_name="int8")
    base = _run_sched(prompts, sp, **kw)
    reused = _run_sched(prompts, sp, prefix=PREFIX, **kw)
    assert [r.output_ids for r in reused] == [r.output_ids for r in base]
    assert all(r.reused_prefix_len == 16 for r in reused)


def test_unaligned_prefix_token_parity():
    """A prefix that is NOT a multiple of the chunk size still reuses
    correctly (greedy tokens match the recomputed run)."""
    prefix = list(range(5, 24))                 # 19 tokens, C=16
    prompts = [prefix + [40, 41, 42]]
    sp = SamplingParams(greedy=True, max_new_tokens=6)
    base = _run_sched(prompts, sp)
    reused = _run_sched(prompts, sp, prefix=prefix)
    assert reused[0].output_ids == base[0].output_ids
    assert reused[0].reused_prefix_len == 19


def test_prefix_reuse_preserves_repetition_penalty():
    """Restored prefix tokens must still count as context for the
    repetition penalty: outputs match the no-reuse run exactly
    (review finding: restore copied KV but not the count planes)."""
    sp = SamplingParams(greedy=True, max_new_tokens=8,
                        repetition_penalty=1.5)
    prompts = [PREFIX + t for t in TAILS[:2]]
    base = _run_sched(prompts, sp)
    reused = _run_sched(prompts, sp, prefix=PREFIX)
    assert all(r.reused_prefix_len == len(PREFIX) for r in reused)
    assert [r.output_ids for r in reused] == [r.output_ids for r in base]
