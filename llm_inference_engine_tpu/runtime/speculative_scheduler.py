"""Continuous batching with speculative decoding.

Combines the two throughput levers: the scheduler multiplexes an open
request stream onto batch slots (scheduler.py), and every decode step is
a speculative draft/verify round (speculative.py) that can emit up to
k+1 tokens per target forward instead of one.

Cache-coherence invariant (the crux of running two engines under
continuous batching): the draft cache length equals the target cache
length at EVERY round boundary. It holds because
- admissions prefill the SAME chunks into both engines (mixed steps
  include live slots' pending tokens as length-1 chunks for both), and
- a freshly accepted token is ingested by NEITHER cache: it travels as
  the next round's ``last`` input, which the round's draft scan ingests
  first and the target's verify block ingests alongside the drafts
  (speculative.py _round).

Greedy only (the lossless acceptance rule): submissions must be
greedy — the scheduler raises otherwise. Near the sequence cap a slot
needs k+2 rows of headroom per round, so requests finish with reason
'capacity' slightly earlier than the plain scheduler would.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from llm_inference_engine_tpu.config import SamplingParams
from llm_inference_engine_tpu.runtime.scheduler import (
    ContinuousBatchingScheduler, Request)
from llm_inference_engine_tpu.runtime.speculative import SpeculativeDecoder

__all__ = ["SpeculativeScheduler"]


class SpeculativeScheduler(ContinuousBatchingScheduler):
    def __init__(self, target, draft, eos_token_id: Optional[int] = 2,
                 num_draft: int = 4):
        if target.engine_config.max_batch_size != \
                draft.engine_config.max_batch_size:
            raise ValueError("target/draft max_batch_size mismatch")
        if getattr(target, "paged", False) or getattr(draft, "paged", False):
            raise NotImplementedError(
                "speculative scheduling uses the slot KV layout")
        super().__init__(target, eos_token_id)
        self.draft = draft
        self.k = num_draft
        self._spec = SpeculativeDecoder(target, draft, num_draft)
        self.num_drafted = 0
        self.num_accepted = 0

    @property
    def acceptance_rate(self) -> float:
        return self.num_accepted / max(self.num_drafted, 1)

    def submit(self, prompt_ids: Sequence[int],
               sampling: SamplingParams = SamplingParams(),
               stream_callback=None) -> Request:
        if not sampling.greedy and sampling.temperature > 0.0:
            raise ValueError("SpeculativeScheduler is greedy-only "
                             "(lossless acceptance rule)")
        return super().submit(prompt_ids, sampling, stream_callback)

    # ------------------------------------------------------------------

    def step(self) -> list[Request]:
        before = [r for r in self.slots if r is not None]
        done: list[Request] = []

        admitted = self._assign_slots()
        for r in admitted:
            r.prefill_pos = 0
        if admitted:
            slots = [r.slot for r in admitted]
            self.engine.reset(slots)
            self.draft.reset(slots)
        done += [r for r in admitted if r.finished]

        prefilling = [r for r in self.slots
                      if r is not None and r.prefill_pos is not None]
        if prefilling:
            # mixed chunked-prefill step, mirrored into the draft engine
            # (identical chunks keep the two caches in lockstep); live
            # decode rows advance one plain token this step
            C = max(1, self.engine.engine_config.max_prefill_len)
            chunks: list[list[int]] = []
            call_slots: list[int] = []
            decode_rows: list[Request] = []
            for r in self.slots:
                if r is None:
                    continue
                if r.prefill_pos is not None:
                    ctx = self._full_context(r)
                    chunk = ctx[r.prefill_pos:r.prefill_pos + C]
                    r.prefill_pos += len(chunk)
                    chunks.append(chunk)
                else:
                    chunks.append([int(self._last_token[r.slot])])
                    decode_rows.append(r)
                call_slots.append(r.slot)
            logits = self.engine.prefill(chunks, slots=call_slots)
            self.draft.prefill(chunks, slots=call_slots)
            count_mask = np.zeros((self.B,), bool)
            for r in decode_rows:
                count_mask[r.slot] = True
            for r in prefilling:
                count_mask[r.slot] = (
                    r.prefill_pos >= len(self._full_context(r)))
            nxt, lp = self.engine.sample(
                logits, self._temp, self._topk, self._topp,
                extras=self._samp_arrays[3], count_mask=count_mask,
                return_logprobs=True)
            nxt, lp = np.asarray(nxt), np.asarray(lp)
            for r in decode_rows:
                self._accept_token(r, int(nxt[r.slot]), float(lp[r.slot]))
            for r in prefilling:
                if (r.prefill_pos is not None
                        and r.prefill_pos >= len(self._full_context(r))):
                    r.prefill_pos = None
                    self._accept_token(r, int(nxt[r.slot]),
                                       float(lp[r.slot]))
        else:
            done += self._spec_round()

        done += [r for r in before + admitted
                 if r.finished and r not in done]
        return done

    def _spec_round(self) -> list[Request]:
        """One draft/verify round over every live slot; accepts up to
        k+1 tokens per slot."""
        target, draft, k = self.engine, self.draft, self.k
        t_len = np.asarray(jax.device_get(target.cache.lengths))
        max_room = target.engine_config.max_seq_len - k - 2

        active = np.array([r is not None and not r.finished
                           for r in self.slots], bool)
        # rows without spec headroom cannot draft: finish them (slightly
        # earlier than the plain scheduler's cap — documented)
        finished_now: list[Request] = []
        for slot in np.nonzero(active)[0]:
            if t_len[slot] >= max_room:
                req = self.slots[slot]
                self._finish(req, "capacity")
                finished_now.append(req)
                active[slot] = False
        if not active.any():
            return finished_now

        kv_hi_t = target._kv_watermark(t_len, k + 2)
        kv_hi_d = draft._kv_watermark(
            np.asarray(jax.device_get(draft.cache.lengths)), k + 2)
        import jax.numpy as jnp
        emitted, n_acc, target.cache, draft.cache = self._spec._round(
            target.params, target.cache, draft.params, draft.cache,
            jnp.asarray(self._last_token), jnp.asarray(~active),
            kv_hi_t=kv_hi_t, kv_hi_d=kv_hi_d)
        emitted = np.asarray(emitted)
        n_acc = np.asarray(n_acc)

        for slot in np.nonzero(active)[0]:
            req = self.slots[slot]
            if req is None:
                continue
            self.num_drafted += k
            self.num_accepted += int(n_acc[slot])
            for t in emitted[slot, :n_acc[slot] + 1]:
                self._accept_token(req, int(t))
                if req.finished:
                    break
        return finished_now
