"""Speculative decoding: a small draft model proposes, the target verifies.

Far beyond the reference's capability set (bs=1 greedy-ish sampling,
llama.cpp:322-398) — speculative decoding turns the memory-bound decode of
a large target model into one verify forward per K drafted tokens,
multiplying tokens/step by the acceptance length.

The engine's cache design makes rollback free: K/V are written at absolute
positions and the attention mask only admits columns below each
sequence's ``lengths``, so rejecting draft tokens is just rewinding the
``lengths`` vector — the dead rows are overwritten by the next write and
never attended in between.

Greedy acceptance (do_sample=False) reproduces the target's greedy output
EXACTLY, token for token: a drafted token is accepted iff it equals the
target argmax at that position, and the first mismatch is replaced by the
target argmax — the classic lossless speculative rule. (Exactness assumes
the target's logits are deterministic for a given context independent of
the forward's token-batch shape; true in f32, while bf16 MXU noise between
the T=1 decode and T=k+1 verify paths can flip near-ties — the universal
caveat of speculative decoding on low-precision hardware.)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_engine_tpu.config import SamplingParams
from llm_inference_engine_tpu.models import llama as llama_model
from llm_inference_engine_tpu.runtime.engine import InferenceEngine

__all__ = ["SpeculativeDecoder", "SpecResult"]


@dataclasses.dataclass
class SpecResult:
    token_ids: list[list[int]]
    num_drafted: int = 0
    num_accepted: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.num_accepted / max(self.num_drafted, 1)


class SpeculativeDecoder:
    """Greedy speculative decoding over two InferenceEngines sharing a
    tokenizer/vocab. ``num_draft`` tokens are proposed per round."""

    def __init__(self, target: InferenceEngine, draft: InferenceEngine,
                 num_draft: int = 4):
        if target.config.vocab_size != draft.config.vocab_size:
            raise ValueError("target/draft vocab mismatch")
        self.target = target
        self.draft = draft
        self.k = num_draft

        tcfg, teng = target.config, target.engine_config

        @functools.partial(jax.jit, donate_argnums=(1,),
                           static_argnames=("kv_hi",))
        def _verify(params, cache, tokens, q_start, kv_len, kv_hi=None):
            logits, cache = llama_model.forward_all_logits(
                tcfg, teng, params, tokens, cache, q_start, kv_len,
                kv_hi=kv_hi)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        self._verify = _verify

    def _set_lengths(self, engine: InferenceEngine, lengths: np.ndarray):
        engine.cache = dataclasses.replace(
            engine.cache, lengths=jnp.asarray(lengths.astype(np.int32)))

    def generate(self, prompts: Sequence[Sequence[int]],
                 max_new_tokens: int = 64,
                 eos_token_id: Optional[int] = 2) -> SpecResult:
        """Greedy speculative generation (batch = number of prompts; all
        slots draft/verify in lockstep)."""
        B = self.target.engine_config.max_batch_size
        nseq = len(prompts)
        assert nseq <= B and nseq <= self.draft.engine_config.max_batch_size

        self.target.reset()
        self.draft.reset()
        t_logits = self.target.prefill(prompts)
        self.draft.prefill(prompts)

        # first token comes from the target's prefill logits
        last = np.asarray(jnp.argmax(t_logits, axis=-1).astype(jnp.int32))
        out = [[int(last[i])] for i in range(nseq)]
        done = np.zeros((B,), bool)
        done[nseq:] = True
        stop = {eos_token_id} if eos_token_id is not None else set()
        for i in range(nseq):
            if last[i] in stop:
                done[i] = True
        drafted = accepted = 0

        max_room = self.target.engine_config.max_seq_len - self.k - 2
        while not done.all():
            if all(done[i] or len(out[i]) >= max_new_tokens
                   for i in range(nseq)):
                break
            t_len = np.asarray(jax.device_get(self.target.cache.lengths))
            if (t_len >= max_room).any():
                break

            # --- draft k tokens (its own cache advances as it decodes) ---
            draft_toks = np.zeros((B, self.k), np.int32)
            cur = last.copy()
            for j in range(self.k):
                nxt = np.asarray(self.draft.decode_step(
                    cur, ~done, (np.zeros(B, np.float32),
                                 np.ones(B, np.int32),
                                 np.ones(B, np.float32))))
                draft_toks[:, j] = nxt
                cur = nxt

            # --- one target forward verifies last + k drafts ---
            block = np.concatenate([last[:, None], draft_toks], axis=1)
            q_start = self.target.cache.lengths
            kv_len = q_start + (self.k + 1)
            kv_hi = self.target._kv_watermark(t_len, self.k + 1)
            argmax, self.target.cache = self._verify(
                self.target.params, self.target.cache,
                jnp.asarray(block), q_start, kv_len, kv_hi=kv_hi)
            self.target.cache = dataclasses.replace(
                self.target.cache, lengths=kv_len)
            tgt = np.asarray(argmax)        # [B, k+1]; tgt[:, j] follows
            #                                 block[:, j]

            # --- greedy acceptance per sequence ---
            n_acc = np.zeros((B,), np.int32)
            new_last = last.copy()
            for i in range(nseq):
                if done[i]:
                    continue
                n = 0
                while n < self.k and draft_toks[i, n] == tgt[i, n]:
                    n += 1
                n_acc[i] = n
                emitted = list(draft_toks[i, :n]) + [int(tgt[i, n])]
                drafted += self.k
                accepted += n
                for t in emitted:
                    if int(t) in stop or len(out[i]) >= max_new_tokens:
                        done[i] = True
                        if int(t) in stop:
                            out[i].append(int(t))
                        break
                    out[i].append(int(t))
                new_last[i] = out[i][-1]

            # --- rewind both caches to the accepted frontier ---
            # target wrote [last, d1..dk]; valid history = last + n accepted
            t_new = t_len + n_acc + 1
            self._set_lengths(self.target, t_new)
            # the draft only ever ingested [last, d1..d_{k-1}] — when every
            # draft was accepted (n == k) it must still ingest its own d_k
            # before the bonus token arrives next round
            self._set_lengths(self.draft,
                              t_len + np.minimum(n_acc + 1, self.k))
            full = (n_acc == self.k) & ~done
            if full.any():
                self.draft.decode_step(
                    draft_toks[:, -1].copy(), full,
                    (np.zeros(B, np.float32), np.ones(B, np.int32),
                     np.ones(B, np.float32)))
            last = new_last

        return SpecResult(
            token_ids=[o[:max_new_tokens] for o in out],
            num_drafted=drafted, num_accepted=accepted)
