"""Top-K / top-p / temperature sampling.

Capability parity with:
- ``launchTopKForBeamSearch`` (reference: src/kernels/topk.cu:104-140 — a
  two-pass cub::BlockReduce top-K with per-block insertion-sort register
  queues). On TPU ``jax.lax.top_k`` lowers to XLA's tuned sort/partial-sort;
  a hand-written Pallas queue would re-derive it, so the kernel boundary
  here is the *sampling tail*, not the scan.
- ``launchSampling`` (reference: src/kernels/sampling.cu:73-102 —
  max-subtracted softmax over the K winners, inverse-CDF draw with a
  per-step curand seed, then seq_len++/is_finished bookkeeping). Here the
  draw uses jax.random (counter-based, reproducible across chips), and the
  bookkeeping lives in the jitted decode step (runtime/engine.py), keeping
  this op pure.

Additions over the reference: temperature, nucleus (top-p) filtering, and
greedy mode — all per-call static config (SamplingParams).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["greedy_sample", "sample_top_k", "top_k_logits", "sample_tokens",
           "apply_penalties", "MAX_TOP_K"]

MAX_TOP_K = 64  # static top-k width; per-slot k masks within it


def apply_penalties(logits: jax.Array, counts_ctx: jax.Array,
                    counts_gen: jax.Array, repetition: jax.Array,
                    presence: jax.Array, frequency: jax.Array) -> jax.Array:
    """Context-aware logit penalties (beyond the reference, which had no
    penalty machinery at all).

    logits:     [B, V]
    counts_ctx: [B, V] int — occurrences in the full context (prompt +
                generated); drives the HF-style repetition penalty
    counts_gen: [B, V] int — occurrences among GENERATED tokens only;
                drives the OpenAI-style frequency/presence penalties
    repetition/presence/frequency: [B] per-slot params. Neutral values
    (1, 0, 0) make this an exact identity — callers apply it
    unconditionally, no recompile per request mix.
    """
    lf = logits.astype(jnp.float32)
    rep = repetition[:, None]
    seen = (counts_ctx + counts_gen) > 0
    penalized = jnp.where(lf > 0, lf / rep, lf * rep)
    lf = jnp.where(seen, penalized, lf)
    lf = lf - counts_gen.astype(jnp.float32) * frequency[:, None]
    lf = lf - (counts_gen > 0).astype(jnp.float32) * presence[:, None]
    return lf


def top_k_logits(logits: jax.Array, k: int):
    """Top-K values and indices along the last axis (reference topk.cu)."""
    return jax.lax.top_k(logits, k)


def greedy_sample(logits: jax.Array) -> jax.Array:
    """argmax over vocab: [..., V] -> int32[...]."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def token_logprobs(logits: jax.Array, ids: jax.Array) -> jax.Array:
    """log softmax(logits)[ids]: [B, V], [B] -> [B] f32. The model's raw
    distribution (post-penalty, pre-temperature/filters) — what the
    OpenAI logprobs field reports."""
    lf = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lf, axis=-1)
    picked = jnp.take_along_axis(lf, ids[:, None].astype(jnp.int32),
                                 axis=-1)[:, 0]
    return picked - lse


def sample_top_k(logits: jax.Array, key: jax.Array, *, temperature: float = 1.0,
                 top_k: int = 5, top_p: float = 1.0) -> jax.Array:
    """Sample token ids from softmax(top_k(logits)/T), optionally top-p
    filtered within the K winners. logits: [B, V] -> int32 [B]."""
    if temperature <= 0.0:
        return greedy_sample(logits)
    vals, idx = jax.lax.top_k(logits.astype(jnp.float32), top_k)  # [B, k]
    vals = vals / temperature
    # max-subtracted softmax over the K winners (reference sampling.cu:31-42)
    probs = jax.nn.softmax(vals, axis=-1)
    if top_p < 1.0:
        # nucleus: keep the smallest prefix of sorted probs with cum >= top_p.
        # top_k output is already sorted descending.
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < top_p          # always keeps the first token
        probs = jnp.where(keep, probs, 0.0)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    # inverse-CDF draw (reference sampling.cu:44-63), via categorical on the
    # renormalized K-way distribution
    choice = jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-30)),
                                    axis=-1)                       # [B]
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


def sample_tokens(logits: jax.Array, key: jax.Array, temperature: jax.Array,
                  top_k: jax.Array, top_p: jax.Array,
                  min_p: jax.Array | None = None) -> jax.Array:
    """Per-slot-parameterized sampling (continuous batching: every slot can
    carry its own request's sampling config, all as runtime arrays — no
    recompile per request mix).

    logits: [B, V]; temperature/top_k/top_p(/min_p): [B]
    (temperature<=0 => greedy; min_p=0 => no min-p filtering).
    Always draws from the top-MAX_TOP_K candidates, masked down to each
    slot's k, min-p floor and nucleus p.
    """
    K = min(MAX_TOP_K, logits.shape[-1])
    vals, idx = jax.lax.top_k(logits.astype(jnp.float32), K)       # [B,K]
    t = temperature[:, None]
    greedy = t <= 0.0
    vals_t = vals / jnp.where(greedy, 1.0, t)

    rank = jnp.arange(K)[None, :]
    keep = rank < jnp.maximum(top_k[:, None], 1)
    vals_t = jnp.where(keep, vals_t, -jnp.inf)
    probs = jax.nn.softmax(vals_t, axis=-1)

    if min_p is not None:
        # min-p floor: drop candidates below min_p * p_max (the top
        # candidate always survives)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        probs = jnp.where(probs >= min_p[:, None] * pmax, probs, 0.0)

    # nucleus filter within the K candidates (sorted descending)
    probs = probs / jnp.maximum(jnp.sum(probs, axis=-1, keepdims=True), 1e-30)
    cum = jnp.cumsum(probs, axis=-1)
    keep_p = (cum - probs) < top_p[:, None]
    probs = jnp.where(keep_p, probs, 0.0)
    probs = probs / jnp.maximum(jnp.sum(probs, axis=-1, keepdims=True), 1e-30)

    choice = jax.random.categorical(
        key, jnp.log(jnp.maximum(probs, 1e-30)), axis=-1)          # [B]
    choice = jnp.where(greedy[:, 0], 0, choice)                    # argmax row
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(
        jnp.int32)
