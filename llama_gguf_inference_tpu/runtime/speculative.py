"""Speculative decoding: draft-model proposals verified by the target model.

TPU-native equivalent of llama-server's ``--model-draft`` (the reference
forwards it through ``EXTRA_ARGS``; SURVEY §2.9): a small draft model
proposes K greedy tokens per round, the target model scores all K+1
positions in ONE forward (a K+1-token chunk — MXU-friendly, reads the
weights once), and the longest matching prefix is accepted plus the
target's own token at the first divergence.  Per round the sequence
advances 1..K+1 tokens for ~(1 draft + 1/K target) weight traffic per
token — decode is HBM-bound on weights, so acceptance a translates almost
directly into tokens/s.

Correctness: acceptance compares the draft token against the target's
greedy argmax at the same position, so emitted tokens are exactly what
the target's verify pass computes — the engine only routes a dispatch
here when every active slot samples pure greedy (temperature 0, no
penalties, no logprobs).  Draft quality affects only the acceptance rate,
never the output: a stale draft-cache position (the one-token gap the
all-accepted case leaves) is repaired by re-processing the previous token
at the start of each round.

Static shapes throughout (XLA): K is compile-time, ``rounds`` rounds fuse
into one dispatch via ``lax.scan`` (amortizing the host round trip like
the engine's multi-step decode), and per-slot acceptance counts ride in
the returned (rounds, B) array — the host emits ``counts[r, b]`` tokens
from each round's (B, K+1) candidate block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def ngram_propose(hist: jax.Array, prev: jax.Array, pending: jax.Array,
                  off: jax.Array, K: int) -> jax.Array:
    """Prompt-lookup proposals: continuation after the most recent
    historical occurrence of the current bigram.

    hist (B, H): per-slot token history, valid in [0, off) (stale beyond —
    same overwrite discipline as the KV cache).  Finds the latest j with
    ``hist[j] == prev and hist[j+1] == pending`` whose FULL continuation
    window ``hist[j+2 : j+2+K]`` lies inside valid history (a head-of-
    sequence match would draft from the stale region — on a perfectly
    repetitive stream that capped acceptance at 1/K) and proposes that
    window; no match proposes zeros (acceptance then just falls to the
    verify's 1 token).
    """
    B, H = hist.shape
    idx = jnp.arange(H - 1)
    match = (hist[:, :-1] == prev) & (hist[:, 1:] == pending) \
        & (idx[None, :] <= off[:, None] - 2 - K)
    j = jnp.max(jnp.where(match, idx[None, :], -1), axis=1)    # (B,)

    def take(row, jj):
        return jax.lax.dynamic_slice(row, (jnp.maximum(jj, 0) + 2,), (K,))

    drafts = jax.vmap(take)(hist, j)
    return jnp.where(j[:, None] >= 0, drafts, 0).astype(jnp.int32)


def make_ngram_spec(cfg_t, forward, K: int, rounds: int):
    """Draft-free speculative decoding (llama.cpp "lookup decoding"):
    proposals come from the sequence's own history — strong on
    repetitive continuations (code, extraction, structured output) at
    ZERO extra weight traffic; the worst case (no matches) still emits
    one verified token per round for ~one decode step's weight reads.

    Returns fn(params, cache, hist, pending, prev, offsets) ->
    (toks (rounds, B, K+1), counts (rounds, B), cache, hist); cache and
    hist are donated.  hist rows must be padded past the slot capacity so
    in-scan writes never hit the dynamic-update-slice clamp.
    """

    @partial(jax.jit, donate_argnums=(1, 2))
    def ngram_spec(params, cache, hist, pending, prev, offsets):
        B = pending.shape[0]
        ones = jnp.ones(B, jnp.int32)

        def round_body(carry, _):
            cache, hist, pending, prev, off = carry
            drafts = ngram_propose(hist, prev, pending, off, K)
            seq = jnp.concatenate([pending, drafts], axis=1)   # (B, K+1)
            lg, cache2 = forward(params, cfg_t, seq, off, cache,
                                 (K + 1) * ones)
            g = jnp.argmax(lg, axis=-1).astype(jnp.int32)      # (B, K+1)
            match = (drafts == g[:, :-1]).astype(jnp.int32)
            accepted = jnp.cumprod(match, axis=1).sum(axis=1)
            emit = accepted + 1
            # history absorbs the round's inputs + candidates: hist[off]
            # = pending, hist[off+1 .. off+K+1] = g (stale past the new
            # offset, overwritten by later rounds)
            upd = jnp.concatenate([pending, g], axis=1)        # (B, K+2)

            def wr(row, u, o):
                return jax.lax.dynamic_update_slice(row, u, (o,))

            hist = jax.vmap(wr)(hist, upd, off)
            new_pending = jnp.take_along_axis(g, accepted[:, None], axis=1)
            new_prev = jnp.where(
                accepted[:, None] > 0,
                jnp.take_along_axis(
                    g, jnp.maximum(accepted - 1, 0)[:, None], axis=1),
                pending)
            return ((cache2, hist, new_pending, new_prev, off + emit),
                    (g, emit))

        (cache, hist, pending, prev, offsets), (toks, counts) = \
            jax.lax.scan(round_body, (cache, hist, pending, prev, offsets),
                         None, length=rounds)
        return toks, counts, cache, hist

    return ngram_spec


def make_spec_decode(cfg_t, cfg_d, forward, K: int, rounds: int):
    """Build the fused speculative-decode dispatch.

    Returns fn(params_t, params_d, cache_t, cache_d, pending, prev,
    offsets) -> (toks (rounds, B, K+1), counts (rounds, B), cache_t,
    cache_d) with both caches donated.

    ``pending`` (B, 1): the newest generated token (not yet in either
    cache, to be written at ``offsets``).  ``prev`` (B, 1): the sequence
    token before it — re-processed by the draft every round to repair the
    one-position cache gap the previous round's all-accepted case leaves.
    """

    @partial(jax.jit, donate_argnums=(2, 3))
    def spec_decode(params_t, params_d, cache_t, cache_d, pending, prev,
                    offsets):
        B = pending.shape[0]
        ones = jnp.ones(B, jnp.int32)

        def round_body(carry, _):
            cache_t, cache_d, pending, prev, off = carry

            # -- draft phase: repair + first proposal in one (B, 2) chunk
            two = jnp.concatenate([prev, pending], axis=1)
            lg, cache_d2 = forward(params_d, cfg_d, two,
                                   jnp.maximum(off - 1, 0), cache_d,
                                   2 * ones)
            d0 = jnp.argmax(lg[:, 1, :], axis=-1).astype(jnp.int32)

            def draft_body(c, _):
                cache_d, tok, o = c
                lg, cache_d = forward(params_d, cfg_d, tok[:, None], o,
                                      cache_d, ones)
                nxt = jnp.argmax(lg[:, 0, :], axis=-1).astype(jnp.int32)
                return (cache_d, nxt, o + 1), nxt

            (cache_d3, _, _), ds = jax.lax.scan(
                draft_body, (cache_d2, d0, off + 1), None, length=K - 1)
            drafts = jnp.concatenate([d0[None], ds], axis=0).T   # (B, K)

            # -- verify phase: one K+1-token target chunk
            seq = jnp.concatenate([pending, drafts], axis=1)     # (B, K+1)
            lg_t, cache_t2 = forward(params_t, cfg_t, seq, off, cache_t,
                                     (K + 1) * ones)
            g = jnp.argmax(lg_t, axis=-1).astype(jnp.int32)      # (B, K+1)

            # longest matching prefix; +1 for the target's own token at the
            # divergence (or the bonus token when everything matched)
            match = (drafts == g[:, :-1]).astype(jnp.int32)
            accepted = jnp.cumprod(match, axis=1).sum(axis=1)    # (B,) 0..K
            emit = accepted + 1
            new_pending = jnp.take_along_axis(g, accepted[:, None], axis=1)
            new_prev = jnp.where(
                accepted[:, None] > 0,
                jnp.take_along_axis(
                    g, jnp.maximum(accepted - 1, 0)[:, None], axis=1),
                pending)
            return ((cache_t2, cache_d3, new_pending, new_prev, off + emit),
                    (g, emit))

        (cache_t, cache_d, pending, prev, offsets), (toks, counts) = \
            jax.lax.scan(round_body,
                         (cache_t, cache_d, pending, prev, offsets),
                         None, length=rounds)
        return toks, counts, cache_t, cache_d

    return spec_decode
