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
