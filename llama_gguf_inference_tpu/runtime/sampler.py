"""Batched, jittable token sampling.

Replaces llama.cpp's per-slot sampler chain (the reference exposes its knobs
through the OpenAI API: temperature/top_p/penalties/stop — reference
``docs/API_REFERENCE.md:369-379``).  All requests in a decode batch sample in
one fused XLA computation with per-request parameter vectors; randomness is
``jax.random`` with per-slot fold-in counters (deterministic per seed).

Supported: temperature (0 => greedy), top_k, top_p, min_p, typical_p,
presence/frequency penalties (OpenAI semantics), repeat penalty (llama.cpp
semantics, applied to any token seen in the sequence so far), logit_bias,
mirostat v1/v2 (per-slot adaptive-surprise state on device).

Chain-order note: llama.cpp's default sampler chain applies temperature
LAST (after the truncation samplers); this sampler scales by temperature
FIRST, so top_p/typical_p masses are computed on the tempered
distribution.  The truncation set differs only when temperature != 1.0;
every sampler's semantics on the distribution it sees match llama.cpp
(reference backend's sampler set, SURVEY.md §2.9).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SamplingParams:
    """Host-side per-request sampling configuration (OpenAI + llama.cpp knobs)."""

    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0               # 0 = disabled
    min_p: float = 0.0
    typical_p: float = 1.0       # 1.0 = disabled (llama.cpp typical sampling)
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repeat_penalty: float = 1.0  # 1.0 = disabled
    mirostat: int = 0            # 0 = off, 1 / 2 = mirostat v1 / v2
    mirostat_tau: float = 5.0    # target surprise (bits)
    mirostat_eta: float = 0.1    # learning rate
    seed: int = 0
    max_tokens: int = 256
    stop: tuple[str, ...] = ()
    logit_bias: dict[int, float] | None = None
    n_probs: int = 0             # logprobs per token (OpenAI `logprobs`)
    grammar: str = ""            # GBNF text (response_format / grammar)


class SampleState(NamedTuple):
    """Device-side per-slot sampling state (all (B, ...) arrays)."""

    temperature: jax.Array       # (B,) f32
    top_p: jax.Array             # (B,) f32
    top_k: jax.Array             # (B,) i32
    min_p: jax.Array             # (B,) f32
    typical: jax.Array           # (B,) f32 — typical_p (1.0 = off)
    presence: jax.Array          # (B,) f32
    frequency: jax.Array         # (B,) f32
    repeat: jax.Array            # (B,) f32
    miro: jax.Array              # (B,) i32 — mirostat mode 0/1/2
    miro_tau: jax.Array          # (B,) f32
    miro_eta: jax.Array          # (B,) f32
    miro_mu: jax.Array           # (B,) f32 — adaptive state (init 2*tau)
    seed: jax.Array              # (B,) u32
    counts: jax.Array            # (B, vocab) i32 — tokens emitted so far
    step: jax.Array              # (B,) i32 — fold-in counter
    bias: jax.Array              # (B, vocab) f32 — logit_bias + grammar mask

    @staticmethod
    def init(batch: int, vocab: int) -> "SampleState":
        z = jnp.zeros(batch, jnp.float32)
        return SampleState(
            temperature=jnp.ones(batch, jnp.float32),
            top_p=jnp.ones(batch, jnp.float32),
            top_k=jnp.zeros(batch, jnp.int32),
            min_p=z,
            typical=jnp.ones(batch, jnp.float32),
            presence=z, frequency=z,
            repeat=jnp.ones(batch, jnp.float32),
            miro=jnp.zeros(batch, jnp.int32),
            miro_tau=z, miro_eta=z, miro_mu=z,
            seed=jnp.zeros(batch, jnp.uint32),
            counts=jnp.zeros((batch, vocab), jnp.int32),
            step=jnp.zeros(batch, jnp.int32),
            bias=jnp.zeros((batch, vocab), jnp.float32),
        )

    def write_slot(self, b: int, p: SamplingParams, prompt_ids=None) -> "SampleState":
        """Host-side slot (re)initialization when a request is admitted."""
        counts = self.counts.at[b].set(0)
        if prompt_ids is not None and len(prompt_ids):
            ids = jnp.asarray(np.asarray(prompt_ids, dtype=np.int32))
            counts = counts.at[b].add(
                jnp.zeros(self.counts.shape[1], jnp.int32).at[ids].add(1))
        return self._replace(
            temperature=self.temperature.at[b].set(p.temperature),
            top_p=self.top_p.at[b].set(p.top_p),
            top_k=self.top_k.at[b].set(p.top_k),
            min_p=self.min_p.at[b].set(p.min_p),
            typical=self.typical.at[b].set(p.typical_p),
            presence=self.presence.at[b].set(p.presence_penalty),
            frequency=self.frequency.at[b].set(p.frequency_penalty),
            repeat=self.repeat.at[b].set(p.repeat_penalty),
            miro=self.miro.at[b].set(p.mirostat),
            miro_tau=self.miro_tau.at[b].set(p.mirostat_tau),
            miro_eta=self.miro_eta.at[b].set(p.mirostat_eta),
            miro_mu=self.miro_mu.at[b].set(2.0 * p.mirostat_tau),
            seed=self.seed.at[b].set(np.uint32(p.seed)),
            counts=counts,
            step=self.step.at[b].set(0),
            bias=self.bias.at[b].set(
                jnp.asarray(bias_row(p, self.counts.shape[1]))),
        )


def bias_row(p: SamplingParams, vocab: int) -> np.ndarray:
    """(V,) f32 static logit bias for a request: OpenAI ``logit_bias``
    entries applied additively (llama.cpp semantics — raw addition)."""
    row = np.zeros(vocab, np.float32)
    if p.logit_bias:
        for tid, v in p.logit_bias.items():
            t = int(tid)
            if 0 <= t < vocab:
                row[t] = float(v)
    return row


@jax.jit
def set_bias_row(st: SampleState, b: jax.Array, row: jax.Array) -> SampleState:
    """Replace slot b's bias row (grammar mask updates, one dispatch)."""
    return st._replace(bias=st.bias.at[b].set(row))


@jax.jit
def write_slot_device(st: SampleState, b: jax.Array, scal: jax.Array,
                      top_k: jax.Array, seed: jax.Array, ids: jax.Array,
                      n_valid: jax.Array, bias: jax.Array) -> SampleState:
    """Jitted slot (re)initialization: ONE dispatch per admission.

    The host-side :meth:`SampleState.write_slot` runs ~14 eager jax ops —
    on a remote-relay TPU runtime each eager op is a full dispatch round
    trip, which made admission cost >1 s per request (measured: 1.75 s
    from prefill token to first decode batch on the 8B bench).  This fused
    version takes the scalars as arrays and the prompt ids padded to a
    static bucket (``n_valid`` masks the tail), exactly reproducing
    write_slot's semantics.

    scal: (temperature, top_p, min_p, presence, frequency, repeat,
    typical_p, mirostat_mode, mirostat_tau, mirostat_eta) f32[10].
    """
    V = st.counts.shape[1]
    n_pad = ids.shape[0]
    valid = (jnp.arange(n_pad, dtype=jnp.int32) < n_valid).astype(jnp.int32)
    add = jnp.zeros(V, jnp.int32).at[ids].add(valid)
    return SampleState(
        temperature=st.temperature.at[b].set(scal[0]),
        top_p=st.top_p.at[b].set(scal[1]),
        top_k=st.top_k.at[b].set(top_k),
        min_p=st.min_p.at[b].set(scal[2]),
        typical=st.typical.at[b].set(scal[6]),
        presence=st.presence.at[b].set(scal[3]),
        frequency=st.frequency.at[b].set(scal[4]),
        repeat=st.repeat.at[b].set(scal[5]),
        miro=st.miro.at[b].set(scal[7].astype(jnp.int32)),
        miro_tau=st.miro_tau.at[b].set(scal[8]),
        miro_eta=st.miro_eta.at[b].set(scal[9]),
        miro_mu=st.miro_mu.at[b].set(2.0 * scal[8]),
        seed=st.seed.at[b].set(seed),
        counts=st.counts.at[b].set(add),
        step=st.step.at[b].set(0),
        bias=st.bias.at[b].set(bias),
    )


def apply_penalties(logits: jax.Array, st: SampleState) -> jax.Array:
    """logits (B, V) f32 with OpenAI presence/frequency + llama.cpp repeat."""
    seen = (st.counts > 0)
    logits = logits - st.presence[:, None] * seen.astype(jnp.float32)
    logits = logits - st.frequency[:, None] * st.counts.astype(jnp.float32)
    rp = st.repeat[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(seen, penalized, logits)
    return logits


def _mask_top_k(logits: jax.Array, k: jax.Array) -> jax.Array:
    V = logits.shape[-1]
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]
    k_eff = jnp.where(k > 0, jnp.clip(k, 1, V), V)
    thresh = jnp.take_along_axis(sorted_desc, (k_eff - 1)[:, None], axis=-1)
    return jnp.where(logits >= thresh, logits, -jnp.inf)


def _mask_top_p(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    probs = jax.nn.softmax(logits, axis=-1)
    sp = jnp.sort(probs, axis=-1)[:, ::-1]
    cum = jnp.cumsum(sp, axis=-1)
    # keep the smallest prefix with cumulative prob >= top_p (always >= 1 token)
    keep_sorted = (cum - sp) < top_p[:, None]
    # threshold = prob of the last kept sorted entry
    last_idx = jnp.maximum(jnp.sum(keep_sorted, axis=-1) - 1, 0)
    thresh = jnp.take_along_axis(sp, last_idx[:, None], axis=-1)
    return jnp.where(probs >= thresh, logits, -jnp.inf)


def _mask_min_p(logits: jax.Array, min_p: jax.Array) -> jax.Array:
    probs = jax.nn.softmax(logits, axis=-1)
    pmax = probs.max(axis=-1, keepdims=True)
    return jnp.where(probs >= min_p[:, None] * pmax, logits, -jnp.inf)


def _mask_typical(logits: jax.Array, typ: jax.Array) -> jax.Array:
    """llama.cpp typical sampling: keep the smallest set of tokens — ordered
    by |−log p − H| ascending (closest to the distribution's entropy) —
    whose cumulative probability reaches ``typ``  (always >= 1 token)."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(lp)
    ent = -jnp.sum(jnp.where(p > 0, p * lp, 0.0), axis=-1, keepdims=True)
    dev = jnp.abs(-lp - ent)                       # (B, V)
    order = jnp.argsort(dev, axis=-1)              # ascending deviation
    p_ord = jnp.take_along_axis(p, order, axis=-1)
    keep_ord = (jnp.cumsum(p_ord, axis=-1) - p_ord) < typ[:, None]
    # llama.cpp min_keep=1: the most typical token always survives, even
    # for typical_p <= 0 (otherwise every logit is -inf and sampling
    # degenerates to token 0)
    keep_ord = keep_ord.at[:, 0].set(True)
    keep = jnp.zeros_like(keep_ord).at[
        jnp.arange(logits.shape[0])[:, None], order].set(keep_ord)
    keep = keep | (typ >= 1.0)[:, None]   # disabled rows pass through exactly
    return jnp.where(keep, logits, -jnp.inf)


_MIRO_V1_M = 100   # llama.cpp mirostat v1: Zipf exponent fit over the top m


def _mirostat_mask(scaled: jax.Array, st: SampleState) -> jax.Array:
    """Per-slot mirostat truncation of the tempered logits (llama.cpp):
    v2 keeps tokens with surprise −log2(p) <= mu; v1 derives a top-k from
    the Zipf-fit estimate over the ``m`` most probable tokens.  Rows with
    mirostat off pass through unchanged."""
    B, V = scaled.shape
    lp = jax.nn.log_softmax(scaled, axis=-1)
    surprise = -lp / jnp.log(2.0)                  # bits
    # v2: keep surprise <= mu (plus always the argmax row-max fallback)
    keep2 = surprise <= st.miro_mu[:, None]
    # v1: s_hat from consecutive sorted-prob ratios, then k(mu, s_hat)
    m1 = min(_MIRO_V1_M, V - 1)
    sp = jnp.sort(lp, axis=-1)[:, ::-1][:, :m1 + 1]           # top m+1 logps
    i = jnp.arange(m1, dtype=jnp.float32)
    t_i = jnp.log((i + 2.0) / (i + 1.0))
    b_i = sp[:, :-1] - sp[:, 1:]                   # log(p_i / p_{i+1})
    s_hat = jnp.sum(t_i * b_i, axis=-1) / jnp.sum(t_i * t_i)
    eps = jnp.maximum(s_hat - 1.0, 1e-5)
    k1 = ((eps * jnp.exp2(st.miro_mu))
          / (1.0 - float(V) ** (-eps))) ** (1.0 / jnp.maximum(s_hat, 1e-5))
    k1 = jnp.clip(k1, 1.0, float(V)).astype(jnp.int32)
    keep1 = _mask_top_k(scaled, k1) > -jnp.inf
    keep = jnp.where((st.miro == 2)[:, None], keep2, keep1)
    # never mask every token: the row max always survives
    keep = keep | (lp >= lp.max(axis=-1, keepdims=True))
    on = (st.miro > 0)[:, None]
    return jnp.where(on & ~keep, -jnp.inf, scaled)


def _mirostat_update(scaled_masked: jax.Array, tok: jax.Array,
                     st: SampleState) -> jax.Array:
    """mu <- mu - eta * (observed_surprise - tau) for mirostat slots, with
    the observed surprise measured on the truncated, renormalized
    distribution the token was drawn from (llama.cpp semantics)."""
    lp = jax.nn.log_softmax(scaled_masked, axis=-1)
    obs = -jnp.take_along_axis(lp, tok[:, None], axis=-1)[:, 0] / jnp.log(2.0)
    mu = st.miro_mu - st.miro_eta * (obs - st.miro_tau)
    return jnp.where(st.miro > 0, mu, st.miro_mu)


def sample(logits: jax.Array, st: SampleState) -> tuple[jax.Array, SampleState]:
    """logits (B, V) f32 -> token ids (B,) i32; updates counts/step.

    Jit-safe: all control flow is element-wise selects.
    """
    B, V = logits.shape

    # each stage is gated on "any slot needs it" with lax.cond so disabled
    # features cost nothing at runtime (top-k/top-p are full-vocab sorts)
    def maybe(pred, fn, x):
        return jax.lax.cond(pred, fn, lambda v: v, x)

    # logit_bias + grammar masks: a plain (B, V) add — negligible next to
    # the forward's weight streaming, so no any()-gate (which would itself
    # read the full array)
    logits = logits + st.bias

    logits = maybe(
        jnp.any((st.presence != 0.0) | (st.frequency != 0.0) | (st.repeat != 1.0)),
        lambda l: apply_penalties(l, st), logits)

    greedy = st.temperature <= 0.0
    argmax = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def do_sample(logits):
        temp = jnp.where(greedy, 1.0, jnp.maximum(st.temperature, 1e-6))
        scaled = logits / temp[:, None]
        chain = maybe(jnp.any(st.top_k > 0),
                      lambda s: _mask_top_k(s, st.top_k), scaled)
        chain = maybe(jnp.any(st.typical < 1.0),
                      lambda s: _mask_typical(s, st.typical), chain)
        chain = maybe(jnp.any(st.min_p > 0.0),
                      lambda s: _mask_min_p(s, st.min_p), chain)
        chain = maybe(jnp.any(st.top_p < 1.0),
                      lambda s: _mask_top_p(s, st.top_p), chain)
        # mirostat replaces the truncation chain for its slots (llama.cpp:
        # the mirostat sampler is exclusive with top-k/p/typical)
        miro_any = jnp.any(st.miro > 0)
        masked = maybe(miro_any,
                       lambda s: jnp.where((st.miro > 0)[:, None],
                                           _mirostat_mask(scaled, st), s),
                       chain)

        # per-slot keys: fold seed and step into a counter-based key
        def draw(seed, step, row):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
            key = jax.random.fold_in(key, step)
            return jax.random.categorical(key, row)

        tok = jax.vmap(draw)(st.seed, st.step.astype(jnp.uint32),
                             masked).astype(jnp.int32)
        mu = jax.lax.cond(miro_any,
                          lambda: _mirostat_update(masked, tok, st),
                          lambda: st.miro_mu)
        return tok, mu

    sampled, miro_mu = jax.lax.cond(
        jnp.all(greedy), lambda l: (argmax, st.miro_mu), do_sample, logits)
    tok = jnp.where(greedy, argmax, sampled)

    counts = st.counts.at[jnp.arange(B), tok].add(1)
    return tok, st._replace(counts=counts, step=st.step + 1, miro_mu=miro_mu)


def top_logprobs(logits: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
    """Top-n (logprob, token) per row for OpenAI `logprobs` responses."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(lp, n)
    return vals, idx
