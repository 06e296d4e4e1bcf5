"""Sampler unit tests: mask semantics, penalties, determinism."""

import numpy as np
import jax.numpy as jnp

from llama_gguf_inference_tpu.runtime.sampler import (
    SampleState, SamplingParams, _mask_min_p, _mask_top_k, _mask_top_p,
    apply_penalties, sample,
)


def logits_row(vals):
    return jnp.asarray(np.array([vals], dtype=np.float32))


def test_top_k_mask():
    l = logits_row([1.0, 5.0, 3.0, 2.0, 4.0])
    out = np.asarray(_mask_top_k(l, jnp.asarray([2])))[0]
    assert np.isfinite(out[[1, 4]]).all()       # top-2 kept
    assert np.isinf(out[[0, 2, 3]]).all()       # rest masked
    # k=0 disables
    out = np.asarray(_mask_top_k(l, jnp.asarray([0])))[0]
    assert np.isfinite(out).all()


def test_top_p_mask_keeps_smallest_covering_prefix():
    # probs ~ [0.643, 0.236, 0.087, 0.032, 0.002]
    l = logits_row([5.0, 4.0, 3.0, 2.0, -1.0])
    out = np.asarray(_mask_top_p(l, jnp.asarray([0.8])))[0]
    assert np.isfinite(out[[0, 1]]).all()       # 0.643+0.236 >= 0.8
    assert np.isinf(out[[2, 3, 4]]).all()
    # top_p = 1.0 keeps everything
    out = np.asarray(_mask_top_p(l, jnp.asarray([1.0])))[0]
    assert np.isfinite(out).all()
    # tiny top_p keeps at least the argmax
    out = np.asarray(_mask_top_p(l, jnp.asarray([1e-6])))[0]
    assert np.isfinite(out[0])


def test_min_p_mask():
    l = logits_row([5.0, 4.0, 0.0, -5.0])
    out = np.asarray(_mask_min_p(l, jnp.asarray([0.3])))[0]
    assert np.isfinite(out[0]) and np.isfinite(out[1])
    assert np.isinf(out[3])


def test_penalties():
    st = SampleState.init(1, 5)
    st = st._replace(counts=jnp.asarray([[2, 0, 1, 0, 0]], jnp.int32),
                     presence=jnp.asarray([0.5]),
                     frequency=jnp.asarray([0.25]),
                     repeat=jnp.asarray([1.0]))
    l = logits_row([1.0, 1.0, 1.0, 1.0, 1.0])
    out = np.asarray(apply_penalties(l, st))[0]
    assert np.isclose(out[0], 1.0 - 0.5 - 0.5)   # presence + 2*frequency
    assert np.isclose(out[2], 1.0 - 0.5 - 0.25)
    assert np.isclose(out[1], 1.0)


def test_repeat_penalty_sign_behavior():
    st = SampleState.init(1, 4)
    st = st._replace(counts=jnp.asarray([[1, 1, 0, 0]], jnp.int32),
                     repeat=jnp.asarray([2.0]))
    l = logits_row([2.0, -2.0, 2.0, -2.0])
    out = np.asarray(apply_penalties(l, st))[0]
    assert np.isclose(out[0], 1.0)     # positive seen: divided
    assert np.isclose(out[1], -4.0)    # negative seen: multiplied
    assert np.isclose(out[2], 2.0)     # unseen untouched
    assert np.isclose(out[3], -2.0)


def test_greedy_picks_argmax_and_counts():
    st = SampleState.init(2, 6)
    st = st._replace(temperature=jnp.zeros(2))
    l = jnp.asarray(np.array([[0, 9, 1, 2, 3, 4],
                              [5, 0, 0, 0, 0, 0]], np.float32))
    tok, st2 = sample(l, st)
    assert np.asarray(tok).tolist() == [1, 0]
    assert int(st2.counts[0, 1]) == 1 and int(st2.counts[1, 0]) == 1
    assert np.asarray(st2.step).tolist() == [1, 1]


def test_seeded_sampling_deterministic_and_step_dependent():
    st = SampleState.init(1, 100)
    st = st._replace(temperature=jnp.asarray([1.0]),
                     seed=jnp.asarray([123], jnp.uint32))
    l = jnp.asarray(np.random.default_rng(0).normal(size=(1, 100)).astype(np.float32))
    t1a, _ = sample(l, st)
    t1b, st2 = sample(l, st)
    assert int(t1a[0]) == int(t1b[0])      # same seed+step -> same token
    t2, _ = sample(l, st2)                 # step advanced -> may differ
    assert 0 <= int(t2[0]) < 100


def test_mixed_greedy_and_sampled_batch():
    st = SampleState.init(2, 50)
    st = st._replace(temperature=jnp.asarray([0.0, 1.0]),
                     seed=jnp.asarray([7, 7], jnp.uint32))
    l = jnp.asarray(np.random.default_rng(1).normal(size=(2, 50)).astype(np.float32))
    tok, _ = sample(l, st)
    assert int(tok[0]) == int(np.asarray(l)[0].argmax())


def test_typical_mask_semantics():
    """llama.cpp typical sampling: order by |surprise - entropy|, keep the
    smallest covering set; near-uniform rows keep almost everything, peaked
    rows with typical_p small keep the entropy-adjacent core."""
    from llama_gguf_inference_tpu.runtime.sampler import _mask_typical
    rng = np.random.default_rng(3)
    l = jnp.asarray(rng.normal(size=(2, 400)).astype(np.float32) * 4.0)
    typ = jnp.asarray([0.3, 1.0], jnp.float32)
    m = np.asarray(_mask_typical(l, typ))
    kept0 = (m[0] > -np.inf).sum()
    assert 1 <= kept0 < 400
    assert (m[1] > -np.inf).all()          # disabled row untouched
    # kept mass >= typical_p (smallest covering prefix semantics)
    p = np.exp(l[0]) / np.exp(l[0]).sum()
    assert p[m[0] > -np.inf].sum() >= 0.3
    # the kept set is the |dev|-smallest: every kept token's deviation is
    # <= every dropped token's deviation, modulo the covering boundary
    lp = np.asarray(l[0], np.float64)
    lp = lp - np.log(np.exp(lp - lp.max()).sum()) - lp.max()
    ent = -(np.exp(lp) * lp).sum()
    dev = np.abs(-lp - ent)
    assert dev[m[0] > -np.inf].max() <= dev[m[0] <= -np.inf].min() + 1e-5


def test_typical_uniform_logits_keep_all():
    from llama_gguf_inference_tpu.runtime.sampler import _mask_typical
    l = jnp.zeros((1, 64), jnp.float32)
    m = np.asarray(_mask_typical(l, jnp.asarray([0.5], jnp.float32)))
    # all tokens equally typical: the covering prefix stops at ~0.5 mass
    kept = (m[0] > -np.inf).sum()
    assert 31 <= kept <= 33


def test_mirostat_v2_mu_converges_toward_tau():
    """mu must move to bring observed surprise toward tau: with a peaked
    distribution (low surprise), mu falls below its 2*tau init."""
    st = SampleState.init(1, 500)
    st = st.write_slot(0, SamplingParams(temperature=1.0, mirostat=2,
                                         mirostat_tau=2.0, mirostat_eta=0.2,
                                         seed=5))
    assert float(st.miro_mu[0]) == 4.0
    rng = np.random.default_rng(0)
    l = jnp.asarray((rng.normal(size=(1, 500)) * 6).astype(np.float32))
    mus = []
    for _ in range(20):
        tok, st = sample(l, st)
        mus.append(float(st.miro_mu[0]))
    assert mus[-1] != 4.0
    # equilibrium: late-window mu spread is modest (adaptive control)
    late = mus[10:]
    assert max(late) - min(late) < 3.0


def test_mirostat_v1_samples_and_updates():
    st = SampleState.init(2, 300)
    st = st.write_slot(0, SamplingParams(temperature=1.0, mirostat=1,
                                         mirostat_tau=4.0, seed=9))
    st = st.write_slot(1, SamplingParams(temperature=0.0))   # greedy neighbor
    rng = np.random.default_rng(2)
    l = jnp.asarray((rng.normal(size=(2, 300)) * 3).astype(np.float32))
    tok, st2 = sample(l, st)
    assert float(st2.miro_mu[0]) != 8.0          # v1 updated its state
    assert int(tok[1]) == int(np.asarray(l)[1].argmax())   # neighbor intact
    assert float(st2.miro_mu[1]) == float(st.miro_mu[1])   # off-slot frozen


def test_mirostat_ignores_truncation_chain():
    """A mirostat slot must not be affected by its own top_k field: llama.cpp
    treats mirostat as exclusive with the truncation samplers."""
    rng = np.random.default_rng(4)
    l = jnp.asarray((rng.normal(size=(1, 200)) * 5).astype(np.float32))
    toks_a, toks_b = [], []
    for top_k in (0, 3):
        st = SampleState.init(1, 200)
        st = st.write_slot(0, SamplingParams(
            temperature=1.0, mirostat=2, mirostat_tau=6.0, top_k=top_k,
            seed=11))
        got = []
        for _ in range(6):
            tok, st = sample(l, st)
            got.append(int(tok[0]))
        (toks_a if top_k == 0 else toks_b).append(got)
    assert toks_a[0] == toks_b[0]
