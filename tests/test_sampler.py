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
