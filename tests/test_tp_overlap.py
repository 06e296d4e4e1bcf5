"""Explicit overlapped-TP path (parallel.overlap) on the virtual CPU mesh.

Covers the three layers of the LGT_TP_OVERLAP=1 stack:
1. per-shard repack re-indexing is an exact permutation (dequant identity);
2. the ring all-reduce decomposition equals a fused psum;
3. shard_map row-parallel matmul == the single-device XLA path, and the
   full engine on a tp mesh stays token-identical to single-device.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_gguf_inference_tpu.gguf import GGMLType
from llama_gguf_inference_tpu.parallel.mesh import AXIS_TP, make_mesh
from jax.sharding import Mesh


def _tp_mesh(tp):
    return Mesh(np.array(jax.devices()[:tp]), (AXIS_TP,))
from llama_gguf_inference_tpu.parallel.overlap import (
    RowParallelLinear, make_row_parallel, ring_allreduce, set_overlap_mesh,
    stack_row_shards,
)
from llama_gguf_inference_tpu.quant.numpy_ref import quantize
from llama_gguf_inference_tpu.quant.repack import repack, to_quant_linear
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama

FORMATS = [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q6_K,
           GGMLType.Q2_K]


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _make_ql(rng, gtype, out_f=8, in_f=2048):
    x = rng.normal(size=(out_f, in_f)).astype(np.float32)
    return to_quant_linear(repack(quantize(x, gtype), gtype, out_f, in_f))


@pytest.mark.parametrize("gtype", FORMATS, ids=lambda t: t.name)
@pytest.mark.parametrize("tp", [2, 4, 8])
def test_stack_row_shards_dequant_identity(rng, gtype, tp):
    ql = _make_ql(rng, gtype)
    if (ql.in_features // tp) % ql.d_size:
        pytest.skip("shard would split a super-block")
    stacked = stack_row_shards(ql, tp)
    rp = RowParallelLinear(stacked=stacked, tp=tp)
    np.testing.assert_array_equal(
        np.asarray(rp.dequantize(np.float32)),
        np.asarray(ql.dequantize(np.float32)),
        err_msg=f"{gtype.name} per-shard re-layout not exact")


def test_stack_row_shards_dense(rng):
    from llama_gguf_inference_tpu.ops.linear import DenseLinear
    w = DenseLinear.from_f32(rng.normal(size=(8, 512)).astype(np.float32))
    rp = RowParallelLinear(stacked=stack_row_shards(w, 4), tp=4)
    np.testing.assert_array_equal(np.asarray(rp.dequantize(jnp.float32)),
                                  np.asarray(w.w, dtype=np.float32))


@pytest.mark.parametrize("tp", [2, 4, 8])
@pytest.mark.parametrize("out", [64, 96])   # 96 % 8 != 0 -> psum fallback
def test_ring_allreduce_matches_psum(tp, out):
    mesh = _tp_mesh(tp)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(tp, 3, out)).astype(np.float32))

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ring = shard_map(lambda v: ring_allreduce(v[0], AXIS_TP, tp),
                     mesh=mesh, in_specs=P(AXIS_TP), out_specs=P(),
                     check_vma=False)
    ps = shard_map(lambda v: jax.lax.psum(v[0], AXIS_TP),
                   mesh=mesh, in_specs=P(AXIS_TP), out_specs=P())
    np.testing.assert_allclose(np.asarray(ring(x)), np.asarray(ps(x)),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ring(x)),
                               np.asarray(x.sum(0)), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gtype", [GGMLType.Q8_0, GGMLType.Q4_K],
                         ids=lambda t: t.name)
def test_row_parallel_matmul_matches_xla(rng, gtype):
    tp = 4
    mesh = _tp_mesh(tp)
    ql = _make_ql(rng, gtype, out_f=16, in_f=2048)
    rp = make_row_parallel(ql, mesh)
    x = jnp.asarray(rng.normal(size=(2, 3, 2048)).astype(np.float32),
                    jnp.bfloat16)
    ref = np.asarray(ql.matmul_xla(x, jnp.float32))
    got = np.asarray(rp.matmul(x, jnp.float32))
    set_overlap_mesh(None)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("ovl") / "tp.gguf"
    # dim 256 / tp 8 = 32: Q8_0 blocks stay intact under row sharding
    write_tiny_llama(p, dim=256, n_layers=2, n_heads=8, n_kv_heads=8,
                     ffn_dim=512, quant=GGMLType.Q8_0)
    return p


def test_engine_overlap_tp_matches_single_device(model_path, monkeypatch):
    from llama_gguf_inference_tpu.runtime.engine import (EngineConfig,
                                                         InferenceEngine)
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    p = SamplingParams(temperature=0.0, max_tokens=6)

    def run(tp, overlap):
        if overlap:
            monkeypatch.setenv("LGT_TP_OVERLAP", "1")
        else:
            monkeypatch.delenv("LGT_TP_OVERLAP", raising=False)
        eng = InferenceEngine(str(model_path), EngineConfig(
            max_slots=2, ctx=64, prefill_buckets=(16,), mode="quant",
            multi_step=2, tp=tp, dp=1))
        eng.start()
        try:
            return [ev.token_id for ev in eng.generate("hello world", p)]
        finally:
            eng.stop()
            set_overlap_mesh(None)

    single = run(1, False)
    assert run(8, True) == single
    # sanity: the overlap path actually engaged (params carry the container)
    monkeypatch.setenv("LGT_TP_OVERLAP", "1")
    from llama_gguf_inference_tpu.parallel.partition import shard_params
    from llama_gguf_inference_tpu.runtime.loader import load_model
    cfg, params, _ = load_model(str(model_path), mode="quant")
    mesh = make_mesh(tp=8, dp=1)
    sp = shard_params(params, cfg, mesh)
    assert isinstance(sp["layers"][0]["ffn_down"], RowParallelLinear)
    assert isinstance(sp["layers"][0]["attn_output"], RowParallelLinear)
    set_overlap_mesh(None)


def test_chunked_ring_parity_and_interleaved_schedule(rng):
    """The pipelined per-output-chunk ring (LGT_TP_CHUNKS) must (a) match
    the un-chunked path numerically and (b) compile to a module where
    collective-permutes interleave with later chunks' matmuls — the data
    independence that lets the TPU scheduler hide ring stages under the
    next chunk's HBM weight streaming (the MULTICHIP_r05 overlap floor
    rests on this structure)."""
    import os
    import re

    tp = 4
    mesh = _tp_mesh(tp)
    ql = _make_ql(rng, GGMLType.Q4_K, out_f=64, in_f=2048)
    rp = make_row_parallel(ql, mesh)
    x = jnp.asarray(rng.normal(size=(2, 2048)).astype(np.float32),
                    jnp.bfloat16)
    old = os.environ.get("LGT_TP_CHUNKS")
    try:
        os.environ["LGT_TP_CHUNKS"] = "1"
        ref = np.asarray(rp.matmul(x, jnp.float32))
        os.environ["LGT_TP_CHUNKS"] = "4"
        got_fn = jax.jit(lambda v: rp.matmul(v, jnp.float32))
        got = np.asarray(got_fn(x))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

        txt = got_fn.lower(x).compile().as_text()
        lines = txt.splitlines()
        cp = [i for i, l in enumerate(lines)
              if "collective-permute" in l and "=" in l]
        dots = [i for i, l in enumerate(lines)
                if re.search(r"= .*(dot|fusion)\(", l)]
        assert len(cp) >= 2 * (tp - 1), "ring stages must survive compilation"
        # at least one ring stage is scheduled before the last chunk's
        # compute: comm is NOT sunk to an all-compute-then-all-comm tail
        assert cp[0] < dots[-1], "collectives must interleave with compute"
    finally:
        if old is None:
            os.environ.pop("LGT_TP_CHUNKS", None)
        else:
            os.environ["LGT_TP_CHUNKS"] = old
        set_overlap_mesh(None)
