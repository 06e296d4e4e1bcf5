"""Post-repack layout cache (cold-start <60 s item, VERDICT r1 #7)."""

import json

import numpy as np
import jax

from llama_gguf_inference_tpu.runtime.layout_cache import LayoutCache
from llama_gguf_inference_tpu.runtime.loader import load_model
from llama_gguf_inference_tpu.gguf.constants import GGMLType
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


def _params_equal(a, b) -> bool:
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    if len(la) != len(lb):
        return False
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_second_load_hits_cache_and_is_identical(tmp_path, monkeypatch):
    monkeypatch.delenv("LGT_LAYOUT_CACHE", raising=False)
    monkeypatch.setenv("LGT_LAYOUT_CACHE_DIR", str(tmp_path / "lc"))
    path = tmp_path / "m.gguf"
    write_tiny_llama(path, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q4_0)

    cfg1, p1, r1 = load_model(path, mode="quant")
    r1.close()
    # dir name carries a hash of the model's absolute path (two models
    # with the same basename must not share a cache dir)
    dirs = list((tmp_path / "lc").glob("m.gguf.*.lcache"))
    assert len(dirs) == 1
    manifest = dirs[0] / "manifest.json"
    assert manifest.exists()
    m = json.loads(manifest.read_text())
    assert m["tensors"], "cache must be populated on first load"

    # second load: served from the cache, bit-identical params
    cfg2, p2, r2 = load_model(path, mode="quant")
    r2.close()
    assert _params_equal(p1, p2)


def test_stale_fingerprint_invalidates(tmp_path, monkeypatch):
    monkeypatch.delenv("LGT_LAYOUT_CACHE", raising=False)
    monkeypatch.setenv("LGT_LAYOUT_CACHE_DIR", str(tmp_path / "lc"))
    path = tmp_path / "m.gguf"
    write_tiny_llama(path, dim=64, n_layers=1, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q4_0)
    _, p1, r = load_model(path, mode="quant")
    r.close()

    # rewrite the model with different weights -> fingerprint changes
    write_tiny_llama(path, dim=64, n_layers=1, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q4_0, seed=99)
    cache = LayoutCache.open(path)
    assert cache is not None
    assert cache.tensors == {}, "stale cache must not be trusted"
    _, p2, r = load_model(path, mode="quant")
    r.close()
    assert not _params_equal(p1, p2)


def test_disable_via_env(tmp_path, monkeypatch):
    monkeypatch.setenv("LGT_LAYOUT_CACHE", "0")
    path = tmp_path / "m.gguf"
    write_tiny_llama(path, dim=64, n_layers=1, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q4_0)
    assert LayoutCache.open(path) is None
    _, p, r = load_model(path, mode="quant")
    r.close()
    assert not (tmp_path / "m.gguf.lcache" / "manifest.json").exists()


def test_partial_cache_rebuilds(tmp_path, monkeypatch):
    """A crash mid-population leaves no manifest -> next boot rebuilds."""
    monkeypatch.delenv("LGT_LAYOUT_CACHE", raising=False)
    monkeypatch.setenv("LGT_LAYOUT_CACHE_DIR", str(tmp_path / "lc"))
    path = tmp_path / "m.gguf"
    write_tiny_llama(path, dim=64, n_layers=1, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q4_0)
    cache = LayoutCache.open(path)
    from llama_gguf_inference_tpu.quant import quantize
    from llama_gguf_inference_tpu.quant.repack import repack
    raw = quantize(np.random.default_rng(0).standard_normal(
        (32, 256)).astype(np.float32), GGMLType.Q4_K)
    cache.put("t", repack(raw, GGMLType.Q4_K, 32, 256))
    # no finalize() — simulates a crash; a fresh open sees nothing
    fresh = LayoutCache.open(path)
    assert fresh.get("t") is None


def test_same_basename_different_dirs_get_separate_caches(tmp_path, monkeypatch):
    """Round-2 review finding #5: with LGT_LAYOUT_CACHE_DIR set, two
    models both named m.gguf must not clobber each other's cache."""
    monkeypatch.delenv("LGT_LAYOUT_CACHE", raising=False)
    monkeypatch.setenv("LGT_LAYOUT_CACHE_DIR", str(tmp_path / "lc"))
    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        write_tiny_llama(d / "m.gguf", dim=64, n_layers=1, n_heads=4,
                         n_kv_heads=2, ffn_dim=96, quant=GGMLType.Q4_0)
        _, _, r = load_model(d / "m.gguf", mode="quant")
        r.close()
    dirs = list((tmp_path / "lc").glob("m.gguf.*.lcache"))
    assert len(dirs) == 2
    # both caches valid: reload each and confirm manifests persist
    for sub in ("a", "b"):
        _, _, r = load_model(tmp_path / sub / "m.gguf", mode="quant")
        r.close()
    assert len(list((tmp_path / "lc").glob("m.gguf.*.lcache"))) == 2
