"""GGUF LoRA adapters (llama-server ``--lora`` / ``--lora-scaled`` parity).

The reference forwards adapter flags to llama-server through EXTRA_ARGS
(reference ``scripts/start.sh:490-494``); llama.cpp applies each adapter at
graph-build time as ``y = W x + scale * B (A x)`` with
``scale = user_scale * alpha / rank``.  This module does the TPU-native
equivalent: it parses the adapter GGUF (written by llama.cpp's
``convert_lora_to_gguf.py``: ``general.type = "adapter"``,
``adapter.type = "lora"``, ``adapter.lora.alpha``, and per-tensor
``<base>.lora_a`` (r, in) / ``<base>.lora_b`` (out, r) pairs) and wraps the
matching loaded weights in :class:`ops.linear.LoraLinear` — the quantized
base stays resident (Pallas kernel path untouched) and the rank-r deltas
ride XLA.

Applied by ``runtime.loader.load_params`` BEFORE QKV/gate-up fusion (fusion
skips wrapped weights) and before MLA absorption.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..utils import logging as log

_A, _B = ".lora_a", ".lora_b"


def load_adapter(path: str, arch: str = "",
                 ) -> tuple[float, dict[str, tuple[Any, Any]]]:
    """Returns (alpha, {base_tensor_name: (A (r, in), B (out, r))}).

    ``arch``, when given, must match the adapter's ``general.architecture``
    — llama.cpp refuses mismatched adapters, and applying one here would
    silently corrupt any same-named tensors."""
    r = GGUFReader(path)
    try:
        md = r.metadata
        if str(md.get("general.type", "")) != "adapter" \
                or str(md.get("adapter.type", "")) != "lora":
            raise ValueError(
                f"{path} is not a GGUF LoRA adapter "
                "(expected general.type=adapter, adapter.type=lora)")
        ad_arch = str(md.get("general.architecture", ""))
        if arch and ad_arch and ad_arch != arch:
            raise ValueError(
                f"adapter {path} was trained for architecture "
                f"'{ad_arch}', base model is '{arch}'")
        alpha = float(md.get("adapter.lora.alpha", 0.0))
        pairs: dict[str, tuple[Any, Any]] = {}
        for name in r.tensors:
            if not name.endswith(_A):
                continue
            base = name[: -len(_A)]
            if base + _B not in r.tensors:
                raise ValueError(f"adapter tensor {name} has no {base}{_B}")
            pairs[base] = (r.tensor_f32(name), r.tensor_f32(base + _B))
        return alpha, pairs
    finally:
        r.close()


def _resolve(params: dict, base_name: str):
    """GGUF tensor name -> (container, key) holding the LinearWeight."""
    if not base_name.endswith(".weight"):
        return None, None
    stem = base_name[: -len(".weight")]
    if stem == "output":
        return params, "output"
    if stem.startswith("blk."):
        parts = stem.split(".", 2)          # ["blk", "<i>", "<key>"]
        if len(parts) == 3 and parts[1].isdigit():
            i = int(parts[1])
            if i < len(params["layers"]):
                layer = params["layers"][i]
                key = parts[2].replace(".", "_")
                if key in layer:
                    return layer, key
    return None, None


def apply_lora(params: dict, path: str, scale: float = 1.0,
               arch: str = "") -> int:
    """Wrap matching weights in LoraLinear in place; returns count applied.

    Unmatched adapter tensors (token embeddings — gathered, not matmul'd —
    or tensors the architecture absorbed/renamed) are skipped with a
    warning, mirroring llama.cpp's per-tensor tolerance.
    """
    from ..ops.linear import DenseLinear, LoraLinear, QuantLinear

    alpha, pairs = load_adapter(path, arch=arch)
    applied = 0
    for base_name, (a, b) in sorted(pairs.items()):
        container, key = _resolve(params, base_name)
        tgt = container[key] if container is not None else None
        if not isinstance(tgt, (DenseLinear, QuantLinear)):
            log.warning(f"lora: skipping {base_name} (no matching linear "
                        "weight)", component="lora")
            continue
        rank = int(a.shape[0])
        if (a.shape[1] != tgt.in_features or b.shape[0] != tgt.out_features
                or b.shape[1] != rank):
            raise ValueError(
                f"lora shape mismatch on {base_name}: A{tuple(a.shape)} "
                f"B{tuple(b.shape)} vs weight ({tgt.out_features}, "
                f"{tgt.in_features})")
        s = scale * (alpha / rank if alpha > 0 else 1.0)
        container[key] = LoraLinear(
            base=tgt, a=jnp.asarray(a, jnp.bfloat16),
            b=jnp.asarray(b, jnp.bfloat16), scale=float(s))
        applied += 1
    log.info(f"lora: applied {applied}/{len(pairs)} adapter tensors from "
             f"{path} (alpha={alpha:g}, scale={scale:g})", component="lora")
    return applied
