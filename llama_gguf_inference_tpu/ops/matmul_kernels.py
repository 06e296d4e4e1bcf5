"""Fused dequant+matmul dispatch.

``quant_matmul(w, x)`` computes ``x @ dequant(w).T``:

- on TPU: Pallas kernels that stream packed codes HBM->VMEM, unpack with
  shift/mask on the VPU, and feed bf16 tiles to the MXU (decode throughput is
  HBM-bandwidth-bound, so weights never materialize at bf16 width in HBM);
- elsewhere (CPU tests, interpret mode): the XLA fallback
  ``QuantLinear.matmul_xla`` which dequantizes per call (fusion keeps this
  adequate for correctness tiers).

Replaces llama.cpp's per-quant CUDA mul_mat kernels, which the reference uses
via the llama-server binary (SURVEY.md §2.9).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax


@lru_cache(maxsize=1)
def _on_tpu() -> bool:
    if os.environ.get("LGT_FORCE_XLA_MATMUL"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def quant_matmul(w, x: jax.Array, out_dtype=None) -> jax.Array:
    """x: (..., in) -> (..., out) against a QuantLinear weight."""
    if _on_tpu():
        from .pallas_matmul import pallas_quant_matmul
        return pallas_quant_matmul(w, x, out_dtype)
    return w.matmul_xla(x, out_dtype)
