"""Embedding-model engine: BERT-family encoder GGUFs behind the same
serving surface as the decoder engine.

llama-server runs embedding models (nomic-embed-text and friends) with
``--embedding``: /v1/embeddings and /rerank work, text completion returns
an error.  The reference reaches that mode through ``EXTRA_ARGS``
(reference ``scripts/start.sh:490-494``) and proxies the endpoints
verbatim (``scripts/gateway.py:807``).  This engine mirrors the behavior:
``embed()`` is the real path, ``submit()`` yields a single terminal
``finish_reason="error"`` event the backend surfaces exactly like a
mid-stream engine failure.

TPU shape: one jitted forward per padded bucket — a request is ONE
dispatch (encoder_forward pools + L2-normalizes in-graph).
"""

from __future__ import annotations

import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..models.encoder import encoder_forward
from . import tokenizer as tokenizer_mod
from .engine import GenEvent
from .loader import load_encoder


class EncoderEngine:
    """submit/stream surface parity with InferenceEngine (embedding-only)."""

    def __init__(self, model_path: str, buckets: tuple[int, ...] = (64, 512),
                 mode: str = "quant"):
        cfg, params, reader = load_encoder(model_path, mode=mode)
        self.cfg = cfg
        self.params = params
        self.metadata = dict(reader.metadata)
        reader.close()
        self.model_name = str(self.metadata.get("general.name", "model"))
        self.tokenizer = tokenizer_mod.from_gguf_metadata(self.metadata)
        self.buckets = tuple(sorted(min(b, cfg.max_positions)
                                    for b in buckets))
        self.total_prompt_tokens = 0
        self.total_generated = 0
        self._lock = threading.Lock()
        # ecfg shim for handlers that read slot/ctx limits
        self.ecfg = type("E", (), {"max_slots": 1,
                                   "ctx": cfg.max_positions})()

        fwd = jax.jit(encoder_forward, static_argnums=(1,))
        self._fwd = fwd

    # ------------------------------------------------------------ lifecycle
    def start(self) -> None:
        pass

    def stop(self) -> None:
        pass

    def n_active(self) -> int:
        return 0

    def queue_depth(self) -> int:
        return 0

    # ------------------------------------------------------------- requests
    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def embed(self, prompt: str | list[int]) -> tuple[list[float], int]:
        ids = (self.tokenizer.encode(prompt) if isinstance(prompt, str)
               else list(prompt))
        if len(ids) > self.buckets[-1]:
            # truncate CONTENT and keep the [CLS] ... [SEP] frame —
            # HF/llama.cpp clip the same way; chopping the trailing [SEP]
            # off instead drifts the embedding slightly
            sep = self.tokenizer.special.eos_id
            ids = ids[: self.buckets[-1]]
            if sep >= 0:
                ids[-1] = sep
        T = self._bucket(len(ids))
        tok = np.zeros((1, T), np.int32)
        tok[0, : len(ids)] = ids
        vec = self._fwd(self.params, self.cfg, jnp.asarray(tok),
                        jnp.asarray([len(ids)], jnp.int32))
        with self._lock:
            self.total_prompt_tokens += len(ids)
        return [float(x) for x in np.asarray(vec)[0]], len(ids)

    def submit(self, prompt, params, request_id=None):
        """Text generation on an encoder: one terminal error event, the
        same shape InferenceEngine._fail_all produces (backend -> 500-class
        contract error; llama-server --embedding behaves equivalently)."""
        rid = request_id or "encoder-req"
        out: "queue.Queue[GenEvent]" = queue.Queue()
        out.put(GenEvent(finished=True, finish_reason="error",
                         text=f"model {self.model_name!r} is an "
                              "embedding-only encoder (no text generation)"))
        return rid, out

    def cancel(self, request_id: str) -> bool:
        return False

    def stats(self) -> dict:
        return {
            "model": self.model_name,
            "mode": "embedding",
            "slots_total": 0,
            "slots_active": 0,
            "queue_depth": 0,
            "ctx": self.cfg.max_positions,
            "total_generated": 0,
            "total_prompt_tokens": self.total_prompt_tokens,
        }
