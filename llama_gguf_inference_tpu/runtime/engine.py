"""The inference engine: slots, continuous batching, streaming.

TPU-native replacement for llama.cpp's ``llama-server`` slot scheduler (the
reference's only concurrency is a gateway-side semaphore queue feeding the
backend, SURVEY.md §2.13; llama-server itself continuous-batches across
"slots").  Design:

- ``max_slots`` sequences share one static-shape decode batch; one jitted
  decode step per iteration advances every active slot (inactive slots are
  masked — they run on pad tokens and their outputs are ignored)
- prompt prefill runs per-slot through bucketed-length jitted chunks writing
  straight into that slot's KV cache slice (no cross-slot FLOP waste)
- sampling state lives on device (SampleState); stop-string / EOG checks and
  detokenization happen host-side, overlapped with the next device step
- the engine is transport-agnostic: the serving gateway talks to it through
  ``submit()`` + per-request output queues (thread-safe), mirroring how the
  reference gateway proxies to the backend over localhost TCP
  (gateway.py:836-841) but in-process
"""

from __future__ import annotations

import dataclasses
import os
import queue
import sys
import threading
import time
import uuid
from functools import partial
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import KVCache, forward
from .loader import load_model
from .sampler import (SampleState, SamplingParams, bias_row, sample,
                      set_bias_row, write_slot_device)
from .tokenizer import Tokenizer, from_gguf_metadata

# LGT_ENGINE_TRACE=1: per-phase wall-clock trace of the scheduler loop to
# stderr (admission, prefill chunks, dispatch/drain).  Diagnostic only — the
# decode hot path pays one branch per phase when disabled.
_TRACE = os.environ.get("LGT_ENGINE_TRACE", "") not in ("", "0")


def _tr(tag: str) -> None:
    if _TRACE:
        print(f"[engtrace {time.monotonic():.4f}] {tag}",
              file=sys.stderr, flush=True)


@dataclasses.dataclass
class EngineConfig:
    max_slots: int = 4
    ctx: int = 2048                    # per-slot KV capacity (reference CTX env)
    prefill_buckets: tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024)
    kv_dtype: Any = jnp.bfloat16       # jnp dtype, or "q8_0"/"q4_0"/"q4_1" quant KV
    mode: str = "quant"                # weight residency: "quant" | "dense"
    multi_step: int = 1                # decode steps fused per dispatch (1 = off)
    tp: int = 1                        # tensor-parallel mesh axis
    dp: int = 1                        # data-parallel mesh axis
    # "contig": each slot owns a fixed ctx-token region (fastest decode).
    # "paged": slots share a page pool (ctx * max_slots tokens total) via
    # per-slot page tables — one request can use far more than ctx when
    # other slots are idle (llama.cpp unified-KV semantics; SURVEY §7.4).
    kv_layout: str = "contig"
    kv_page_size: int = 1024           # paged: tokens per physical page
    # llama-server-style slot prompt caching: freed slots keep their KV;
    # admission picks the free slot with the longest common prompt prefix
    # and prefills only the suffix (big TTFT win for shared system
    # prompts).  Contig layout only — paged returns pages to the pool.
    prefix_cache: bool = True
    # speculative decoding (llama-server --model-draft; runtime.speculative):
    # a small same-vocab draft GGUF proposes spec_tokens greedy tokens per
    # round, the target verifies them in one K+1-token chunk.  Engaged
    # per-dispatch when every active slot samples pure greedy.  Contig KV
    # only; the draft shards over the engine mesh like the target
    # (tests/test_speculative.py pins tp/dp token parity).
    draft_model: str = ""
    spec_tokens: int = 5
    # draft-free speculation (llama.cpp "lookup decoding"): propose the
    # continuation after the most recent historical occurrence of the
    # current bigram — zero extra weight traffic, strong on repetitive
    # output.  Ignored when draft_model is set.
    spec_ngram: bool = False
    # context shift (llama-server --ctx-shift): when a slot's KV region
    # fills mid-generation, keep the first n_keep positions, discard half
    # of the rest, roll the remainder left and re-rope cached K by the
    # position delta — generation continues instead of finishing "length".
    # Contiguous KV only (bf16 exact; q8_0/q4_0/q4_1 requantize the moved
    # K window), plain decode (no MLA / SWA / longrope / speculation);
    # default off, like current llama-server.
    ctx_shift: bool = False
    # adaptive gating: speculation is a net LOSS below some acceptance
    # rate (each round pays a K+1-position verify + per-dispatch overhead
    # for 1+accepted tokens; measured 62 vs 106 tok/s at 5% acceptance on
    # the 8B bench shape).  Below this EWMA the dispatch falls back to
    # plain decode, re-probing speculation every spec_probe_every
    # dispatches in case the content regime changed.  0 disables gating.
    spec_min_accept: float = 0.2
    spec_probe_every: int = 16
    # GGUF LoRA adapter (llama-server --lora / --lora-scaled; runtime.lora):
    # applied to the target model's weights at load time as low-rank
    # LoraLinear wrappers (quantized base stays resident).
    lora_path: str = ""
    lora_scale: float = 1.0


@dataclasses.dataclass
class GenEvent:
    """One streamed token (or terminal event) for a request."""

    token_id: int = -1
    text: str = ""
    finished: bool = False
    finish_reason: str | None = None   # "stop" | "length"
    n_prompt: int = 0
    n_generated: int = 0
    logprob: float | None = None
    top_logprobs: list[tuple[int, float]] | None = None


@dataclasses.dataclass
class _Slot:
    state: str = "free"                # free | prefill | active
    request_id: str = ""
    prompt_ids: list[int] = dataclasses.field(default_factory=list)
    generated: list[int] = dataclasses.field(default_factory=list)
    params: SamplingParams = dataclasses.field(default_factory=SamplingParams)
    out: "queue.Queue[GenEvent]" = dataclasses.field(default_factory=queue.Queue)
    text_buf: str = ""                 # emitted text (for stop-string scanning)
    pending_text: str = ""             # held back: possible stop-string prefix
    utf8_buf: bytes = b""              # held back: incomplete UTF-8 sequence
    started: float = 0.0
    offset: int = 0                    # tokens currently in this slot's cache
    cached_ids: list[int] = dataclasses.field(default_factory=list)
    """Tokens whose KV verifiably sit at positions [0, len) of this slot's
    region — kept across release for prompt-prefix reuse."""
    hist_upto: int = 0                 # ngram: device history valid [0, n)
    draft_upto: int = 0                # draft spec: draft KV valid [0, n)
    matcher: Any = None                # grammar.GrammarMatcher (constrained)
    static_bias: Any = None            # np (V,) logit_bias row under grammar
    mask_dirty: bool = False           # matcher advanced; device row stale


_HIST_PAD = 2048       # ngram history slack: sync chunk + in-scan writes
_HIST_CHUNK = 1024     # host->device history sync granularity (each chunk
#                        costs a full dispatch round trip on remote relays)

# multi-host lockstep broadcast capacities (fixed-shape command fields,
# parallel.multihost._Broadcaster): requests exceeding these fail with a
# per-request error instead of poisoning the follower replay
MH_GRAMMAR_CAP = 16384   # GBNF bytes per request
MH_LB_CAP = 256          # logit_bias entries per request


def _utf8_split(buf: bytes, flush: bool = False) -> tuple[str, bytes]:
    """Split ``buf`` into (decodable prefix, held-back incomplete suffix).

    An incomplete trailing multi-byte sequence (up to 3 bytes) is held back;
    invalid bytes or ``flush`` force replacement-decoding of everything.
    """
    if not buf:
        return "", b""
    if flush:
        return buf.decode("utf-8", errors="replace"), b""
    for cut in range(len(buf), max(len(buf) - 4, -1), -1):
        try:
            return buf[:cut].decode("utf-8"), buf[cut:]
        except UnicodeDecodeError:
            continue
    # >=4 trailing undecodable bytes: not a partial sequence, emit replacements
    return buf.decode("utf-8", errors="replace"), b""


class InferenceEngine:
    """Owns model weights, KV pool, jitted step functions, scheduler thread."""

    TOP_LOGPROBS_K = 8   # top-k logprobs computed per step (OpenAI `logprobs`)

    def __init__(self, model_path: str, engine_cfg: EngineConfig | None = None):
        from ..utils.platform import enable_compile_cache
        enable_compile_cache()   # warm boots skip the minutes of Mosaic compiles
        self.ecfg = engine_cfg or EngineConfig()
        sharded = self.ecfg.tp * self.ecfg.dp > 1
        # config validation BEFORE any global state mutates: a raise after
        # set_mesh would poison the module-global flash mesh for every
        # later engine in the process (review finding, reproduced)
        if self.ecfg.kv_layout not in ("contig", "paged"):
            raise ValueError(f"unknown kv_layout {self.ecfg.kv_layout!r} "
                             "(expected 'contig' or 'paged')")
        quantized_kv = self.ecfg.kv_dtype in ("q8_0", "q4_0", "q4_1")
        if self.ecfg.kv_layout == "paged":
            if self.ecfg.kv_dtype in ("q4_0", "q4_1"):
                raise ValueError("kv_layout='paged' supports bf16 and q8_0 "
                                 "KV (4-bit paged pools are not built)")
            if sharded and self.ecfg.dp > 1:
                raise ValueError("kv_layout='paged' shards over tp only: "
                                 "the page pool is shared by every slot, so "
                                 "a dp batch axis cannot partition it")
            # multi-host: the leader's host-side page table rides the
            # command broadcast (parallel.multihost packs it into every
            # ADMIT/DECODE tick), so followers mirror it before each replay
        if (self.ecfg.draft_model or self.ecfg.spec_ngram) \
                and self.ecfg.kv_layout != "contig":
            raise ValueError("speculative decoding requires "
                             "kv_layout='contig'")
        if self.ecfg.ctx_shift:
            if self.ecfg.kv_layout != "contig":
                raise ValueError("ctx_shift requires the contiguous KV "
                                 "layout (cached K is re-roped in place)")
            if self.ecfg.draft_model or self.ecfg.spec_ngram:
                raise ValueError("ctx_shift does not combine with "
                                 "speculative decoding yet")
        cfg, params, reader = load_model(model_path, mode=self.ecfg.mode,
                                         fuse=not sharded,
                                         lora_path=self.ecfg.lora_path,
                                         lora_scale=self.ecfg.lora_scale)
        self.cfg = cfg
        if cfg.is_mla and (self.ecfg.kv_layout != "contig"
                           or quantized_kv):
            raise ValueError("deepseek2 (MLA) supports the contiguous bf16 "
                             "KV layout only (k/v head dims differ)")
        if self.ecfg.ctx_shift and (cfg.is_mla or cfg.sliding_window > 0
                                    or cfg.rope_scaling_type == "longrope"):
            raise ValueError("ctx_shift supports full-attention rope models "
                             "only (no MLA / sliding-window / longrope)")
        self.mesh = None
        from ..ops.flash_attention import set_mesh
        if sharded:
            from ..parallel.mesh import make_mesh
            from ..parallel.partition import shard_params
            self.mesh = make_mesh(tp=self.ecfg.tp, dp=self.ecfg.dp)
            params = shard_params(params, cfg, self.mesh)
            # flash kernels run shard_map'd over local head/batch shards
            set_mesh(self.mesh)
        else:
            set_mesh(None)   # clear any stale mesh a prior engine left
        self.params = params
        self.metadata = dict(reader.metadata)
        self.tokenizer: Tokenizer = from_gguf_metadata(reader.metadata)
        self.model_name = str(self.metadata.get("general.name", "model"))
        reader.close()

        B, S = self.ecfg.max_slots, self.ecfg.ctx
        self.alloc = None
        if self.ecfg.kv_layout == "paged":
            from .paged_kv import PagedKV, PagedQuantKV, PageAllocator
            page_s = self.ecfg.kv_page_size
            pool_pages = max(1, (B * S) // page_s)   # same HBM as contig
            if self.ecfg.kv_dtype == "q8_0":
                self.cache = PagedQuantKV.zeros(cfg, B, pool_pages, page_s)
            else:
                self.cache = PagedKV.zeros(cfg, B, pool_pages, page_s,
                                           dtype=self.ecfg.kv_dtype)
            self.alloc = PageAllocator(pool_pages, B)
        elif self.ecfg.kv_dtype == "q8_0":
            from .kv_cache import QuantKV
            self.cache = QuantKV.zeros(cfg, B, S)
        elif self.ecfg.kv_dtype == "q4_0":
            from .kv_cache import QuantKV4
            self.cache = QuantKV4.zeros(cfg, B, S)
        elif self.ecfg.kv_dtype == "q4_1":
            from .kv_cache import QuantKV41
            self.cache = QuantKV41.zeros(cfg, B, S)
        else:
            self.cache = KVCache.zeros(cfg, B, S, dtype=self.ecfg.kv_dtype)
        if self.mesh is not None:
            from ..parallel.partition import shard_cache
            self.cache = shard_cache(self.cache, self.mesh,
                                     cfg.cache_kv_heads, B)
        # speculative decoding: draft-model or n-gram-lookup proposals
        self.draft_params = None
        self.draft_cfg = None
        self.draft_cache = None
        self.hist = None               # (B, S+pad) token history (ngram mode)
        self.spec_mode = ""
        self.spec_rounds = 0
        self.spec_drafted = 0          # draft tokens proposed (host-observed)
        self.spec_accepted = 0         # draft tokens accepted
        self.spec_ewma = 1.0           # acceptance EWMA (starts optimistic)
        self._spec_tick = 0            # dispatches since spec was gated off
        if self.ecfg.draft_model or self.ecfg.spec_ngram:
            # (layout validated up top, before global state mutates)
            # per-dispatch token budget comparable to multi_step fusion
            self.spec_rounds = max(1, self.ecfg.multi_step
                                   // (self.ecfg.spec_tokens + 1))
        if self.ecfg.draft_model:
            dcfg, dparams, dreader = load_model(self.ecfg.draft_model,
                                                mode=self.ecfg.mode,
                                                fuse=self.mesh is None)
            if dcfg.vocab_size != cfg.vocab_size:
                raise ValueError(
                    f"draft vocab {dcfg.vocab_size} != target {cfg.vocab_size}"
                    " (speculative decoding needs a shared vocabulary)")
            dreader.close()
            self.draft_cfg = dcfg
            self.draft_cache = KVCache.zeros(dcfg, B, S)
            if self.mesh is not None:   # draft shards like the target
                from ..parallel.partition import shard_cache, shard_params
                dparams = shard_params(dparams, dcfg, self.mesh)
                self.draft_cache = shard_cache(self.draft_cache, self.mesh,
                                               dcfg.cache_kv_heads, B)
            self.draft_params = dparams
            self.spec_mode = "draft"
        elif self.ecfg.spec_ngram:
            # padded past capacity so in-scan + sync writes never hit the
            # dynamic-update-slice clamp (which would shift the write)
            self.hist = jnp.zeros((B, S + _HIST_PAD), jnp.int32)
            if self.mesh is not None:   # replicate: device-check parity
                from ..parallel.mesh import replicated
                self.hist = jax.device_put(self.hist, replicated(self.mesh))
            self.spec_mode = "ngram"
        self.sample_state = SampleState.init(B, cfg.vocab_size)
        self.slots = [_Slot() for _ in range(B)]
        self._queue: "queue.Queue[tuple[str, list[int], SamplingParams, queue.Queue]]" = queue.Queue()
        self._waiting: list = []       # paged: head-of-line requests awaiting pages
        self._cancelled: set[str] = set()
        self._lock = threading.Lock()
        self._stop_evt = threading.Event()
        self._thread: threading.Thread | None = None
        self._last_decode_s = 0.0      # EWMA of decode step wall time
        self._pending = None           # in-flight decode dispatch (pipelining)
        self.total_generated = 0
        self.total_prompt_tokens = 0
        self.total_prefix_reused = 0   # prompt tokens skipped via slot reuse
        self.total_ctx_shifts = 0      # context-shift events (ctx_shift)
        self._shift_fn = None          # lazily jitted shift_cache_slot
        # multi-host lockstep hooks (parallel.multihost.MultiHostEngine):
        # fire on host 0 right before the matching device op so followers
        # can replay the identical call sequence
        self._admit_hook = None        # (b, ids, params) -> None
        self._gflush_pending: list[int] = []   # grammar slots flushed
        #                                        before the pending dispatch
        self._decode_hook = None       # (tokens, offsets, n_steps, want_lp)
        self._tick_hook = None         # (worked: bool) -> bool
        # slot save/restore admin ops (llama-server --slot-save-path):
        # executed on the scheduler thread between dispatches — cache
        # mutation from another thread would race the decode loop's
        # functional self.cache updates
        self._slot_ops: "queue.Queue[tuple[str, int, str, queue.Queue]]" = \
            queue.Queue()

        self._build_step_fns()

    # ------------------------------------------------------------------ jit
    def _build_step_fns(self) -> None:
        cfg = self.cfg

        @partial(jax.jit, donate_argnums=(1,))
        def decode_step(params, cache: KVCache, tokens, offsets, st: SampleState):
            # tokens (B, 1); offsets (B,).  No log-softmax here: per-token
            # logprobs live only in the _lp variants — the default hot path
            # must not pay a (B, V) softmax pass per step it never reads.
            logits, cache = forward(params, cfg, tokens, offsets, cache,
                                    jnp.ones(tokens.shape[0], jnp.int32))
            tok, st = sample(logits[:, 0, :], st)
            return tok, st, cache

        self._decode_step = decode_step

        # multi-step decode: N forward+sample steps fused into ONE dispatch
        # via lax.scan — sampling feedback stays on-device, host sees a
        # (N, B) token batch.  Amortizes per-dispatch latency (hundreds of
        # microseconds through a remote TPU runtime) across N tokens.
        def make_multi(n_steps: int):
            @partial(jax.jit, donate_argnums=(1,))
            def decode_multi(params, cache: KVCache, tokens, offsets,
                             st: SampleState):
                def body(carry, _):
                    cache, tok, off, st = carry
                    logits, cache = forward(params, cfg, tok, off, cache,
                                            jnp.ones(tok.shape[0], jnp.int32))
                    nxt, st = sample(logits[:, 0, :], st)
                    return (cache, nxt[:, None], off + 1, st), nxt

                (cache, next_tok, next_off, st), toks = jax.lax.scan(
                    body, (cache, tokens, offsets, st), None, length=n_steps)
                # next_tok (B, 1) / next_off (B,) are the continuation's
                # inputs — returned on-device so the pipelined dispatch needs
                # NO host-side ops or transfers on the in-flight result (an
                # eager slice here costs a remote compile + dispatch round
                # trip; a numpy offsets re-upload costs a relay transfer)
                return toks, st, cache, next_tok, next_off
            return decode_multi

        self._decode_multi_fns: dict[int, Any] = {}
        self._make_multi = make_multi

        # logprobs variants: SEPARATE builders so the default path's graphs
        # stay untouched (empirically, sharing a parametrized builder cost
        # ~25% decode throughput even with byte-identical jaxprs for the
        # default variant — do not unify without paired benches)
        K = self.TOP_LOGPROBS_K

        @partial(jax.jit, donate_argnums=(1,))
        def decode_step_lp(params, cache: KVCache, tokens, offsets,
                           st: SampleState):
            logits, cache = forward(params, cfg, tokens, offsets, cache,
                                    jnp.ones(tokens.shape[0], jnp.int32))
            last = logits[:, 0, :]
            tok, st = sample(last, st)
            lp = jax.nn.log_softmax(last, axis=-1)
            tok_lp = jnp.take_along_axis(lp, tok[:, None], axis=-1)[:, 0]
            top_v, top_i = jax.lax.top_k(lp, K)
            return tok, st, cache, tok_lp, top_v, top_i

        self._decode_step_lp = decode_step_lp

        def make_multi_lp(n_steps: int):
            @partial(jax.jit, donate_argnums=(1,))
            def decode_multi_lp(params, cache: KVCache, tokens, offsets,
                                st: SampleState):
                def body(carry, _):
                    cache, tok, off, st = carry
                    logits, cache = forward(params, cfg, tok, off, cache,
                                            jnp.ones(tok.shape[0], jnp.int32))
                    last = logits[:, 0, :]
                    nxt, st = sample(last, st)
                    lp = jax.nn.log_softmax(last, axis=-1)
                    tok_lp = jnp.take_along_axis(lp, nxt[:, None], axis=-1)[:, 0]
                    top_v, top_i = jax.lax.top_k(lp, K)
                    return (cache, nxt[:, None], off + 1, st), \
                        (nxt, tok_lp, top_v, top_i)

                (cache, next_tok, next_off, st), (toks, lps, tv, ti) = \
                    jax.lax.scan(
                        body, (cache, tokens, offsets, st), None,
                        length=n_steps)
                return toks, st, cache, lps, tv, ti, next_tok, next_off
            return decode_multi_lp

        self._make_multi_lp = make_multi_lp

        # admission-tail sampling body: broadcast one slot's logits over
        # the batched sampler and merge only slot b's state mutation —
        # fused INTO the final prefill chunk's graph (see make_prefill)
        B_slots = self.ecfg.max_slots

        def admit_sample_body(logits_row, st: SampleState, b):
            logits = jnp.broadcast_to(logits_row[None, :],
                                      (B_slots, logits_row.shape[0]))
            tok, st2 = sample(logits, st)
            merged = st._replace(
                counts=st.counts.at[b].set(st2.counts[b]),
                step=st.step.at[b].set(st2.step[b]),
                miro_mu=st.miro_mu.at[b].set(st2.miro_mu[b]),
            )
            return tok[b], merged

        # Per-bucket prefill DIRECTLY on the donated pool with a traced
        # slot index: slot slice-out, forward, slice-back (and, for the
        # final chunk, first-token sampling) all land in ONE dispatch —
        # the previous slice / chunk / writeback / sample chain cost a
        # ~30 ms relay round trip per stage of admission latency.
        # Paged pools skip the slice: writes scatter through the slot's
        # page-table row.
        paged = self.alloc is not None

        def slot_view(pool, b):
            if paged:
                # pool pages are shared; only the table row is per-slot
                # (works for PagedKV and PagedQuantKV alike)
                return pool._replace(page_table=jax.lax.dynamic_slice_in_dim(
                    pool.page_table, b, 1, axis=0))
            return jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, b, 1, axis=0),
                pool)

        def slot_merge(pool, view, b):
            if paged:
                return view._replace(page_table=pool.page_table)
            return jax.tree_util.tree_map(
                lambda p, s: jax.lax.dynamic_update_slice_in_dim(
                    p, s.astype(p.dtype), b, axis=0), pool, view)

        def make_prefill(T: int, fuse_sample: bool):
            @partial(jax.jit, donate_argnums=(1,))
            def prefill(params, pool, b, tokens, offset, length, st):
                view = slot_view(pool, b)
                logits, view = forward(params, cfg, tokens, offset[None],
                                       view, length[None])
                pool = slot_merge(pool, view, b)
                idx = jnp.maximum(length - 1, 0)
                row = logits[0, idx, :]
                if not fuse_sample:
                    return row, pool
                tok, st = admit_sample_body(row, st, b)
                return tok, row, st, pool
            return prefill

        # non-final chunks are always the LARGEST bucket (the chunk loop
        # takes full-size bites until the remainder), so only it needs the
        # plain variant
        self._prefill_fns = {self.ecfg.prefill_buckets[-1]:
                             make_prefill(self.ecfg.prefill_buckets[-1],
                                          fuse_sample=False)}
        self._prefill_sample_fns = {T: make_prefill(T, fuse_sample=True)
                                    for T in self.ecfg.prefill_buckets}

        # speculative decoding: draft-cache prefill (no sampling) + the
        # fused draft/verify rounds (runtime.speculative)
        if self.draft_params is not None:
            dcfg = self.draft_cfg

            def make_draft_prefill(T: int):
                @partial(jax.jit, donate_argnums=(1,))
                def dprefill(params, pool, b, tokens, offset, length):
                    view = jax.tree_util.tree_map(
                        lambda a: jax.lax.dynamic_slice_in_dim(a, b, 1, axis=0),
                        pool)
                    _, view = forward(params, dcfg, tokens, offset[None],
                                      view, length[None])
                    return jax.tree_util.tree_map(
                        lambda p, s: jax.lax.dynamic_update_slice_in_dim(
                            p, s.astype(p.dtype), b, axis=0), pool, view)
                return dprefill

            self._draft_prefill_fns = {T: make_draft_prefill(T)
                                       for T in self.ecfg.prefill_buckets}
            from .speculative import make_spec_decode
            self._spec_fn = make_spec_decode(cfg, dcfg, forward,
                                             self.ecfg.spec_tokens,
                                             self.spec_rounds)
        elif self.spec_mode == "ngram":
            from .speculative import make_ngram_spec
            self._spec_fn = make_ngram_spec(cfg, forward,
                                            self.ecfg.spec_tokens,
                                            self.spec_rounds)

            @partial(jax.jit, donate_argnums=(0,))
            def hist_write(hist, b, start, chunk):
                return jax.lax.dynamic_update_slice(hist, chunk[None, :],
                                                    (b, start))

            self._hist_write = hist_write

        # mean-pooled embedding over valid positions (for /v1/embeddings)
        def make_embed(T: int):
            @jax.jit
            def embed(params, tokens, length):
                cache = KVCache.zeros(cfg, 1, T)
                _, _, hidden = forward(params, cfg, tokens,
                                       jnp.zeros(1, jnp.int32), cache,
                                       length[None], return_hidden=True)
                mask = (jnp.arange(T) < length)[None, :, None]
                pooled = jnp.sum(jnp.where(mask, hidden.astype(jnp.float32), 0.0),
                                 axis=1) / jnp.maximum(length, 1)
                return pooled[0]
            return embed

        self._embed_fns = {T: make_embed(T) for T in self.ecfg.prefill_buckets}

    # ------------------------------------------------------------- requests
    def submit(self, prompt: str | list[int], params: SamplingParams,
               request_id: str | None = None) -> tuple[str, "queue.Queue[GenEvent]"]:
        """Enqueue a request; returns (request_id, event queue)."""
        rid = request_id or uuid.uuid4().hex[:16]
        if isinstance(prompt, str):
            ids = self.tokenizer.encode(prompt)
        else:
            ids = list(prompt)
        ids = ids[: self.cache.max_seq - 1]
        out: "queue.Queue[GenEvent]" = queue.Queue()
        self._queue.put((rid, ids, params, out))
        return rid, out

    def generate(self, prompt: str | list[int], params: SamplingParams | None = None,
                 timeout: float = 1800.0) -> Iterator[GenEvent]:
        """First-event timeout covers cold-compile of the step graphs (minutes
        on remote-compiled TPU runtimes)."""
        """Blocking convenience iterator over one request's stream."""
        _, out = self.submit(prompt, params or SamplingParams())
        while True:
            ev = out.get(timeout=timeout)
            yield ev
            if ev.finished:
                return

    def generate_text(self, prompt: str | list[int],
                      params: SamplingParams | None = None) -> str:
        return "".join(ev.text for ev in self.generate(prompt, params))

    def cancel(self, request_id: str) -> bool:
        """Abort a request: frees its slot at the next scheduler boundary
        (client disconnects must not burn decode steps to max_tokens)."""
        self._cancelled.add(request_id)
        return True

    def embed(self, prompt: str | list[int]) -> tuple[list[float], int]:
        """Mean-pooled final-hidden-state embedding; returns (vector, n_tokens).

        Runs synchronously outside the scheduler (uses its own scratch cache,
        does not touch the slot pool).
        """
        ids = self.tokenizer.encode(prompt) if isinstance(prompt, str) else list(prompt)
        ids = ids[: self.ecfg.prefill_buckets[-1]]
        T = self._bucket(len(ids))
        tok = np.zeros((1, T), np.int32)
        tok[0, :len(ids)] = ids
        vec = self._embed_fns[T](self.params, jnp.asarray(tok),
                                 jnp.int32(len(ids)))
        return [float(x) for x in np.asarray(vec)], len(ids)

    # ------------------------------------------------------------ scheduler
    def start(self) -> None:
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True,
                                            name="engine-loop")
            self._thread.start()

    def warmup_async(self) -> threading.Thread:
        """Compile every serving graph by pushing synthetic requests through
        the REAL path (one per prefill bucket, plus enough decode steps to
        exercise the pipelined multi-step graphs) in a daemon thread.

        First real requests then never hit a Mosaic compile mid-request —
        the lazy-compile alternative showed as a one-off multi-second (cold
        persistent cache: multi-minute) TTFT spike on whichever bucket a
        request touched first.  Readiness is not blocked: the stack serves
        while warmup drains through the normal queue.  With a warm
        persistent compile cache the whole pass is a few seconds."""
        def run():
            big = self.ecfg.prefill_buckets[-1]
            cap = self._slot_cap_max()
            # one prompt length per bucket, plus one LONGER than the
            # largest bucket (when capacity allows): non-final chunks use
            # the plain (no-sample) prefill variant, which only that
            # multi-chunk shape compiles
            lengths = [max(2, min(T, cap // 2))
                       for T in self.ecfg.prefill_buckets]
            if cap > big + 64:
                lengths.append(big + 16)
            uniq = list(dict.fromkeys(lengths))
            try:
                for i, n in enumerate(uniq):
                    prompt = [7 + i] + [3 + (j % 50) for j in range(n - 1)]
                    last = i == len(uniq) - 1
                    mt = max(2, 3 * self.ecfg.multi_step + 2) if last else 2
                    for _ in self.generate(prompt, SamplingParams(
                            temperature=0.0, max_tokens=mt)):
                        pass
            except Exception:  # noqa: BLE001 — warmup is best-effort
                pass
        t = threading.Thread(target=run, daemon=True, name="engine-warmup")
        t.start()
        return t

    def _slot_cap_max(self) -> int:
        """Largest per-slot token capacity any request could get."""
        if self.alloc is not None:
            return self.cache.max_seq
        return self.ecfg.ctx

    def stop(self) -> None:
        self._stop_evt.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        self._pending = None
        if self.mesh is not None:
            # clear the module-global flash mesh: later single-device
            # engines or direct kernel calls must not inherit it
            from ..ops.flash_attention import set_mesh
            set_mesh(None)

    def _loop(self) -> None:
        while not self._stop_evt.is_set():
            try:
                worked = self.step()
            except Exception:  # noqa: BLE001 — engine must not die silently
                import traceback
                traceback.print_exc()
                self._fail_all(f"engine error: {traceback.format_exc(limit=3)}")
                continue
            if self._tick_hook is not None:
                # multi-host leader: serve embed commands + keep followers
                # fed with idle heartbeats (the hook sleeps when idle)
                if self._tick_hook(worked):
                    continue
            elif not worked:
                # idle: block briefly on the queue to avoid spinning
                try:
                    item = self._queue.get(timeout=0.05)
                    self._queue.put(item)
                except queue.Empty:
                    pass
        # drain any in-flight dispatch so its requests get their tokens
        if self._pending is not None:
            try:
                self._drain(self._pending)
            except Exception:  # noqa: BLE001 — best effort at shutdown
                pass
            self._pending = None

    def _fail_all(self, message: str) -> None:
        """Terminate every active + queued request with an error event."""
        self._pending = None
        for slot in self.slots:
            slot.cached_ids = []   # cache state unknown after an error
        for b, slot in enumerate(self.slots):
            if slot.state != "free":
                slot.out.put(GenEvent(finished=True, finish_reason="error",
                                      text="", n_prompt=len(slot.prompt_ids),
                                      n_generated=len(slot.generated)))
                self._release(b)
        for item in self._waiting:       # paged head-of-line holdback
            item[3].put(GenEvent(finished=True, finish_reason="error"))
        self._waiting = []
        while True:
            try:
                _, _, _, out = self._queue.get_nowait()
            except queue.Empty:
                break
            out.put(GenEvent(finished=True, finish_reason="error"))

    def n_active(self) -> int:
        return sum(s.state != "free" for s in self.slots)

    def queue_depth(self) -> int:
        return self._queue.qsize() + len(self._waiting)

    def step(self) -> bool:
        """One scheduler iteration.  Returns True if any work was done."""
        self._reap_cancelled()
        self._run_slot_ops()
        admitted = self._admit()
        decoded = self._decode()
        return admitted or decoded

    # -- slot save/restore (llama-server --slot-save-path) --------------------
    def slot_op(self, op: str, b: int, path: str = "") -> dict:
        """Save / restore / erase slot b's prompt cache (llama-server
        ``POST /slots/{id}?action=...``).  Thread-safe: the operation
        executes on the scheduler thread between dispatches."""
        if not 0 <= b < self.ecfg.max_slots:
            raise ValueError(f"no such slot {b}")
        if op != "erase":   # erase only clears a host-side claim
            if self._admit_hook is not None:
                raise ValueError("slot save/restore is not supported under "
                                 "multi-host lockstep (leader-only cache "
                                 "surgery would diverge the followers)")
            if self.alloc is not None:
                raise ValueError("slot save/restore requires the contiguous "
                                 "KV layout (paged slots have no private "
                                 "region)")
        if self._thread is None or not self._thread.is_alive():
            return self._exec_slot_op(op, b, path)
        reply: "queue.Queue" = queue.Queue()
        self._slot_ops.put((op, b, path, reply))
        try:
            status, payload = reply.get(timeout=600)
        except queue.Empty:
            raise ValueError("engine stopped before the slot operation "
                             "ran") from None
        if status == "error":
            raise ValueError(payload)
        return payload

    def _run_slot_ops(self) -> None:
        while True:
            try:
                op, b, path, reply = self._slot_ops.get_nowait()
            except queue.Empty:
                return
            try:
                reply.put(("ok", self._exec_slot_op(op, b, path)))
            except Exception as e:  # noqa: BLE001 — surfaces as HTTP 400
                reply.put(("error", str(e)))

    def _exec_slot_op(self, op: str, b: int, path: str) -> dict:
        import numpy as _np
        slot = self.slots[b]
        if slot.state != "free":
            raise ValueError(f"slot {b} is busy")
        if op == "erase":
            n = len(slot.cached_ids)
            slot.cached_ids = []
            return {"id_slot": b, "n_erased": n}
        L = self.cfg.n_layers
        fields = [f for f in type(self.cache)._fields if f != "page_table"]
        if op == "save":
            n = len(slot.cached_ids)
            if n == 0:
                raise ValueError(f"slot {b} has no cached prompt to save")
            t0 = time.monotonic()
            payload = {"ids": _np.asarray(slot.cached_ids, _np.int32),
                       "kind": type(self.cache).__name__,
                       "model": self.model_name}
            for f in fields:
                layers = getattr(self.cache, f)
                arr = _np.stack(
                    [_np.asarray(layers[i][b, :, :n]) for i in range(L)])
                if arr.dtype.name == "bfloat16":
                    # savez has no bf16: store the raw u16 bit pattern
                    # (restore views it back through the engine dtype)
                    arr = arr.view(_np.uint16)
                payload[f] = arr
            # a file OBJECT keeps the exact name: np.savez(str) silently
            # appends ".npz", which restore would then fail to find
            with open(path, "wb") as fh:
                _np.savez(fh, **payload)
            return {"id_slot": b, "filename": os.path.basename(path),
                    "n_saved": n,
                    "t_save_ms": round((time.monotonic() - t0) * 1e3, 1)}
        if op != "restore":
            raise ValueError(f"unknown slot action {op!r}")
        t0 = time.monotonic()
        with _np.load(path) as data:
            if str(data["kind"]) != type(self.cache).__name__:
                raise ValueError(
                    f"cache kind mismatch: file has {data['kind']}, engine "
                    f"runs {type(self.cache).__name__}")
            if str(data["model"]) != self.model_name:
                raise ValueError("slot file was saved from a different "
                                 f"model ({data['model']})")
            ids = [int(t) for t in data["ids"]]
            n = len(ids)
            if n > self._slot_cap(b):
                raise ValueError(f"saved prompt ({n} tokens) exceeds the "
                                 f"slot capacity {self._slot_cap(b)}")
            new = {}
            for f in fields:
                layers = list(getattr(self.cache, f))
                stacked = data[f]
                if stacked.dtype == _np.uint16 \
                        and layers[0].dtype == jnp.bfloat16:
                    import ml_dtypes
                    stacked = stacked.view(ml_dtypes.bfloat16)
                for i in range(L):
                    layers[i] = layers[i].at[b, :, :n].set(
                        jnp.asarray(stacked[i]))
                new[f] = tuple(layers)
        self.cache = self.cache._replace(**new)
        slot.cached_ids = ids
        return {"id_slot": b, "filename": os.path.basename(path),
                "n_restored": n,
                "t_restore_ms": round((time.monotonic() - t0) * 1e3, 1)}

    def _reap_cancelled(self) -> None:
        if not self._cancelled:
            return
        for b, slot in enumerate(self.slots):
            if slot.state != "free" and slot.request_id in self._cancelled:
                self._cancelled.discard(slot.request_id)
                slot.out.put(GenEvent(finished=True, finish_reason="stop",
                                      n_prompt=len(slot.prompt_ids),
                                      n_generated=len(slot.generated)))
                self._release(b)
        # drop cancelled requests still waiting in the queue (and in the
        # paged head-of-line holdback)
        if self._cancelled and self._waiting:
            keep = []
            for item in self._waiting:
                if item[0] in self._cancelled:
                    self._cancelled.discard(item[0])
                    item[3].put(GenEvent(finished=True, finish_reason="stop"))
                else:
                    keep.append(item)
            self._waiting = keep
        if self._cancelled:
            pending = []
            while True:
                try:
                    item = self._queue.get_nowait()
                except queue.Empty:
                    break
                if item[0] in self._cancelled:
                    self._cancelled.discard(item[0])
                    item[3].put(GenEvent(finished=True, finish_reason="stop"))
                else:
                    pending.append(item)
            for item in pending:
                self._queue.put(item)
        # ids matching nothing were already finished — don't leak them
        self._cancelled.clear()

    # -- admission + prefill -------------------------------------------------
    def _slot_cap(self, b: int) -> int:
        """Tokens slot b may hold: its page reservation (paged) or the
        static per-slot region (contig)."""
        if self.alloc is not None:
            return len(self.alloc.owned[b]) * self.ecfg.kv_page_size
        return self.ecfg.ctx

    def _push_table(self) -> None:
        """Mirror the host allocator's page table to the device cache."""
        if self.mesh is not None:
            # replicate explicitly: a default-device array mixed into the
            # mesh-sharded cache pytree fails jit's device check.  Local
            # construction only — device_put-to-sharding hides a collective
            # value check that deadlocks multi-host lockstep (see
            # parallel.mesh.replicate_host_local)
            from ..parallel.mesh import replicate_host_local
            table = replicate_host_local(self.mesh, self.alloc.table)
        else:
            table = jnp.asarray(self.alloc.table)
        self.cache = self.cache._replace(page_table=table)

    def _next_request(self):
        if self._waiting:
            return self._waiting.pop(0)
        try:
            return self._queue.get_nowait()
        except queue.Empty:
            return None

    def _reusable_prefix(self, b: int, ids: list[int]) -> int:
        """Prompt tokens already sitting in slot b's KV (llama-server slot
        prompt caching).  Capped at len(ids)-1: the final prompt position
        must always run so its logits exist for first-token sampling."""
        if not self.ecfg.prefix_cache or self.alloc is not None:
            return 0
        cached = self.slots[b].cached_ids
        n = 0
        limit = min(len(cached), len(ids) - 1)
        while n < limit and cached[n] == ids[n]:
            n += 1
        return n

    def _pick_slot(self, free: list[int], ids: list[int]) -> int:
        """Free slot with the longest reusable prompt prefix; among equal
        matches, the one whose cached claim is least valuable to evict
        (llama-server picks idle/unused slots before cached ones)."""
        return max(free, key=lambda b: (self._reusable_prefix(b, ids),
                                        -len(self.slots[b].cached_ids), -b))

    def _admit(self) -> bool:
        did = False
        # Two-phase admission (llama-server batches slot admissions; VERDICT
        # r4 #4): phase 1 dispatches every pending request's prefill chain
        # WITHOUT syncing its first token — the device then executes the
        # prefills back-to-back while the host sets up the next slot — and
        # phase 2 fetches the first tokens once nothing is left to dispatch.
        # The old sync-per-admission loop paid a full host round trip
        # (~30 ms on the axon relay) of device idle between every pair of
        # concurrent prefills (~1.9k vs 3.8k tok/s measured, DEBUGGING.md).
        pending_adm: list[tuple[int, Any, Any]] = []
        while True:
            free = [b for b, s in enumerate(self.slots) if s.state == "free"]
            if not free:
                break
            item = self._next_request()
            if item is None:
                break
            # provisionally back on the holdback list: a crash anywhere in
            # admission leaves the request visible to _fail_all instead of
            # silently lost
            self._waiting.insert(0, item)
            rid, ids, params, out = item
            b = self._pick_slot(free, ids)
            slot = self.slots[b]
            if self.alloc is not None:
                # reserve the whole lifetime up front (prompt + max_tokens):
                # decode then never allocates mid-flight, keeping the step
                # jitted with a static table
                need = -(-(len(ids) + params.max_tokens + 1)
                         // self.ecfg.kv_page_size)
                need = min(need, self.alloc.table.shape[1])
                if not self.alloc.reserve(b, need):
                    # pool exhausted: hold at the head of the line until a
                    # running request frees its pages
                    break
                self._push_table()
            # grammar-constrained request: build the matcher BEFORE touching
            # the slot, so a bad grammar fails THIS request (the server
            # pre-validates; this is the engine-side safety net) instead of
            # tripping _fail_all
            matcher = None
            if params.grammar:
                try:
                    if self._admit_hook is not None and \
                            len(params.grammar.encode()) > MH_GRAMMAR_CAP:
                        # the lockstep broadcast carries the grammar in a
                        # fixed-shape buffer (parallel.multihost) so the
                        # followers can mirror the matcher automaton
                        raise ValueError(
                            "grammar exceeds the multi-host broadcast cap "
                            f"({MH_GRAMMAR_CAP} bytes)")
                    matcher = self._make_matcher(params.grammar)
                except Exception as e:  # noqa: BLE001 — bad grammar/schema
                    self._waiting.pop(0)
                    if self.alloc is not None:
                        self.alloc.release(b)
                        self._push_table()
                    out.put(GenEvent(finished=True, finish_reason="error",
                                     text=f"invalid grammar: {e}"))
                    continue
            if (self._admit_hook is not None and params.logit_bias
                    and len(params.logit_bias) > MH_LB_CAP):
                self._waiting.pop(0)
                if self.alloc is not None:
                    self.alloc.release(b)
                    self._push_table()
                out.put(GenEvent(finished=True, finish_reason="error",
                                 text=f"logit_bias exceeds the multi-host "
                                      f"broadcast cap ({MH_LB_CAP} entries)"))
                continue
            self._waiting.pop(0)
            slot.state = "prefill"
            slot.request_id = rid
            slot.prompt_ids = ids
            slot.generated = []
            slot.params = params
            slot.out = out
            slot.text_buf = ""
            slot.pending_text = ""
            slot.utf8_buf = b""
            slot.started = time.monotonic()
            slot.offset = 0
            slot.hist_upto = 0
            slot.matcher = matcher
            slot.static_bias = None
            slot.mask_dirty = False
            if self._admit_hook is not None:
                self._admit_hook(b, ids, params)
            _tr(f"admit slot={b} n_ids={len(ids)}")
            # seed counts with the prompt so repeat/frequency/presence
            # penalties see "any token in the sequence so far" (llama.cpp
            # semantics documented in sampler.py).  ids pad to a power-of-two
            # bucket so the jitted write compiles a bounded set of shapes.
            n_pad = 64
            while n_pad < len(ids):
                n_pad *= 2
            ids_arr = np.zeros(n_pad, np.int32)
            ids_arr[:len(ids)] = ids
            scal = jnp.asarray([params.temperature, params.top_p,
                                params.min_p, params.presence_penalty,
                                params.frequency_penalty,
                                params.repeat_penalty, params.typical_p,
                                float(params.mirostat),
                                params.mirostat_tau, params.mirostat_eta],
                               jnp.float32)
            brow = bias_row(params, self.cfg.vocab_size)
            if matcher is not None:
                if params.logit_bias:
                    slot.static_bias = brow.copy()
                brow = self._grammar_bias(slot, brow)
            self.sample_state = write_slot_device(
                self.sample_state, jnp.int32(b), scal,
                jnp.int32(params.top_k), jnp.uint32(params.seed),
                jnp.asarray(ids_arr), jnp.int32(len(ids)),
                jnp.asarray(brow))
            _tr("write_slot dispatched")
            pending_adm.append((b, *self._prefill_slot(b)))
            _tr(f"prefill dispatched slot={b}")
            did = True
        for b, tok_dev, logits_dev in pending_adm:
            self._finish_prefill(b, tok_dev, logits_dev)
            _tr(f"first token emitted slot={b}")
        return did

    def _bucket(self, n: int) -> int:
        for t in self.ecfg.prefill_buckets:
            if n <= t:
                return t
        return self.ecfg.prefill_buckets[-1]

    def _prefill_device(self, b: int, ids: list[int]):
        """Device-side admission work for slot b: prefill chunks straight
        into the slot's region of the donated pool; the FINAL chunk's graph
        also samples the first token — a single-bucket prompt is ONE
        dispatch end to end.  Deterministic given (b, ids, sample_state) —
        the multi-host follower path replays exactly this
        (parallel.multihost).  Returns the ON-DEVICE (token, last-position
        logits) — no host sync happens here (see _admit)."""
        pos = self._reusable_prefix(b, ids)
        if pos:
            self.total_prefix_reused += pos
            _tr(f"prefix reuse: {pos} tokens")
        bj = jnp.int32(b)
        while True:
            remaining = len(ids) - pos
            chunk = min(remaining, self.ecfg.prefill_buckets[-1])
            last = chunk == remaining
            T = self._bucket(chunk)
            tok_arr = np.zeros((1, T), np.int32)
            tok_arr[0, :chunk] = ids[pos:pos + chunk]
            if last:
                tok, logits_last, self.sample_state, self.cache = \
                    self._prefill_sample_fns[T](
                        self.params, self.cache, bj, jnp.asarray(tok_arr),
                        jnp.int32(pos), jnp.int32(chunk), self.sample_state)
                _tr(f"prefill+sample chunk T={T} dispatched")
                pos += chunk
                break
            _, self.cache = self._prefill_fns[T](
                self.params, self.cache, bj, jnp.asarray(tok_arr),
                jnp.int32(pos), jnp.int32(chunk), self.sample_state)
            _tr(f"prefill chunk T={T} dispatched")
            pos += chunk
        # draft-cache prefill: the draft model re-processes the WHOLE prompt
        # (it is ~10x smaller than the target, and the prefix-reuse claim
        # tracks only the target cache)
        if self.draft_params is not None and ids:
            dpos = 0
            while True:
                chunk = min(len(ids) - dpos, self.ecfg.prefill_buckets[-1])
                T = self._bucket(chunk)
                tok_arr = np.zeros((1, T), np.int32)
                tok_arr[0, :chunk] = ids[dpos:dpos + chunk]
                self.draft_cache = self._draft_prefill_fns[T](
                    self.draft_params, self.draft_cache, bj,
                    jnp.asarray(tok_arr), jnp.int32(dpos), jnp.int32(chunk))
                dpos += chunk
                if dpos >= len(ids):
                    break
            _tr("draft prefill dispatched")
            self.slots[b].draft_upto = len(ids)
        return tok, logits_last

    def _prefill_slot(self, b: int):
        """Dispatch slot b's admission prefill (async).  Returns the
        on-device (first token, last-position logits) pair for
        :meth:`_finish_prefill` — the host sync is deferred so concurrent
        admissions pipeline on the device (see _admit)."""
        slot = self.slots[b]
        ids = slot.prompt_ids
        self.total_prompt_tokens += len(ids)
        tok_dev, logits_last = self._prefill_device(b, ids)
        slot.offset = len(ids)
        slot.cached_ids = list(ids)
        return tok_dev, logits_last

    def _finish_prefill(self, b: int, tok_dev, logits_last) -> None:
        """Sync a dispatched admission's first token to the host and emit."""
        slot = self.slots[b]
        tok = int(tok_dev)
        _tr(f"first token synced slot={b}")
        if slot.params.n_probs > 0:
            # the full logits row is a ~0.5 MB device fetch (a relay round
            # trip) — only pay it when the request asked for logprobs
            tok_lp, top = self._host_token_stats(slot, logits_last, tok)
        else:
            tok_lp, top = None, None
        self._emit_token(b, tok, tok_lp, top)
        if slot.state != "free":
            slot.state = "active"

    # -- grammar-constrained decoding -----------------------------------------
    def _make_matcher(self, gbnf: str):
        """GrammarMatcher for this engine's tokenizer.  Parsed grammars and
        the vocab trie are cached (same schema across requests = one parse,
        shared per-state mask cache)."""
        from ..grammar import GrammarMatcher, TokenTrie, parse_gbnf
        if not hasattr(self, "_token_trie") or self._token_trie is None:
            self._token_trie = TokenTrie(self.tokenizer)
            self._grammar_cache: dict[str, Any] = {}
        g = self._grammar_cache.get(gbnf)
        if g is None:
            g = self._grammar_cache[gbnf] = parse_gbnf(gbnf)
        return GrammarMatcher(g, self._token_trie)

    @staticmethod
    def masked_bias(matcher, base: np.ndarray) -> np.ndarray:
        """(V,) f32 bias row: -inf on grammar-invalid tokens, ``base``
        (the request's static logit_bias) elsewhere.  Static so the
        multi-host follower replay computes the identical row from its
        matcher replica (parallel.multihost)."""
        return np.where(matcher.valid_mask(), base, -np.inf).astype(np.float32)

    def _grammar_bias(self, slot: _Slot, base: np.ndarray | None = None
                      ) -> np.ndarray:
        if base is None:
            base = slot.static_bias if slot.static_bias is not None \
                else np.zeros(self.cfg.vocab_size, np.float32)
        return self.masked_bias(slot.matcher, base)

    def _flush_grammar_masks(self, active: list[int]) -> None:
        """Push stale grammar masks to the device bias rows (one fused
        dispatch per dirty slot) — called right before a decode issue.
        Flushed slots are recorded in ``_gflush_pending`` so the multi-host
        decode broadcast can tell followers to advance their matcher
        replicas and apply the same rows."""
        self._gflush_pending = []
        for b in active:
            slot = self.slots[b]
            if slot.matcher is not None and slot.mask_dirty:
                self.sample_state = set_bias_row(
                    self.sample_state, jnp.int32(b),
                    jnp.asarray(self._grammar_bias(slot)))
                slot.mask_dirty = False
                self._gflush_pending.append(b)

    # -- batched decode ------------------------------------------------------
    def _multi_steps_viable(self, active: list[int]) -> int:
        """How many decode steps can be fused into one dispatch right now."""
        n = self.ecfg.multi_step
        if n <= 1:
            return 1
        if any(self.slots[b].matcher is not None for b in active):
            return 1   # the mask must refresh between steps (host automaton)
        if not self._queue.empty() and self.n_active() < self.ecfg.max_slots:
            return 1   # stay responsive: admit waiting requests first
        # all-or-nothing: a variable scan length would compile a new graph
        # per length.  A slot finishing mid-batch just ignores the tail —
        # bounded waste (< n steps) beats recompilation.
        for b in active:
            if self._slot_cap(b) - self.slots[b].offset - 1 < n:
                return 1
        return n

    def _decode_exec(self, tokens: np.ndarray, offsets: np.ndarray,
                     n_steps: int, want_lp: bool):
        """Device-side decode over the full slot batch: ``n_steps`` fused
        steps from the given (B, 1) token / (B,) offset arrays.  The
        multi-host follower replays exactly this call sequence
        (parallel.multihost).  Returns numpy (toks (N, B), lps (N, B),
        top_v, top_i) — lps/top_* None without logprobs.

        All host-bound outputs come back in ONE ``jax.device_get`` — each
        separate fetch costs a full round trip on remote-relay runtimes
        (~30 ms on the axon tunnel; see DEBUGGING.md), and per-token
        log-probs are only fetched when some active request asked for them.
        """
        pend = self._issue(tokens, offsets, n_steps, want_lp, active=[])
        toks_d, lps_d, tv_d, ti_d = pend["dev"]
        if want_lp:
            return jax.device_get((toks_d, lps_d, tv_d, ti_d))
        return np.asarray(toks_d), None, None, None

    def _decode_inputs(self, active: list[int]) -> tuple[np.ndarray, np.ndarray]:
        B = self.ecfg.max_slots
        tokens = np.zeros((B, 1), np.int32)
        # FREE slots still run in the batched step and WRITE KV at their
        # offset each step; offset 0 would scribble over the cached prompt
        # prefix kept for reuse (confirmed token corruption).  Park them
        # just past their claim — _release truncates the claim so even
        # pipelined continuations (which advance free offsets too) stay
        # clear of it.  Paged pools are immune (-1 table rows drop writes).
        offsets = np.zeros(B, np.int32)
        for b, slot in enumerate(self.slots):
            if slot.state == "free":
                offsets[b] = len(slot.cached_ids)
        for b in active:
            tokens[b, 0] = self.slots[b].generated[-1]
            offsets[b] = self.slots[b].offset
        return tokens, offsets

    # -- pipelined dispatch: keep one multi-step decode in flight so the
    # host-side result fetch (a full round trip — ~30 ms through a remote
    # relay runtime) overlaps the NEXT dispatch's device time.  The token
    # feedback for the continuation is the in-flight dispatch's own device
    # output (toks[-1]), so no host data is needed to issue it.  Slots that
    # turn out to have finished inside the fetched batch simply waste their
    # speculative tail (bounded, same policy as mid-batch EOG).  Disabled
    # under multi-host lockstep: followers replay host-broadcast inputs.
    def _pipeline_ok(self, pend) -> bool:
        active, n_steps, want_lp = pend["active"], pend["n_steps"], pend["want_lp"]
        if n_steps <= 1 or self._decode_hook is not None:
            return False
        if not self._queue.empty() and self.n_active() < self.ecfg.max_slots:
            return False   # stay responsive: drain + admit first
        now_active = [b for b, s in enumerate(self.slots) if s.state == "active"]
        if now_active != active:
            return False   # a newly admitted slot must join the batch
        for b in active:
            slot = self.slots[b]
            if slot.state != "active" or slot.request_id != pend["gen"][b]:
                return False
            # room for the in-flight steps AND the continuation
            if slot.offset + 2 * n_steps + 1 >= self._slot_cap(b):
                return False
            if len(slot.generated) + 2 * n_steps > slot.params.max_tokens:
                return False   # would overshoot max_tokens: don't speculate
        del want_lp  # params are immutable per request, so it cannot change
        return True

    def _issue(self, tokens, offsets, n_steps: int, want_lp: bool,
               active: list[int], offsets_np: np.ndarray | None = None
               ) -> dict:
        """Dispatch a decode batch (async) without fetching results.
        ``tokens``/``offsets`` may be host numpy or device arrays (the
        pipelined continuation passes the previous dispatch's on-device
        outputs — zero host->device transfers on that path).
        ``offsets_np`` carries the host bookkeeping copy when ``offsets``
        is a device array."""
        key = (n_steps, want_lp)
        if n_steps == 1:
            fn = self._decode_step_lp if want_lp else self._decode_step
        else:
            if key not in self._decode_multi_fns:
                maker = self._make_multi_lp if want_lp else self._make_multi
                self._decode_multi_fns[key] = maker(n_steps)
            fn = self._decode_multi_fns[key]
        _tr(f"issue n_steps={n_steps} lp={want_lp} begin")
        outs = fn(self.params, self.cache, jnp.asarray(tokens),
                  jnp.asarray(offsets), self.sample_state)
        _tr("issue dispatched")
        next_dev = next_off_dev = None
        if n_steps == 1:
            if want_lp:
                tok, self.sample_state, self.cache, tok_lp, tv, ti = outs
                dev = (tok[None], tok_lp[None], tv[None], ti[None])
            else:
                tok, self.sample_state, self.cache = outs
                dev = (tok[None], None, None, None)
        else:
            if want_lp:
                toks_dev, self.sample_state, self.cache, lps, tv, ti, \
                    next_dev, next_off_dev = outs
                dev = (toks_dev, lps, tv, ti)
            else:
                toks_dev, self.sample_state, self.cache, next_dev, \
                    next_off_dev = outs
                dev = (toks_dev, None, None, None)
        return {
            "dev": dev, "next_dev": next_dev, "next_off_dev": next_off_dev,
            "offsets": offsets_np if offsets_np is not None else offsets,
            "n_steps": n_steps, "want_lp": want_lp, "active": active,
            "gen": {b: self.slots[b].request_id for b in active},
            "t0": time.monotonic(),
        }

    def _drain(self, pend) -> None:
        """Fetch a dispatched batch's host-bound outputs and emit tokens."""
        toks_d, lps_d, tv_d, ti_d = pend["dev"]
        _tr(f"drain n_steps={pend['n_steps']} begin")
        if pend["want_lp"]:
            toks, lps, tv, ti = jax.device_get((toks_d, lps_d, tv_d, ti_d))
        else:
            toks, lps, tv, ti = np.asarray(toks_d), None, None, None
        _tr("drain fetched")
        n_steps = pend["n_steps"]
        dt = (time.monotonic() - pend["t0"]) / n_steps
        self._last_decode_s = 0.9 * self._last_decode_s + 0.1 * dt \
            if self._last_decode_s else dt
        for step in range(n_steps):
            for b in pend["active"]:
                slot = self.slots[b]
                # slot may have finished (EOG/stop) mid-batch: drop the rest
                if slot.state != "active" or slot.request_id != pend["gen"][b]:
                    continue
                slot.offset += 1
                top = None if ti_d is None else \
                    self._top_list(slot, ti[step, b], tv[step, b])
                lp = None if lps is None else float(lps[step, b])
                self._emit_token(b, int(toks[step, b]), lp, top)

    def _decode(self) -> bool:
        pend, self._pending = self._pending, None
        if pend is not None:
            nxt = None
            if self._pipeline_ok(pend):
                # both continuation inputs are the in-flight dispatch's own
                # on-device outputs — no host ops, no host->device transfers
                nxt = self._issue(pend["next_dev"], pend["next_off_dev"],
                                  pend["n_steps"], pend["want_lp"],
                                  list(pend["active"]),
                                  offsets_np=pend["offsets"] + pend["n_steps"])
            self._drain(pend)           # fetch overlaps nxt's device time
            if nxt is not None:
                # continuation slots that finished during the drain waste
                # their speculative tail; _drain's gen check drops it
                self._pending = nxt
            return True

        active = [b for b, s in enumerate(self.slots) if s.state == "active"]
        if not active:
            return False
        self._maybe_shift(active)
        if self._spec_viable(active):
            return self._spec_dispatch(active)
        n_steps = self._multi_steps_viable(active)
        want_lp = any(self.slots[b].params.n_probs > 0 for b in active)
        self._flush_grammar_masks(active)
        tokens, offsets = self._decode_inputs(active)
        if self._decode_hook is not None:
            self._decode_hook(tokens, offsets, n_steps, want_lp)
        pend = self._issue(tokens, offsets, n_steps, want_lp, active)
        if n_steps > 1 and self._decode_hook is None:
            self._pending = pend        # drain on the next scheduler tick
        else:
            self._drain(pend)
        return True


    # -- context shift ---------------------------------------------------------
    def _maybe_shift(self, active: list[int]) -> None:
        """llama-server --ctx-shift: a slot whose KV region cannot hold the
        next dispatch keeps its first n_keep positions (the prompt, capped
        at half the region), discards half the rest, and continues.  Runs
        between dispatches only (never with one in flight)."""
        if not self.ecfg.ctx_shift or self._pending is not None:
            return
        margin = self.ecfg.multi_step + 1
        for b in active:
            slot = self.slots[b]
            cap = self._slot_cap(b)
            if slot.offset + margin < cap:
                continue
            keep = min(len(slot.prompt_ids), cap // 2)
            discard = max(margin, (slot.offset - keep) // 2)
            if self._shift_fn is None:
                from ..models.llama import shift_cache_slot
                self._shift_fn = jax.jit(
                    partial(shift_cache_slot, cfg=self.cfg),
                    donate_argnums=(0,))
            self.cache = self._shift_fn(self.cache, b=jnp.int32(b),
                                        keep=jnp.int32(keep),
                                        discard=jnp.int32(discard))
            slot.offset -= discard
            slot.cached_ids = []   # positions no longer match the prompt
            self.total_ctx_shifts += 1
            _tr(f"ctx shift slot={b} keep={keep} discard={discard}")

    # -- speculative decoding -------------------------------------------------
    def _spec_viable(self, active: list[int]) -> bool:
        """Route this dispatch through draft/verify rounds?  Exactness
        requires every active slot to sample pure greedy (the verify is a
        raw argmax); capacity must cover the worst-case advance."""
        if not self.spec_mode or self._decode_hook is not None:
            return False
        if not self._queue.empty() and self.n_active() < self.ecfg.max_slots:
            return False   # stay responsive: admit waiting requests first
        if any(self.slots[b].matcher is not None for b in active):
            return False   # constrained slots decode one masked step at a time
        if (self.ecfg.spec_min_accept > 0
                and self.spec_ewma < self.ecfg.spec_min_accept):
            # acceptance too low to pay for verify chunks: plain decode,
            # but probe speculation periodically (content regime may
            # change).  No state mutation here — a probe dispatch's own
            # EWMA update re-opens the gate if acceptance recovered
            # (0.7*old + 0.3*good_rate clears the threshold).
            self._spec_tick += 1
            if self._spec_tick % max(1, self.ecfg.spec_probe_every):
                return False
        adv = self.spec_rounds * (self.ecfg.spec_tokens + 1)
        for b in active:
            p = self.slots[b].params
            if (p.temperature > 0.0 or p.n_probs > 0
                    or p.presence_penalty != 0.0
                    or p.frequency_penalty != 0.0
                    or p.repeat_penalty != 1.0):
                return False
            if self.slots[b].offset + adv + 1 >= self._slot_cap(b):
                return False
        return True

    def _spec_dispatch(self, active: list[int]) -> bool:
        """One fused draft/verify dispatch; emits 1..rounds*(K+1) tokens
        per slot.  Synchronous (no pipelining): the rounds themselves
        amortize the host round trip."""
        B = self.ecfg.max_slots
        K = self.ecfg.spec_tokens
        # pending/offsets come from _decode_inputs — the SAME free-slot
        # parking rule as plain decode (getting it wrong corrupts the
        # prefix-cache claim; the policy must live in one place)
        pending, offsets = self._decode_inputs(active)
        prev = np.zeros((B, 1), np.int32)
        for b in active:
            slot = self.slots[b]
            seq = slot.prompt_ids + slot.generated
            prev[b, 0] = seq[-2] if len(seq) >= 2 else seq[-1]
        _tr(f"spec dispatch mode={self.spec_mode} rounds={self.spec_rounds} "
            f"K={K}")
        t0 = time.monotonic()
        if self.spec_mode == "draft":
            for b in active:
                self._sync_draft_cache(b)
            toks_d, counts_d, self.cache, self.draft_cache = self._spec_fn(
                self.params, self.draft_params, self.cache, self.draft_cache,
                jnp.asarray(pending), jnp.asarray(prev), jnp.asarray(offsets))
        else:
            for b in active:
                self._sync_hist(b)
            toks_d, counts_d, self.cache, self.hist = self._spec_fn(
                self.params, self.cache, self.hist,
                jnp.asarray(pending), jnp.asarray(prev), jnp.asarray(offsets))
        toks, counts = jax.device_get((toks_d, counts_d))
        _tr("spec fetched")
        emitted = 0
        disp_drafted = disp_accepted = 0
        for r in range(self.spec_rounds):
            for b in active:
                slot = self.slots[b]
                if slot.state != "active":
                    continue   # finished mid-dispatch: drop the tail
                n = int(counts[r, b])
                self.spec_drafted += K
                self.spec_accepted += n - 1
                disp_drafted += K
                disp_accepted += n - 1
                for i in range(n):
                    if slot.state != "active":
                        break
                    slot.offset += 1
                    self._emit_token(b, int(toks[r, b, i]), None, None)
                    emitted += 1
        if disp_drafted:
            rate = disp_accepted / disp_drafted
            self.spec_ewma = 0.7 * self.spec_ewma + 0.3 * rate
        if self.spec_mode == "ngram":
            # device wrote history through each slot's new offset; freed
            # slots re-sync from zero at their next admission
            for b in active:
                if self.slots[b].state == "active":
                    self.slots[b].hist_upto = self.slots[b].offset
        elif self.spec_mode == "draft":
            # rounds write the draft cache through at least offset-2 and
            # the next dispatch repairs offset-1: valid through offset-1
            for b in active:
                if self.slots[b].state == "active":
                    self.slots[b].draft_upto = max(self.slots[b].offset - 1, 0)
        per_slot = max(1, emitted // max(1, len(active)))
        dt = (time.monotonic() - t0) / per_slot
        self._last_decode_s = 0.9 * self._last_decode_s + 0.1 * dt \
            if self._last_decode_s else dt
        return True

    def _sync_draft_cache(self, b: int) -> None:
        """Re-prefill the draft model's KV over positions plain-path
        dispatches advanced without it (queue pressure, a non-greedy slot
        in the batch, near-capacity fallbacks).  The in-round repair only
        covers a ONE-token gap; anything wider would leave the draft
        attending over holes and silently collapse acceptance."""
        slot = self.slots[b]
        target = max(slot.offset - 1, 0)   # offset-1 is repaired in-round
        if slot.draft_upto >= target:
            return
        seq = slot.prompt_ids + slot.generated
        pos = slot.draft_upto
        bj = jnp.int32(b)
        while pos < target:
            chunk = min(len(seq) - pos, self.ecfg.prefill_buckets[-1])
            T = self._bucket(chunk)
            tok_arr = np.zeros((1, T), np.int32)
            tok_arr[0, :chunk] = seq[pos:pos + chunk]
            self.draft_cache = self._draft_prefill_fns[T](
                self.draft_params, self.draft_cache, bj,
                jnp.asarray(tok_arr), jnp.int32(pos), jnp.int32(chunk))
            pos += chunk
        slot.draft_upto = pos

    def _sync_hist(self, b: int) -> None:
        """Bring slot b's device token history up to its offset (ngram
        lookup reads [0, offset)).  Chunked exact-size writes; the final
        chunk's zero padding lands in the stale region past the offset
        (hist rows are padded by _HIST_PAD so the DUS never clamps)."""
        slot = self.slots[b]
        seq = slot.prompt_ids + slot.generated
        upto, target = slot.hist_upto, slot.offset
        bj = jnp.int32(b)
        while upto < target:
            chunk = np.zeros(_HIST_CHUNK, np.int32)
            avail = min(_HIST_CHUNK, len(seq) - upto)
            chunk[:avail] = seq[upto:upto + avail]
            self.hist = self._hist_write(self.hist, bj, jnp.int32(upto),
                                         jnp.asarray(chunk))
            upto += _HIST_CHUNK
        slot.hist_upto = target

    def _host_token_stats(self, slot, logits_row, tok: int):
        """First-token logprob/top-k computed host-side (once per request)."""
        row = np.asarray(logits_row, dtype=np.float32)
        m = float(row.max())
        lse = m + float(np.log(np.exp(row - m).sum()))
        tok_lp = float(row[tok]) - lse
        top = None
        if slot.params.n_probs > 0:
            k = min(slot.params.n_probs, self.TOP_LOGPROBS_K)
            idx = np.argpartition(-row, k)[:k]
            idx = idx[np.argsort(-row[idx])]
            top = [(int(i), float(row[i]) - lse) for i in idx]
        return tok_lp, top

    @staticmethod
    def _top_list(slot, idx_row, val_row):
        if slot.params.n_probs <= 0:
            return None
        n = min(slot.params.n_probs, len(idx_row))
        return [(int(idx_row[j]), float(val_row[j])) for j in range(n)]

    # -- emission / termination ---------------------------------------------
    def _emit_token(self, b: int, token_id: int, logprob: float | None = None,
                    top: list[tuple[int, float]] | None = None) -> None:
        slot = self.slots[b]
        slot.generated.append(token_id)
        self.total_generated += 1
        n_gen = len(slot.generated)

        finish: str | None = None
        if self.tokenizer.is_eog(token_id):
            finish = "stop"
        elif n_gen >= slot.params.max_tokens:
            finish = "length"
        elif (slot.offset + 1 >= self._slot_cap(b)
                and not self.ecfg.ctx_shift):
            # ctx_shift keeps generating: the scheduler shifts the slot's
            # window before the next dispatch instead of finishing
            finish = "length"

        if slot.matcher is not None and finish is None:
            if slot.matcher.accept_token(token_id):
                slot.mask_dirty = True
            else:
                # defensive: the mask should make this unreachable
                finish = "stop"

        # UTF-8 boundary holdback: byte-fallback tokens can carry partial
        # multi-byte sequences; emit only complete sequences (llama.cpp
        # streams the same way)
        if finish == "stop" and self.tokenizer.is_eog(token_id):
            raw = b""
        elif hasattr(self.tokenizer, "piece_bytes"):
            raw = self.tokenizer.piece_bytes(token_id)
        else:
            raw = self.tokenizer.piece(token_id).encode("utf-8")
        slot.utf8_buf += raw
        text, slot.utf8_buf = _utf8_split(slot.utf8_buf,
                                          flush=finish is not None)
        if n_gen == 1:
            text = text.lstrip(" ") if getattr(self.tokenizer, "add_space_prefix", False) else text

        # stop-string scanning with holdback of possible prefixes
        emit_text = ""
        if finish is not None:
            # terminal token: flush any held-back text plus this piece
            emit_text = slot.pending_text + text
            slot.pending_text = ""
        elif slot.params.stop:
            slot.pending_text += text
            stops = slot.params.stop
            hit = None
            for s_str in stops:
                idx = slot.pending_text.find(s_str)
                if idx >= 0:
                    hit = (idx, s_str)
                    break
            if hit is not None:
                emit_text = slot.pending_text[:hit[0]]
                slot.pending_text = ""
                finish = "stop"
            else:
                # hold back the longest suffix that could start a stop string
                keep = 0
                for s_str in stops:
                    for plen in range(min(len(s_str) - 1, len(slot.pending_text)), 0, -1):
                        if slot.pending_text.endswith(s_str[:plen]):
                            keep = max(keep, plen)
                            break
                if keep:
                    emit_text = slot.pending_text[:-keep]
                    slot.pending_text = slot.pending_text[-keep:]
                else:
                    emit_text = slot.pending_text
                    slot.pending_text = ""
        else:
            emit_text = text

        slot.text_buf += emit_text
        ev = GenEvent(
            token_id=token_id, text=emit_text,
            finished=finish is not None, finish_reason=finish,
            n_prompt=len(slot.prompt_ids), n_generated=n_gen,
            logprob=logprob, top_logprobs=top,
        )
        slot.out.put(ev)
        if finish is not None:
            self._release(b)

    def _release(self, b: int) -> None:
        slot = self.slots[b]
        slot.state = "free"
        slot.request_id = ""
        slot.offset = 0
        slot.matcher = None
        slot.static_bias = None
        slot.mask_dirty = False
        # keep the slot's KV claim for prompt-prefix reuse: prompt plus all
        # generated tokens that were FED back (the final token's KV is
        # never written; speculative mid-burst tails beyond the claim are
        # overwritten before they can be attended).  Truncated so the free
        # row's parked decode writes (see _decode_inputs) always land
        # beyond the claim even when pipelined bursts advance them to the
        # dynamic-update-slice clamp at ctx - n_steps.
        claim_cap = max(0, self.ecfg.ctx - self._max_advance() - 1)
        slot.cached_ids = ((slot.prompt_ids + slot.generated[:-1])[:claim_cap]
                           if self.ecfg.prefix_cache and self.alloc is None
                           else [])
        if self.alloc is not None:
            self.alloc.release(b)
            self._push_table()

    def _max_advance(self) -> int:
        """Worst-case per-dispatch offset advance (free slots park just
        past their claim; parked decode/spec writes must stay beyond it)."""
        adv = self.ecfg.multi_step
        if self.spec_mode:
            adv = max(adv, self.spec_rounds * (self.ecfg.spec_tokens + 1))
        return adv

    # -- health --------------------------------------------------------------
    def slots_info(self) -> list[dict]:
        """Per-slot scheduler state (llama-server ``GET /slots`` shape:
        ``state`` 0 = idle, 1 = processing)."""
        out = []
        for i, s in enumerate(self.slots):
            out.append({
                "id": i,
                "state": 0 if s.state == "free" else 1,
                "n_ctx": self.ecfg.ctx,
                "n_past": s.offset,
                "n_prompt": len(s.prompt_ids),
                "n_generated": len(s.generated),
                "request_id": s.request_id if s.state != "free" else "",
                "prefix_cached_tokens": len(s.cached_ids),
            })
        return out

    def stats(self) -> dict:
        return {
            "model": self.model_name,
            "slots_total": self.ecfg.max_slots,
            "slots_active": self.n_active(),
            "queue_depth": self.queue_depth(),
            "ctx": self.ecfg.ctx,
            "total_generated": self.total_generated,
            "total_prompt_tokens": self.total_prompt_tokens,
            "prefix_tokens_reused": self.total_prefix_reused,
            **({"ctx_shifts": self.total_ctx_shifts}
               if self.ecfg.ctx_shift else {}),
            "decode_step_ewma_ms": round(self._last_decode_s * 1000, 3),
            **({"spec_mode": self.spec_mode,
                "spec_drafted": self.spec_drafted,
                "spec_accepted": self.spec_accepted,
                "spec_acceptance": round(
                    self.spec_accepted / max(1, self.spec_drafted), 4),
                "spec_acceptance_ewma": round(self.spec_ewma, 4)}
               if self.spec_mode else {}),
            **({"kv_pages_free": self.alloc.free_pages,
                "kv_pages_total": self.alloc.table.shape[1],
                "kv_page_size": self.ecfg.kv_page_size}
               if self.alloc is not None else {}),
        }
