"""The backend server: OpenAI-compatible HTTP API over the TPU engine.

This is the process that replaces llama.cpp's ``llama-server`` binary
(reference ``start.sh:473-522`` spawns it on ``127.0.0.1:8080`` with
``--api-key-file``; SURVEY.md §2.9 lists the endpoint surface).  Endpoints:

- ``POST /v1/chat/completions`` — chat templating + generation, SSE streaming
- ``POST /v1/completions``       — legacy completions (+ ``/completion`` alias)
- ``POST /v1/embeddings``        — mean-pooled hidden-state embeddings
- ``GET  /v1/models``            — the single loaded model
- ``GET  /health``               — ok / loading status (public, like llama-server)
- ``GET  /props``                — engine/server properties
- ``POST /tokenize`` / ``/detokenize`` — vocab round-trips (llama-server native)
- ``POST /apply-template``       — render the chat template without generating
- ``GET  /slots``                — per-slot scheduler state
- ``POST /infill``               — fill-in-the-middle over the model's FIM tokens

Binds to localhost only by default; requires the per-session backend key for
``/v1/*`` when configured (the gateway injects it; reference security model
``start.sh:562-647``).
"""

from __future__ import annotations

import asyncio
import dataclasses
import hmac
import json
import os
import time
import uuid
from typing import Any

from ..runtime.sampler import SamplingParams
from .chat_template import normalize_messages, render_chat
from .http import (
    HttpLimitError,
    read_request,
    send_error,
    send_response,
    sse_event,
)


@dataclasses.dataclass
class BackendConfig:
    host: str = "127.0.0.1"
    port: int = 8080
    api_key: str = ""               # empty = no backend auth
    max_body: int = 10 * 1024 * 1024
    request_timeout: float = 600.0

    @staticmethod
    def from_env() -> "BackendConfig":
        key = os.environ.get("BACKEND_API_KEY", "")
        key_file = os.environ.get("BACKEND_API_KEY_FILE", "")
        if not key and key_file and os.path.exists(key_file):
            key = open(key_file).read().strip()
        return BackendConfig(
            host=os.environ.get("BACKEND_HOST", "127.0.0.1"),
            port=int(os.environ.get("PORT_BACKEND") or
                     os.environ.get("BACKEND_PORT") or 8080),
            api_key=key,
        )


def ctx_per_slot(ctx_total: int, max_slots: int, override: int = 0) -> int:
    """Per-slot KV capacity from the TOTAL context budget.

    CTX is the total budget, split evenly across continuous-batching slots —
    llama.cpp semantics (the reference's ``EXTRA_ARGS -c 16384 --parallel N``
    gives each server slot ``n_ctx / N``; reference docs/API_REFERENCE.md
    env table).  ``CTX_PER_SLOT`` overrides the division; a 256-token floor
    keeps degenerate CTX/MAX_SLOTS combinations serviceable.
    """
    if override > 0:
        return override
    return max(256, ctx_total // max(1, max_slots))


def _now() -> int:
    return int(time.time())


def _resolve_grammar(body: dict) -> str:
    """GBNF text for the request's constraint fields, '' when none.

    Honors llama-server's surface (reachable through the reference's
    verbatim proxy, reference ``scripts/gateway.py:807``): OpenAI
    ``response_format`` (json_object / json_schema), the native
    ``grammar`` (GBNF) and ``json_schema`` fields.  Raises ValueError
    (-> HTTP 400) on malformed schemas/grammars."""
    from ..grammar import JSON_GBNF, json_schema_to_gbnf, parse_gbnf

    if body.get("grammar"):
        g = str(body["grammar"])
        parse_gbnf(g)                    # validate here -> 400, not mid-decode
        return g
    if body.get("json_schema") is not None:
        return json_schema_to_gbnf(body["json_schema"])
    rf = body.get("response_format")
    if not rf:
        return ""
    if not isinstance(rf, dict):
        raise ValueError("response_format must be an object")
    rtype = rf.get("type", "text")
    if rtype == "text":
        return ""
    if rtype == "json_object":
        schema = rf.get("schema")        # llama.cpp extension
        return json_schema_to_gbnf(schema) if schema else JSON_GBNF
    if rtype == "json_schema":
        js = rf.get("json_schema") or {}
        schema = js.get("schema") if isinstance(js, dict) else None
        if schema is None:
            raise ValueError("response_format.json_schema.schema is required")
        return json_schema_to_gbnf(schema)
    raise ValueError(f"unsupported response_format type {rtype!r}")


def _parse_logit_bias(body: dict) -> dict[int, float] | None:
    lb = body.get("logit_bias")
    if not lb:
        return None
    out: dict[int, float] = {}
    if isinstance(lb, dict):             # OpenAI: {"token_id": bias}
        items = lb.items()
    elif isinstance(lb, list):           # llama.cpp: [[id, bias], ...]
        items = ((p[0], p[1]) for p in lb
                 if isinstance(p, (list, tuple)) and len(p) == 2)
    else:
        raise ValueError("logit_bias must be an object or a list of pairs")
    for k, v in items:
        try:
            out[int(k)] = -1e9 if v is False else float(v)
        except (TypeError, ValueError) as e:
            raise ValueError(f"bad logit_bias entry {k!r}: {v!r}") from e
    return out or None


def _params_from_request(body: dict, default_max: int = 256) -> SamplingParams:
    stop = body.get("stop") or ()
    if isinstance(stop, str):
        stop = (stop,)
    else:
        stop = tuple(str(s) for s in stop)
    seed = body.get("seed")
    max_tokens = body.get("max_tokens") or body.get("max_completion_tokens") \
        or body.get("n_predict") or default_max
    n_probs = 0
    if body.get("logprobs"):
        lp = body.get("logprobs")
        n_probs = int(body.get("top_logprobs") or
                      (lp if isinstance(lp, int) and not isinstance(lp, bool)
                       else 0))
        n_probs = max(n_probs, 1) if body.get("logprobs") else n_probs
    return SamplingParams(
        n_probs=min(n_probs, 8),
        temperature=float(body.get("temperature", 1.0)),
        top_p=float(body.get("top_p", 1.0)),
        top_k=int(body.get("top_k", 0)),
        min_p=float(body.get("min_p", 0.0)),
        typical_p=float(body.get("typical_p", 1.0)),
        presence_penalty=float(body.get("presence_penalty", 0.0)),
        frequency_penalty=float(body.get("frequency_penalty", 0.0)),
        repeat_penalty=float(body.get("repeat_penalty", 1.0)),
        mirostat=int(body.get("mirostat", 0)),
        mirostat_tau=float(body.get("mirostat_tau", 5.0)),
        mirostat_eta=float(body.get("mirostat_eta", 0.1)),
        seed=int(seed) if seed is not None else int.from_bytes(os.urandom(4), "little"),
        max_tokens=int(max_tokens),
        stop=stop,
        logit_bias=_parse_logit_bias(body),
        grammar=_resolve_grammar(body),
    )


class OpenAIServer:
    def __init__(self, engine, config: BackendConfig | None = None):
        self.engine = engine
        self.cfg = config or BackendConfig.from_env()
        self._server: asyncio.AbstractServer | None = None
        self.started = time.monotonic()

    # -- auth ----------------------------------------------------------------
    def _authorized(self, headers: dict[str, str]) -> bool:
        if not self.cfg.api_key:
            return True
        auth = headers.get("authorization", "")
        if auth.lower().startswith("bearer "):
            auth = auth[7:]
        return hmac.compare_digest(auth.strip().encode(), self.cfg.api_key.encode())

    # -- handlers ------------------------------------------------------------
    async def handle_client(self, reader: asyncio.StreamReader,
                            writer: asyncio.StreamWriter) -> None:
        try:
            try:
                req = await read_request(reader, max_body=self.cfg.max_body)
            except HttpLimitError as e:
                await send_error(writer, e.status, e.message,
                                 "invalid_request_error", e.code)
                return
            except (asyncio.IncompleteReadError, ConnectionError):
                return
            if req is None:
                return

            path = req.path.split("?", 1)[0]
            if path == "/health":
                await send_response(writer, 200, json.dumps(
                    {"status": "ok"}).encode())
                return
            if not self._authorized(req.headers):
                await send_error(writer, 401, "Invalid API key",
                                 "invalid_request_error", "invalid_api_key")
                return
            if path == "/props":
                await self.handle_props(writer)
            elif path == "/v1/models" and req.method == "GET":
                await self.handle_models(writer)
            elif path == "/v1/chat/completions" and req.method == "POST":
                await self.handle_chat(req, writer)
            elif path in ("/v1/completions", "/completion") and req.method == "POST":
                await self.handle_completions(req, writer)
            elif path == "/v1/embeddings" and req.method == "POST":
                await self.handle_embeddings(req, writer)
            elif path == "/tokenize" and req.method == "POST":
                await self.handle_tokenize(req, writer)
            elif path == "/detokenize" and req.method == "POST":
                await self.handle_detokenize(req, writer)
            elif path == "/apply-template" and req.method == "POST":
                await self.handle_apply_template(req, writer)
            elif path == "/slots" and req.method == "GET":
                await self.handle_slots(writer)
            elif path.startswith("/slots/") and req.method == "POST":
                await self.handle_slot_action(req, writer, path)
            elif path == "/infill" and req.method == "POST":
                await self.handle_infill(req, writer)
            elif path in ("/v1/rerank", "/rerank", "/v1/reranking") \
                    and req.method == "POST":
                await self.handle_rerank(req, writer)
            else:
                await send_error(writer, 404, f"Unknown endpoint {path}",
                                 "invalid_request_error", "not_found")
        except (ConnectionError, BrokenPipeError):
            pass
        finally:
            try:
                writer.close()
            except Exception:  # noqa: BLE001
                pass

    async def handle_props(self, writer) -> None:
        stats = self.engine.stats()
        await send_response(writer, 200, json.dumps({
            "model": self.engine.model_name,
            "uptime_seconds": round(time.monotonic() - self.started, 3),
            **stats,
        }).encode())

    async def handle_models(self, writer) -> None:
        body = json.dumps({
            "object": "list",
            "data": [{
                "id": self.engine.model_name,
                "object": "model",
                "created": _now(),
                "owned_by": "local",
            }],
        }).encode()
        await send_response(writer, 200, body)

    @staticmethod
    def _parse_json(req) -> dict | None:
        try:
            body = json.loads(req.body.decode("utf-8"))
            return body if isinstance(body, dict) else None
        except (json.JSONDecodeError, UnicodeDecodeError):
            return None

    async def handle_chat(self, req, writer) -> None:
        from .tool_calls import (
            ToolRequestError,
            prepare_messages,
            tool_grammar,
            validate_tools,
        )
        body = self._parse_json(req)
        if body is None or not isinstance(body.get("messages"), list):
            await send_error(writer, 400, "messages is required",
                             "invalid_request_error", "bad_request")
            return
        try:
            tools, forced, tools_on = validate_tools(body)
            messages = body["messages"]
            if tools_on or any(isinstance(m, dict)
                               and m.get("role") == "tool"
                               or (isinstance(m, dict) and m.get("tool_calls"))
                               for m in messages):
                messages = prepare_messages(messages, tools, tools_on)
            prompt = self._render_prompt(messages)
            params = _params_from_request(body)
            if tools_on and forced is not None:
                if params.grammar:
                    raise ToolRequestError(
                        "grammar/response_format cannot be combined with a "
                        "forced tool_choice")
                params = dataclasses.replace(
                    params, grammar=tool_grammar(tools, forced))
        except ValueError as e:          # includes ToolRequestError
            await send_error(writer, 400, str(e), "invalid_request_error",
                             "bad_request")
            return
        rid = "chatcmpl-" + uuid.uuid4().hex[:24]
        active_tools = tools if tools_on else None
        n = self._parse_n(body)
        if n is None:
            await send_error(writer, 400, "n must be an integer in [1, 8]",
                             "invalid_request_error", "bad_request")
            return
        if n > 1 and active_tools:
            await send_error(writer, 400, "n > 1 cannot be combined with "
                             "tools", "invalid_request_error", "bad_request")
            return
        if body.get("stream"):
            await self._stream(writer, rid, "chat.completion.chunk", prompt,
                               params, chat=True,
                               include_usage=bool(
                                   (body.get("stream_options") or {}).get("include_usage")),
                               tools=active_tools, n=n)
        else:
            await self._complete(writer, rid, "chat.completion", prompt, params,
                                 chat=True, tools=active_tools, n=n)

    async def handle_completions(self, req, writer) -> None:
        body = self._parse_json(req)
        if body is None or "prompt" not in body:
            await send_error(writer, 400, "prompt is required",
                             "invalid_request_error", "bad_request")
            return
        prompt = body["prompt"]
        if isinstance(prompt, list):
            prompt = "".join(str(p) for p in prompt)
        try:
            params = _params_from_request(body)
        except ValueError as e:
            await send_error(writer, 400, str(e), "invalid_request_error",
                             "bad_request")
            return
        rid = "cmpl-" + uuid.uuid4().hex[:24]
        n = self._parse_n(body)
        if n is None:
            await send_error(writer, 400, "n must be an integer in [1, 8]",
                             "invalid_request_error", "bad_request")
            return
        if body.get("stream"):
            await self._stream(writer, rid, "text_completion", prompt, params,
                               chat=False,
                               include_usage=bool(
                                   (body.get("stream_options") or {}).get("include_usage")),
                               n=n)
        else:
            await self._complete(writer, rid, "text_completion", prompt, params,
                                 chat=False, n=n)

    async def handle_embeddings(self, req, writer) -> None:
        body = self._parse_json(req)
        if body is None or "input" not in body:
            await send_error(writer, 400, "input is required",
                             "invalid_request_error", "bad_request")
            return
        inputs = body["input"]
        if isinstance(inputs, str):
            inputs = [inputs]
        loop = asyncio.get_running_loop()
        data = []
        total_tokens = 0
        for i, text in enumerate(inputs):
            vec, n_tok = await loop.run_in_executor(
                None, self.engine.embed, str(text))
            total_tokens += n_tok
            data.append({"object": "embedding", "embedding": vec, "index": i})
        await send_response(writer, 200, json.dumps({
            "object": "list",
            "data": data,
            "model": self.engine.model_name,
            "usage": {"prompt_tokens": total_tokens, "total_tokens": total_tokens},
        }).encode())

    async def handle_rerank(self, req, writer) -> None:
        """llama-server ``/v1/rerank`` (native surface the reference reaches
        via passthrough + EXTRA_ARGS ``--rerank``, reference
        ``scripts/start.sh:490-494``).  Without a cross-encoder rank head
        (no GGUF this engine loads ships one), scores are cosine
        similarities of mean-pooled final-hidden-state embeddings — the
        pooling-model path over the same machinery as /v1/embeddings.
        Engines without embedding support get a clean 501."""
        body = self._parse_json(req)
        if body is None or "query" not in body:
            await send_error(writer, 400, "query is required",
                             "invalid_request_error", "bad_request")
            return
        docs = body.get("documents", body.get("texts"))
        if not isinstance(docs, list) or not docs:
            await send_error(writer, 400,
                             "documents must be a non-empty array",
                             "invalid_request_error", "bad_request")
            return
        if not hasattr(self.engine, "embed"):
            await send_error(writer, 501,
                             "this model cannot rerank (no embedding path)",
                             "server_error", "not_supported")
            return
        import math
        loop = asyncio.get_running_loop()
        qv, q_tok = await loop.run_in_executor(
            None, self.engine.embed, str(body["query"]))
        qn = math.sqrt(sum(x * x for x in qv)) or 1.0
        results = []
        total = q_tok
        for i, doc in enumerate(docs):
            dv, n_tok = await loop.run_in_executor(
                None, self.engine.embed, str(doc))
            total += n_tok
            dn = math.sqrt(sum(x * x for x in dv)) or 1.0
            score = sum(a * b for a, b in zip(qv, dv)) / (qn * dn)
            results.append({"index": i, "relevance_score": score})
        results.sort(key=lambda r: -r["relevance_score"])
        top_n = body.get("top_n")
        if isinstance(top_n, int) and top_n > 0:
            results = results[:top_n]
        await send_response(writer, 200, json.dumps({
            "model": self.engine.model_name,
            "object": "list",
            "usage": {"prompt_tokens": total, "total_tokens": total},
            "results": results,
        }).encode())

    def _render_prompt(self, messages: list) -> str:
        """Chat-template rendering shared by /v1/chat/completions and
        /apply-template (GGUF jinja template, chatml fallback)."""
        msgs = normalize_messages(messages)
        template = None
        md = getattr(self.engine, "metadata", None)
        if md:
            template = md.get("tokenizer.chat_template")
        tok = self.engine.tokenizer
        bos = tok.tokens[tok.special.bos_id] if getattr(tok, "tokens", None) \
            and tok.special.bos_id >= 0 else "<s>"
        eos = tok.tokens[tok.special.eos_id] if getattr(tok, "tokens", None) \
            and tok.special.eos_id >= 0 else "</s>"
        return render_chat(msgs, template, bos, eos)

    # -- llama-server-native utility endpoints --------------------------------
    # (the reference proxies ANY path to llama-server — SURVEY §2.1
    # "passthrough"; these are the non-/v1 endpoints its clients rely on)

    async def handle_tokenize(self, req, writer) -> None:
        body = self._parse_json(req)
        if body is None or "content" not in body:
            await send_error(writer, 400, "content is required",
                             "invalid_request_error", "bad_request")
            return
        tok = self.engine.tokenizer
        add_special = bool(body.get("add_special", False))
        ids = tok.encode(str(body["content"]), add_bos=add_special)
        if body.get("with_pieces"):
            tokens = [{"id": i, "piece": tok.piece(i)} for i in ids]
        else:
            tokens = ids
        await send_response(writer, 200,
                            json.dumps({"tokens": tokens}).encode())

    async def handle_detokenize(self, req, writer) -> None:
        body = self._parse_json(req)
        if body is None or not isinstance(body.get("tokens"), list):
            await send_error(writer, 400, "tokens is required",
                             "invalid_request_error", "bad_request")
            return
        tok = self.engine.tokenizer
        vocab = getattr(tok, "vocab_size", None)
        try:
            ids = [int(t) for t in body["tokens"]]
        except (TypeError, ValueError):
            await send_error(writer, 400, "tokens must be integers",
                             "invalid_request_error", "bad_request")
            return
        if vocab is not None and any(not 0 <= t < vocab for t in ids):
            await send_error(writer, 400, "token id out of range",
                             "invalid_request_error", "bad_request")
            return
        await send_response(writer, 200, json.dumps(
            {"content": tok.decode(ids)}).encode())

    async def handle_apply_template(self, req, writer) -> None:
        body = self._parse_json(req)
        if body is None or not isinstance(body.get("messages"), list):
            await send_error(writer, 400, "messages is required",
                             "invalid_request_error", "bad_request")
            return
        await send_response(writer, 200, json.dumps(
            {"prompt": self._render_prompt(body["messages"])}).encode())

    async def handle_slots(self, writer) -> None:
        info = getattr(self.engine, "slots_info", None)
        slots = info() if callable(info) else []
        await send_response(writer, 200, json.dumps(slots).encode())

    async def handle_slot_action(self, req, writer, path: str) -> None:
        """``POST /slots/{id}?action=save|restore|erase`` (llama-server
        slot prompt-cache persistence).  save/restore write/read
        ``SLOT_SAVE_PATH/<filename>`` (the ``--slot-save-path`` contract:
        without it configured the actions are rejected); erase drops the
        slot's cached-prompt claim."""
        from urllib.parse import parse_qs, urlparse

        sid = path[len("/slots/"):]
        if not sid.isdigit():
            await send_error(writer, 400, "slot id must be an integer",
                             "invalid_request_error", "bad_request")
            return
        q = parse_qs(urlparse(req.path).query)
        action = (q.get("action") or [""])[0]
        if action not in ("save", "restore", "erase"):
            await send_error(writer, 400,
                             "action must be save, restore or erase",
                             "invalid_request_error", "bad_request")
            return
        op_fn = getattr(self.engine, "slot_op", None)
        if not callable(op_fn):
            await send_error(writer, 501, "slot persistence is not "
                             "supported by this backend", "server_error",
                             "not_implemented")
            return
        full = ""
        if action != "erase":
            base = os.environ.get("SLOT_SAVE_PATH", "")
            if not base:
                await send_error(writer, 400, "slot save/restore requires "
                                 "SLOT_SAVE_PATH (llama-server "
                                 "--slot-save-path)", "invalid_request_error",
                                 "bad_request")
                return
            body = self._parse_json(req) or {}
            fname = os.path.basename(str(body.get("filename") or ""))
            if not fname:
                await send_error(writer, 400, "filename is required",
                                 "invalid_request_error", "bad_request")
                return
            full = os.path.join(base, fname)
        loop = asyncio.get_running_loop()
        try:
            out = await loop.run_in_executor(
                None, lambda: op_fn(action, int(sid), full))
        except ValueError as e:
            await send_error(writer, 400, str(e), "invalid_request_error",
                             "bad_request")
            return
        except FileNotFoundError:
            await send_error(writer, 400, "no such slot file",
                             "invalid_request_error", "bad_request")
            return
        await send_response(writer, 200, json.dumps(out).encode())

    async def handle_infill(self, req, writer) -> None:
        """Fill-in-the-middle completion (llama.cpp /infill): PSM order
        ``<fim_pre> prefix <fim_suf> suffix <fim_mid>`` using the model's
        FIM special tokens from GGUF metadata."""
        body = self._parse_json(req)
        if body is None or "input_prefix" not in body:
            await send_error(writer, 400, "input_prefix is required",
                             "invalid_request_error", "bad_request")
            return
        tok = self.engine.tokenizer
        sp = getattr(tok, "special", None)
        fim_pre = getattr(sp, "fim_pre_id", -1)
        fim_suf = getattr(sp, "fim_suf_id", -1)
        fim_mid = getattr(sp, "fim_mid_id", -1)
        if fim_pre < 0 or fim_suf < 0 or fim_mid < 0:
            await send_error(writer, 501,
                             "model has no fill-in-the-middle tokens",
                             "invalid_request_error", "not_supported")
            return
        prefix = str(body.get("input_prefix", ""))
        suffix = str(body.get("input_suffix", ""))
        ids = []
        if sp.bos_id >= 0 and sp.add_bos:
            ids.append(sp.bos_id)
        ids += [fim_pre]
        ids += tok.encode(prefix, add_bos=False)
        ids += [fim_suf]
        ids += tok.encode(suffix, add_bos=False)
        ids += [fim_mid]
        try:
            params = _params_from_request(body)
        except ValueError as e:
            await send_error(writer, 400, str(e), "invalid_request_error",
                             "bad_request")
            return
        rid = "infill-" + uuid.uuid4().hex[:24]
        if body.get("stream"):
            await self._stream(writer, rid, "text_completion", ids, params,
                               chat=False)
        else:
            await self._complete(writer, rid, "text_completion", ids, params,
                                 chat=False)

    # -- generation plumbing -------------------------------------------------
    @staticmethod
    def _parse_n(body: dict) -> int | None:
        """OpenAI ``n`` (choices per request), capped at 8 fan-out slots.
        Returns None on invalid values (-> 400)."""
        n = body.get("n", 1)
        if n is None:
            return 1
        if isinstance(n, bool) or not isinstance(n, int) or not 1 <= n <= 8:
            return None
        return n

    def _cancel_pres(self, pres: list) -> None:
        """Cancel pre-submitted fan-out choices that will never drain
        (early error return) so their slots free immediately."""
        for rid, _out in pres:
            if hasattr(self.engine, "cancel"):
                self.engine.cancel(rid)

    @staticmethod
    def _fanout_params(params: SamplingParams, n: int) -> list[SamplingParams]:
        """Per-choice params for OpenAI ``n``: each choice samples with a
        distinct seed derived from the request seed (choice 0 keeps it, so
        n=1 behavior is unchanged and seeded requests stay reproducible)."""
        return [params if i == 0 else
                dataclasses.replace(params,
                                    seed=(params.seed + i) & 0xFFFFFFFF)
                for i in range(n)]

    async def _collect(self, prompt: str, params: SamplingParams, pre=None):
        """Run a generation on the engine, draining its thread-safe queue
        without blocking the event loop.  On consumer error (client gone),
        the request is cancelled so the engine frees the slot.  ``pre``
        carries an already-submitted (rid, queue) pair — the n>1 fan-out
        submits every choice up front so they decode concurrently in the
        continuous batch."""
        loop = asyncio.get_running_loop()
        rid, out = pre if pre is not None else self.engine.submit(prompt, params)
        finished = False
        try:
            while True:
                ev = await loop.run_in_executor(None, out.get)
                if ev.finished:
                    finished = True
                yield ev
                if finished:
                    return
        finally:
            if not finished and hasattr(self.engine, "cancel"):
                # generator closed early (client disconnect mid-stream)
                self.engine.cancel(rid)

    def _lp_entry(self, ev) -> dict:
        tok = self.engine.tokenizer
        entry = {
            "token": ev.text,
            "logprob": ev.logprob if ev.logprob is not None else 0.0,
            "bytes": list(ev.text.encode("utf-8")),
            "top_logprobs": [
                {"token": tok.piece(i), "logprob": lp,
                 "bytes": list(tok.piece(i).encode("utf-8"))}
                for i, lp in (ev.top_logprobs or [])
            ],
        }
        return entry

    async def _complete(self, writer, rid: str, obj: str, prompt: str,
                        params: SamplingParams, chat: bool,
                        tools: list | None = None, n: int = 1) -> None:
        fan = self._fanout_params(params, n)
        pres = [self.engine.submit(prompt, p) for p in fan]
        choices = []
        usage_prompt = usage_gen = 0
        # exception safety (client gone mid-drain): _collect's finally
        # cancels the CURRENT choice; the except arm cancels the
        # not-yet-drained rest so their slots free immediately instead of
        # decoding to max_tokens for nobody
        active_idx = 0
        try:
            for idx, (p_i, pre) in enumerate(zip(fan, pres)):
                active_idx = idx
                text = []
                lp_content = []
                finish = "stop"
                n_prompt = n_gen = 0
                async for ev in self._collect(prompt, p_i, pre=pre):
                    text.append(ev.text)
                    n_prompt, n_gen = ev.n_prompt, ev.n_generated
                    if params.n_probs > 0:
                        lp_content.append(self._lp_entry(ev))
                    if ev.finished:
                        finish = ev.finish_reason or "stop"
                if finish == "error":
                    # a dead engine must surface as 5xx, not a 200 with an
                    # empty body (reference clients see 502/504 here)
                    self._cancel_pres(pres[idx + 1:])
                    await send_error(writer, 500, "inference engine failure",
                                     "server_error", "engine_error")
                    return
                usage_prompt = n_prompt
                usage_gen += n_gen
                content = "".join(text)
                if chat:
                    calls = None
                    if tools:
                        from .tool_calls import parse_tool_calls
                        calls = parse_tool_calls(content, tools)
                    if calls:
                        choice = {"index": idx,
                                  "message": {"role": "assistant",
                                              "content": None,
                                              "tool_calls": calls},
                                  "finish_reason": "tool_calls"}
                    else:
                        choice = {"index": idx,
                                  "message": {"role": "assistant",
                                              "content": content},
                                  "finish_reason": finish}
                    if params.n_probs > 0:
                        choice["logprobs"] = {"content": lp_content}
                else:
                    choice = {"index": idx, "text": content,
                              "finish_reason": finish, "logprobs": None}
                    if params.n_probs > 0:
                        choice["logprobs"] = {
                            "tokens": [e["token"] for e in lp_content],
                            "token_logprobs": [e["logprob"]
                                               for e in lp_content],
                            "top_logprobs": [
                                {t["token"]: t["logprob"]
                                 for t in e["top_logprobs"]}
                                for e in lp_content],
                        }
                choices.append(choice)
        except BaseException:
            self._cancel_pres(pres[active_idx + 1:])
            raise
        await send_response(writer, 200, json.dumps({
            "id": rid, "object": obj, "created": _now(),
            "model": self.engine.model_name,
            "choices": choices,
            "usage": {"prompt_tokens": usage_prompt,
                      "completion_tokens": usage_gen,
                      "total_tokens": usage_prompt + usage_gen},
        }).encode())

    async def _stream(self, writer, rid: str, obj: str, prompt: str,
                      params: SamplingParams, chat: bool,
                      include_usage: bool = False,
                      tools: list | None = None, n: int = 1) -> None:
        head = ("HTTP/1.1 200 OK\r\n"
                "Content-Type: text/event-stream\r\n"
                "Cache-Control: no-cache\r\n"
                "Connection: close\r\n\r\n").encode()
        head_sent = False

        async def ensure_head():
            nonlocal head_sent
            if not head_sent:
                head_sent = True
                writer.write(head)
                await writer.drain()

        def chunk(delta: dict | None, finish: str | None,
                  idx: int = 0) -> dict:
            c: dict[str, Any] = {"index": idx, "finish_reason": finish}
            if chat:
                c["delta"] = delta if delta is not None else {}
            else:
                c["text"] = (delta or {}).get("content", "")
            return {"id": rid, "object": obj, "created": _now(),
                    "model": self.engine.model_name, "choices": [c]}

        usage_prompt = usage_gen = 0
        # n>1 fan-out: every choice is submitted up front (they decode
        # concurrently in the continuous batch); streams drain in index
        # order — OpenAI clients route chunks by choices[].index
        fan = self._fanout_params(params, n)
        pres = [self.engine.submit(prompt, p) for p in fan]

        async def stream_one(idx: int, p_i, pre) -> bool:
            nonlocal usage_prompt, usage_gen
            n_prompt = n_gen = 0
            finish = "stop"
            first = True
            # tools mode: hold text back while it still LOOKS like a
            # tool-call JSON object (llama-server's generic handler has the
            # same buffer-then-decide shape); the moment the prefix can't
            # be one, flush and stream normally — plain answers keep live
            # streaming.
            buffering = bool(tools) and chat
            buf: list = []      # buffered EVENTS (text + logprobs), so a
            #                     flush can replay the logprobs-aware path

            async def emit_text(txt: str, ev=None) -> None:
                nonlocal first
                await ensure_head()
                if first and chat:
                    first = False
                    writer.write(sse_event(
                        chunk({"role": "assistant"}, None, idx)))
                    await writer.drain()
                if txt:
                    c = chunk({"content": txt}, None, idx)
                    if ev is not None and chat and params.n_probs > 0:
                        c["choices"][0]["logprobs"] = {
                            "content": [self._lp_entry(ev)]}
                    writer.write(sse_event(c))
                    await writer.drain()

            async for ev in self._collect(prompt, p_i, pre=pre):
                n_prompt, n_gen = ev.n_prompt, ev.n_generated
                if ev.finished:
                    finish = ev.finish_reason or "stop"
                if ev.finished and finish == "error" and not head_sent:
                    # engine died before any byte was streamed: a real 5xx
                    # is still possible — take it (reference: 502 here)
                    await send_error(writer, 500, "inference engine failure",
                                     "server_error", "engine_error")
                    return False
                if buffering:
                    buf.append(ev)
                    lead = "".join(e.text for e in buf).lstrip()
                    if lead and lead[0] not in "{`":
                        # not a tool call: replay each held event through
                        # the logprobs-aware emit so per-token logprobs
                        # survive (r4 advisor finding)
                        buffering = False
                        for e in buf:
                            await emit_text(e.text, e)
                        buf.clear()
                    continue
                await emit_text(ev.text, ev)
            if buf or (bool(tools) and chat and finish != "error"):
                content = "".join(e.text for e in buf)
                from .tool_calls import parse_tool_calls
                calls = parse_tool_calls(content, tools) if content else None
                if calls:
                    await ensure_head()
                    writer.write(sse_event(
                        chunk({"role": "assistant"}, None, idx)))
                    for i, call in enumerate(calls):
                        writer.write(sse_event(chunk({"tool_calls": [{
                            "index": i, "id": call["id"], "type": "function",
                            "function": {"name": call["function"]["name"],
                                         "arguments": ""}}]}, None, idx)))
                        writer.write(sse_event(chunk({"tool_calls": [{
                            "index": i,
                            "function": {"arguments":
                                         call["function"]["arguments"]}}]},
                            None, idx)))
                    await writer.drain()
                    finish = "tool_calls"
                elif content:
                    for e in buf:
                        await emit_text(e.text, e)
            await ensure_head()
            if finish == "error":
                # mid-stream failure: status line is gone — emit an SSE
                # error event (llama.cpp behavior) and close WITHOUT [DONE]
                writer.write(sse_event({"error": {
                    "message": "inference engine failure",
                    "type": "server_error", "code": "engine_error"}}))
                await writer.drain()
                return False
            writer.write(sse_event(chunk(None, finish, idx)))
            usage_prompt = n_prompt
            usage_gen += n_gen
            return True

        active_idx = 0
        try:
            for idx, (p_i, pre) in enumerate(zip(fan, pres)):
                active_idx = idx
                if not await stream_one(idx, p_i, pre):
                    self._cancel_pres(pres[idx + 1:])
                    return
        except BaseException:
            # client disconnect mid-stream: free the undrained choices
            self._cancel_pres(pres[active_idx + 1:])
            raise
        if include_usage:
            writer.write(sse_event({
                "id": rid, "object": obj, "created": _now(),
                "model": self.engine.model_name, "choices": [],
                "usage": {"prompt_tokens": usage_prompt,
                          "completion_tokens": usage_gen,
                          "total_tokens": usage_prompt + usage_gen},
            }))
        writer.write(sse_event("[DONE]"))
        await writer.drain()

    # -- lifecycle -----------------------------------------------------------
    async def start(self) -> None:
        self._server = await asyncio.start_server(
            self.handle_client, self.cfg.host, self.cfg.port)

    async def serve_forever(self) -> None:
        if self._server is None:
            await self.start()
        assert self._server is not None
        async with self._server:
            await self._server.serve_forever()

    async def close(self) -> None:
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
            self._server = None

    @property
    def port(self) -> int:
        if self._server and self._server.sockets:
            return self._server.sockets[0].getsockname()[1]
        return self.cfg.port


# GGUF architectures served by the encoder (embedding-only) engine —
# llama-server's --embedding mode (reference start.sh:490-494 EXTRA_ARGS)
ENCODER_ARCHES = ("bert",)


def _gguf_arch(model_path: str) -> str:
    from ..gguf.reader import GGUFReader
    reader = GGUFReader(model_path)
    try:
        return str(reader.metadata.get("general.architecture", "llama"))
    finally:
        reader.close()


def build_engine_from_env():
    """Engine selection from the environment: mock (no model), encoder
    (bert-family embedding GGUF), or the decoder InferenceEngine.
    Multi-host wrapping stays in main() (followers never serve)."""
    model_path = os.environ.get("MODEL_PATH", "")
    mock = os.environ.get("MOCK_BACKEND", "").lower() in ("1", "true", "yes")
    if mock or not model_path:
        from ..runtime.mock import MockEngine
        return MockEngine(
            model_name=os.environ.get("MODEL_NAME", "mock-model"),
            # per-token delay: lets black-box queue tests hold a slot open
            delay_s=float(os.environ.get("MOCK_DELAY_S", "0") or 0))
    if _gguf_arch(model_path) in ENCODER_ARCHES:
        from ..runtime.encoder_engine import EncoderEngine
        print(f"[backend] encoder architecture: embedding-only mode "
              f"(llama-server --embedding equivalent)", flush=True)
        return EncoderEngine(model_path)
    return _build_decoder_engine(model_path)


def _build_decoder_engine(model_path: str):
    import jax.numpy as jnp

    from ..runtime.engine import EngineConfig, InferenceEngine
    kv = os.environ.get("KV_CACHE_TYPE", "bf16").lower()
    if kv in ("q5_0", "q5_1"):
        # llama-server accepts 5-bit cache types; TPUs have no
        # efficient sub-byte layout between 4 and 8 bits, so honor the
        # config at the next precision up rather than failing the boot
        print(f"[backend] KV_CACHE_TYPE={kv} has no TPU layout; "
              "using q8_0 (use q4_1 for a smaller cache)", flush=True)
        kv = "q8_0"
    max_slots = int(os.environ.get("MAX_SLOTS", 4))
    ctx_slot = ctx_per_slot(int(os.environ.get("CTX", 16384)), max_slots,
                            int(os.environ.get("CTX_PER_SLOT", 0)))
    ecfg = EngineConfig(
        max_slots=max_slots,
        ctx=ctx_slot,
        kv_dtype=kv if kv in ("q8_0", "q4_0", "q4_1") else jnp.bfloat16,
        multi_step=int(os.environ.get("MULTI_STEP", 1)),
        tp=int(os.environ.get("TP", 1)),
        dp=int(os.environ.get("DP", 1)),
        # KV_LAYOUT=paged: slots share one page pool (llama.cpp
        # unified-KV semantics) — a single request may use the whole
        # CTX budget when other slots are idle
        kv_layout=os.environ.get("KV_LAYOUT", "contig").lower(),
        kv_page_size=int(os.environ.get("KV_PAGE_SIZE", 1024)),
        prefix_cache=os.environ.get("PREFIX_CACHE", "true").lower()
        not in ("0", "false", "no"),
        # speculative decoding (llama-server --model-draft equivalent;
        # SPEC_NGRAM enables the draft-free lookup variant)
        draft_model=os.environ.get("DRAFT_MODEL", ""),
        spec_tokens=int(os.environ.get("SPEC_TOKENS", 5)),
        spec_ngram=os.environ.get("SPEC_NGRAM", "").lower()
        in ("1", "true", "yes"),
        spec_min_accept=float(os.environ.get("SPEC_MIN_ACCEPT", 0.2)),
        # CTX_SHIFT=1: llama-server --ctx-shift (continue generating
        # past the KV capacity by discarding the oldest window)
        ctx_shift=os.environ.get("CTX_SHIFT", "").lower()
        in ("1", "true", "yes"),
        # GGUF LoRA adapter (llama-server --lora / --lora-scaled)
        lora_path=os.environ.get("LORA_PATH", ""),
        lora_scale=float(os.environ.get("LORA_SCALE", 1.0)),
    )
    return InferenceEngine(model_path, ecfg)


def main() -> None:
    from ..utils.platform import apply_platform_env
    apply_platform_env()
    model_path = os.environ.get("MODEL_PATH", "")
    mock = os.environ.get("MOCK_BACKEND", "").lower() in ("1", "true", "yes")
    if mock or not model_path or _gguf_arch(model_path) in ENCODER_ARCHES:
        engine = build_engine_from_env()
    else:
        from ..parallel import multihost
        distributed = multihost.initialize_from_env()
        engine = _build_decoder_engine(model_path)
        if distributed:
            engine = multihost.MultiHostEngine(engine)
            if not multihost.serving_host():
                # workers never expose sockets: replay leader commands
                # until shutdown (reference localhost-only invariant
                # translated to pods — SURVEY §5.8)
                print(f"[backend] follower host {multihost.jax.process_index()}"
                      f" joined; replaying leader ops", flush=True)
                engine.run_follower()
                return
    engine.start()
    # compile all serving graphs in the background (ENGINE_WARMUP=0 to
    # skip): first real requests then never pay a Mosaic compile
    if not mock and os.environ.get("ENGINE_WARMUP", "1").lower() \
            not in ("0", "false", "no") and hasattr(engine, "warmup_async"):
        engine.warmup_async()
    srv = OpenAIServer(engine)
    print(f"[backend] {engine.model_name} on {srv.cfg.host}:{srv.cfg.port} "
          f"(auth={'on' if srv.cfg.api_key else 'off'})", flush=True)
    try:
        asyncio.run(srv.serve_forever())
    finally:
        engine.stop()


if __name__ == "__main__":
    main()
