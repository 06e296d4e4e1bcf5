"""Driver for the multi-host lockstep test (spawned by test_multihost.py).

Usage: python mh_driver.py <pid> <nprocs> <coord_port> <model_path> <mode>

mode "multi":  join jax.distributed; host 0 runs the MultiHostEngine
               leader, submits two overlapping requests (exercising the
               ADMIT/DECODE command interleave) and one HTTP request
               against a real OpenAIServer socket; workers replay.
mode "single": same requests on a plain engine (tp = all local devices) —
               the token-identity reference.

Host 0 / single mode prints one line: TOKENS <json>.
"""

import json
import os
import sys


def main() -> int:
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, model, mode = sys.argv[3], sys.argv[4], sys.argv[5]

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    if mode == "multi":
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=nprocs, process_id=pid)

    from llama_gguf_inference_tpu.parallel.multihost import MultiHostEngine
    from llama_gguf_inference_tpu.runtime.engine import (
        EngineConfig, InferenceEngine,
    )
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    variant = sys.argv[6] if len(sys.argv) > 6 else "base"
    tp = len(jax.devices())
    kw = dict(kv_layout="paged", kv_page_size=16) if variant == "paged" else {}
    eng = InferenceEngine(model, EngineConfig(
        max_slots=2, ctx=128, prefill_buckets=(16, 32), tp=tp, dp=1, **kw))

    if mode == "multi":
        mh = MultiHostEngine(eng)
        if jax.process_index() != 0:
            mh.run_follower()
            return 0
        engine = mh
    else:
        engine = eng

    engine.start()
    p = SamplingParams(temperature=0.0, max_tokens=10, seed=0)
    # the request mix exercises the full broadcast surface: plain greedy,
    # logit_bias (rides lb_tok/lb_val), and grammar-constrained decode
    # (GBNF in the ADMIT command; per-step gflush matcher advances)
    reqs = [
        ([1, 5, 9, 13, 17], p),
        ([1, 4, 8, 12], SamplingParams(temperature=0.0, max_tokens=10,
                                       logit_bias={55: 1e4, 7: 2.5})),
        ([1, 6, 2], SamplingParams(
            temperature=0.0, max_tokens=12, seed=0,
            grammar='root ::= "{" "\\"a\\"" ":" [0-9] [0-9] "}"')),
    ]
    outs = [engine.submit(ids, pr)[1] for ids, pr in reqs]
    tokens = []
    for out in outs:
        toks = []
        while True:
            ev = out.get(timeout=300)
            if ev.token_id >= 0:
                toks.append(ev.token_id)
            if ev.finished:
                break
        tokens.append(toks)

    http_status = None
    if mode == "multi":
        # real HTTP on host 0 only (reference invariant: workers never
        # expose sockets)
        import asyncio
        import threading
        import urllib.request

        from llama_gguf_inference_tpu.serving.openai_server import (
            BackendConfig, OpenAIServer,
        )

        srv = OpenAIServer(engine, BackendConfig(host="127.0.0.1", port=0))
        loop = asyncio.new_event_loop()

        async def boot():
            await srv.start()

        loop.run_until_complete(boot())
        t = threading.Thread(target=loop.run_forever, daemon=True)
        t.start()
        body = json.dumps({"prompt": "hello", "max_tokens": 4,
                           "temperature": 0}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            http_status = r.status
            json.loads(r.read())
        # embeddings ride the command channel too
        vec, n_tok = engine.embed([1, 5, 9])
        assert len(vec) > 0 and n_tok == 3
        loop.call_soon_threadsafe(loop.stop)

    engine.stop()
    print("TOKENS " + json.dumps({"tokens": tokens, "http": http_status}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
