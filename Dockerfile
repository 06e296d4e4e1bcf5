# TPU serving image.
#
# Mirrors the reference's container contract (reference Dockerfile: selective
# runtime copy, non-root user, HEALTHCHECK via stdlib, VERSION stamp) but the
# inference backend is this repo's own TPU engine instead of a prebuilt
# llama-server binary.  Base: a JAX TPU image (libtpu included); override
# BASE_IMAGE for a specific release.
ARG BASE_IMAGE=python:3.11-slim
FROM ${BASE_IMAGE}

ARG GIT_SHA=unknown
ARG VERSION=0.1.0

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ curl ca-certificates \
    && rm -rf /var/lib/apt/lists/*

# jax[tpu] when building for real TPU hosts; CPU jax otherwise (see
# Dockerfile.cpu). Pinned loosely — the engine supports jax >= 0.9.
ARG JAX_SPEC="jax[tpu]>=0.9 -f https://storage.googleapis.com/jax-releases/libtpu_releases.html"
RUN pip install --no-cache-dir ${JAX_SPEC} jinja2

WORKDIR /app

# selective copy: runtime package + entrypoints only (no tests/docs)
COPY llama_gguf_inference_tpu /app/llama_gguf_inference_tpu
COPY bench.py /app/bench.py
RUN python -m compileall -q /app/llama_gguf_inference_tpu \
    && echo "${VERSION} ${GIT_SHA}" > /app/VERSION \
    # pre-build the native repacker so cold start skips the g++ run
    && python -c "from llama_gguf_inference_tpu.native import load_library; load_library()"

# non-root runtime user (reference SEC-08)
RUN useradd --system --create-home --shell /usr/sbin/nologin inference \
    && mkdir -p /data/logs /data/models \
    && chown -R inference:inference /data /app
USER inference

ENV DATA_DIR=/data \
    GATEWAY_PORT=8000 \
    PORT_HEALTH=8001 \
    PORT_BACKEND=8080 \
    CTX=16384 \
    PYTHONUNBUFFERED=1

EXPOSE 8000 8001

HEALTHCHECK --interval=30s --timeout=5s --start-period=90s --retries=3 \
    CMD python -c "import urllib.request,sys; \
        sys.exit(0 if urllib.request.urlopen('http://127.0.0.1:8000/ping', timeout=3).status==200 else 1)"

ENTRYPOINT ["python", "-m", "llama_gguf_inference_tpu.launch.start"]
