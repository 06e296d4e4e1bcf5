# Developer entry points (reference Makefile counterpart).
PY ?= python

.PHONY: test test-shell lint bench docker docker-cpu mock clean

test:
	$(PY) -m pytest tests/ -q

test-shell:
	bash scripts/tests/test_runner.sh

lint:
	ruff check llama_gguf_inference_tpu tests || true

bench:
	$(PY) bench.py

docker:
	docker build -t llama-gguf-inference-tpu .

docker-cpu:
	docker build -f Dockerfile.cpu -t llama-gguf-inference-tpu:cpu .

# boot the full stack with no model (control-plane smoke test)
mock:
	MOCK_BACKEND=true DATA_DIR=/tmp/lgt-mock JAX_PLATFORMS=cpu \
	    $(PY) -m llama_gguf_inference_tpu.launch.start

clean:
	rm -rf llama_gguf_inference_tpu/native/_build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
