"""Multi-host bring-up (SURVEY.md §5.8 / §7 step 8).

Single entry point wrapping ``jax.distributed.initialize`` plus the serving
topology invariant from the reference's security model translated to pods:
**only host 0 exposes sockets**; workers join the mesh and execute the same
jitted steps via SPMD — the gateway/backend HTTP shell runs on host 0 only,
and request batches reach workers through the sharded program itself (XLA
moves tokens over ICI/DCN; no application-level RPC).

Environment (standard JAX coordination):
    JAX_COORDINATOR_ADDRESS  host0:port   (required on all hosts)
    JAX_NUM_PROCESSES        N
    JAX_PROCESS_ID           0..N-1

Round-1 status: initialization + mesh construction are wired and the sharded
engine is tested on a virtual mesh (tests/test_parallel.py); real multi-host
serving (host-0 socket ownership + per-host engine loop lockstep) is staged
for the next round — the missing piece is a broadcast of admitted request
batches so every host traces the same step sequence.
"""

from __future__ import annotations

import os

import jax


def initialize_from_env() -> bool:
    """Join the jax.distributed cluster if coordination env vars are set.

    Returns True when running multi-host (process_count > 1).
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    return jax.process_count() > 1


def is_host0() -> bool:
    return jax.process_index() == 0


def serving_host() -> bool:
    """Only host 0 binds gateway/backend/health sockets (reference invariant:
    workers never expose ports — start.sh localhost-bind check, SURVEY §5.8)."""
    return is_host0()
