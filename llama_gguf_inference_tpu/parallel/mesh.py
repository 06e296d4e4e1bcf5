"""Device mesh construction for TP/DP (and future EP/SP) sharding.

The reference has no model parallelism (SURVEY.md §2.13 — its only
concurrency is a gateway semaphore).  The TPU-native design scales by
sharding quantized weights over a ``jax.sharding.Mesh``: XLA inserts
all-gather/reduce-scatter over ICI from the sharding annotations alone
(scaling-book recipe: pick a mesh, annotate, let XLA insert collectives).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


AXIS_DP = "dp"   # data parallel: request batch
AXIS_TP = "tp"   # tensor parallel: heads / ffn / vocab


def make_mesh(tp: int | None = None, dp: int | None = None,
              devices=None) -> Mesh:
    """Build a (dp, tp) mesh.  Defaults: tp = all devices, dp = 1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None and dp is None:
        tp, dp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, (AXIS_DP, AXIS_TP))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_host_local(mesh: Mesh, arr):
    """Replicated global array assembled from per-local-device copies.

    ``jax.device_put(x, replicated(mesh))`` on a MULTI-HOST mesh runs a
    hidden ``assert_equal`` process-allgather — a collective.  Inside the
    lockstep engine that deadlocks: the leader replicates its page table
    BEFORE broadcasting the command while followers sit in the broadcast
    (observed hang, r5).  This constructor touches only local devices; the
    cross-host value equality the check would have verified is already
    guaranteed by the command broadcast (parallel.multihost mirrors the
    table before any global computation consumes it)."""
    import jax

    x = np.asarray(arr)
    shardings = NamedSharding(mesh, P())
    locals_ = [jax.device_put(x, d) for d in mesh.local_devices]
    return jax.make_array_from_single_device_arrays(x.shape, shardings,
                                                    locals_)


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
