"""Multi-host / multi-slice initialization and host-sharded data placement.

The reference trains single-GPU (train.sh pins CUDA_VISIBLE_DEVICES=0) with
HF Accelerate as the nominal DDP layer (train_apadapter_v2.py:548-552). The
TPU-native story (SURVEY §2.5): ``jax.distributed.initialize`` connects the
per-host processes, ``jax.devices()`` then spans the whole slice/pod, the
('data','model') mesh lays batches over ICI within a slice and DCN across
slices, and XLA inserts the gradient all-reduces.

Environment contract (set by the launcher on every host):

    APX_COORDINATOR=<host0-addr:port>   (or JAX's COORDINATOR_ADDRESS)
    APX_NUM_PROCESSES=<world size>      (or JAX_NUM_PROCESSES)
    APX_PROCESS_ID=<0-based rank>       (or JAX_PROCESS_ID)

On real Cloud TPU pods all three are auto-detected by JAX and
``maybe_initialize()`` falls through to ``jax.distributed.initialize()`` with
no arguments.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

_INITIALIZED = False


def _env(*names: str) -> Optional[str]:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return None


def maybe_initialize() -> bool:
    """Initialize jax.distributed when a multi-process env contract is set.

    Returns True when running multi-process (after initialize), False for
    the ordinary single-process case. Idempotent.
    """

    global _INITIALIZED
    if _INITIALIZED:
        return True

    num = _env("APX_NUM_PROCESSES", "JAX_NUM_PROCESSES")
    coord = _env("APX_COORDINATOR", "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")
    pid = _env("APX_PROCESS_ID", "JAX_PROCESS_ID")

    if num is None and coord is None:
        # TPU pod auto-detection: initialize() discovers topology itself when
        # running under the Cloud TPU metadata environment.
        if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
            _INITIALIZED = True
            return True
        return False

    if num is not None and int(num) <= 1:
        return False

    kwargs: dict = {}
    if coord is not None:
        kwargs["coordinator_address"] = coord
    if num is not None:
        kwargs["num_processes"] = int(num)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def host_local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def shard_host_batch(mesh, batch: Any, spec=None):
    """Assemble a GLOBAL batch-sharded array from each host's LOCAL shard.

    Every process passes its own [local_batch, ...] arrays; the result is a
    jax.Array whose global batch dim is local_batch * process_count, laid
    over the mesh's 'data' axis. Single-process: equivalent to
    mesh_lib.shard_batch.

    ``spec`` picks which axis is the batch axis: default ``P('data')``
    (leading). Stacked accumulation batches [K, B_local, ...] must pass
    ``P(None, 'data')`` so the GLOBAL batch axis (1) is assembled across
    processes while the microbatch axis K stays whole on every host —
    sharding axis 0 would scatter the K microbatches across processes
    (global [K*P, B] instead of [K, B*P]) and break the scan-accumulated
    step's contract.
    """

    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, spec if spec is not None else P("data"))

    def place(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(place, batch)
