"""Multi-host initialization.

One call sets up jax.distributed for multi-host pods (coordinator address
and process ids from the standard env vars or explicit args); on single
host it is a no-op. The mesh code (parallel.mesh) then sees all global
devices, and GSPMD handles cross-host collectives over ICI/DCN.

Data semantics on a pod: every process runs the same deterministic
loader over the same files (seeded shuffles), and shard_batch device_puts
each full logical batch with a global NamedSharding -- each process
materializes only its local shard, so all hosts together hold ONE copy of
each global batch (single-logical-batch data parallelism). Checkpoint and
metric writes are guarded to is_primary().
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host; returns True if
    distributed mode is active. Reads JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID when args are omitted (TPU pod
    slices auto-detect without any of these)."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    # TPU pod slices export the worker list; a single entry (or a tunneled
    # single chip, which sets TPU_WORKER_HOSTNAMES=localhost) is not a pod
    workers = [h for h in os.environ.get(
        "TPU_WORKER_HOSTNAMES", "").split(",") if h]
    if coordinator_address or len(workers) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        _initialized = True
        return jax.process_count() > 1
    _initialized = True
    return False


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def primary_decision(value: int) -> int:
    """Multi-host control-flow agreement: every process adopts the
    PRIMARY's value (e.g. a skip/exit decision derived from files that
    only exist on the primary). Identity on a single process. Prevents
    the primary exiting while workers proceed into a collective hang."""
    if jax.process_count() <= 1:
        return int(value)
    import numpy as np
    from jax.experimental import multihost_utils

    return int(multihost_utils.broadcast_one_to_all(np.int32(value)))


def assert_agreement(name: str, value: int) -> None:
    """Multi-host guard: every process must hold the same value (e.g. the
    auto-resume epoch found on disk). Checkpoints are written by the
    primary only, so on a non-shared filesystem the other hosts would
    silently restart from scratch while the primary resumes -- diverging
    into a collective hang. Raises ON EVERY HOST (all-gather compare, so
    the primary fails too instead of hanging alone at its next
    collective). No-op on a single process."""
    if jax.process_count() <= 1:
        return
    import numpy as np
    from jax.experimental import multihost_utils

    all_vals = np.asarray(
        multihost_utils.process_allgather(np.int32(value))).reshape(-1)
    if not (all_vals == all_vals[0]).all():
        raise RuntimeError(
            "%s disagrees across hosts (process %d sees %d, all: %s): "
            "multi-host resume requires the checkpoint directory on a "
            "shared filesystem"
            % (name, jax.process_index(), value, all_vals.tolist()))
