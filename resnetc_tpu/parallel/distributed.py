"""Multi-host (multi-process) initialisation.

Single-slice multi-chip needs nothing here — ``create_mesh`` over
``jax.devices()`` covers it and XLA routes collectives over ICI.  Multi-HOST
jobs (one process per host, e.g. a v5e-256 pod or multiple slices over DCN)
must call :func:`initialize` before any other JAX API so every process
learns the global topology; afterwards ``jax.devices()`` is global and the
same mesh/sharding code works unchanged.

The reference has no distributed anything (SURVEY.md §2); this is the
TPU-native equivalent of what an NCCL/MPI bootstrap would be elsewhere.
"""

from __future__ import annotations


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-process JAX runtime.

    On TPU pods the arguments auto-detect from the environment
    (megascale/TPU metadata); pass them explicitly for other setups:
    coordinator "host:port", total process count, and this process's index.
    Safe to call once per process, before any backend use.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def global_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this process's shard of a batch dimension, for
    per-host data loading feeding a 'data'-sharded global array."""
    import jax

    n, i = jax.process_count(), jax.process_index()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} processes")
    per = global_batch // n
    return i * per, per


def host_local_to_global(local_batches, mesh, spec):
    """Assemble per-host local arrays into one globally-sharded array
    (wrapper over jax.make_array_from_process_local_data)."""
    import jax

    return jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, spec), local_batches
    )
