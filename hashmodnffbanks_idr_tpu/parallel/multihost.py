"""Multi-host (multi-process) bring-up: global mesh + per-host data shards.

The reference is single-GPU (SURVEY.md §2.9); scaling past one host is new
capability in this framework.  The design follows the standard JAX SPMD
recipe: every process runs the same program, `jax.distributed.initialize`
joins them into one runtime, the mesh spans *global* devices, and each host
feeds only its local shard of the per-ray batch —
`jax.make_array_from_process_local_data` assembles the logical global array.

Per-host data sharding for this workload: rays are the 'data' axis, so each
host samples a disjoint pixel subset with a host-folded PRNG key and supplies
`global_rays / process_count` rows.  Parameters are replicated (or
table-sharded over 'model') and their gradient psums ride ICI within a host
and DCN across hosts, inserted by XLA — no hand-written collectives.

Bring-up is exercised for real by tests/test_multihost.py, which launches two
local CPU processes against a localhost coordinator and checks a cross-host
psum and a sharded train-shaped step.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> tuple[int, int]:
    """Join (or skip, when single-process) the distributed runtime.

    Returns (process_index, process_count).  Call before any other JAX API.
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    return jax.process_index(), jax.process_count()


def global_mesh(n_model: int = 1) -> Mesh:
    """('data', 'model') mesh over ALL global devices (every process must
    call this with the same n_model).  Thin wrapper over the one mesh
    builder, `sharding.make_mesh` — kept so multi-host callers have a single
    module to import."""
    from .sharding import make_mesh

    n = len(jax.devices())
    assert n % n_model == 0, f"{n} devices not divisible by n_model={n_model}"
    return make_mesh(n_data=n // n_model, n_model=n_model)


def host_fold_rng(rng: jax.Array) -> jax.Array:
    """Disjoint per-host randomness: fold the process index into the key so
    each host samples a different pixel subset of the same global step."""
    return jax.random.fold_in(rng, jax.process_index())


def host_batch_slice(global_batch: int) -> int:
    """Rows this host must supply for a `global_batch`-row 'data'-sharded
    array."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def make_global_ray_array(local_rows: np.ndarray, mesh: Mesh) -> jax.Array:
    """Assemble a logically-global per-ray array from this host's shard.

    `local_rows` has global_rows/process_count leading rows; the result is a
    global jax.Array sharded P('data', ...) over the mesh.
    """
    spec = P("data", *([None] * (local_rows.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_rows))


def all_hosts_psum_check(mesh: Mesh) -> float:
    """Cheap collective health check: psum of per-device ones must equal the
    global device count on every host."""
    n_data = mesh.shape["data"]
    n_proc = jax.process_count()
    assert n_data % n_proc == 0 and n_data >= n_proc, (
        f"psum check needs mesh 'data' axis ({n_data}) divisible by the "
        f"process count ({n_proc}); shrink n_model or grow the mesh")
    local = n_data // n_proc
    ones = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.full((local,), float(mesh.size // n_data), np.float32),
    )
    total = jax.jit(lambda x: jnp.sum(x),
                    out_shardings=NamedSharding(mesh, P()))(ones)
    return float(total)
