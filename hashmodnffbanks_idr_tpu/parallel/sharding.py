"""Device-mesh sharding for ray-parallel + table-parallel training.

The reference is strictly single-GPU (SURVEY.md §2.9); its design slots map to
mesh axes here:

  * 'data'  — ray sharding (the reference's random 2048-pixel minibatch /
    10k-pixel eval chunks become per-chip ray shards; gradient psums are
    inserted by XLA SPMD).  This is simultaneously the DP and the
    sequence/context-parallel axis: rays are the "sequence" dimension of this
    workload and are embarrassingly parallel (coupled only through shared
    parameters), so ray sharding subsumes SP/CP.  PP/EP have no counterpart
    in this model family (no pipeline stages, no experts).
  * 'model' — hash-table sharding (tensor parallelism): the packed
    [total_rows, C] embedding tables are the dominant parameter memory;
    their rows are sharded over 'model' and their gradients reduce-scattered
    by XLA.  The small 512-wide MLPs stay replicated.

Everything rides `jax.jit` with NamedSharding constraints — no hand-written
collectives; XLA owns the transport (ICI within hosts, DCN across).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} > {n} devices"
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def param_sharding(params: Dict[str, Any], mesh: Mesh,
                   min_table_rows: int = 1024) -> Dict[str, Any]:
    """NamedShardings for the model state: hash-table rows over 'model',
    everything else replicated."""
    n_model = mesh.shape["model"]

    def spec(path, x):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if (
            "table" in keys
            and hasattr(x, "ndim") and x.ndim == 2
            and x.shape[0] >= max(min_table_rows, n_model)
            and x.shape[0] % n_model == 0
        ):
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a per-step ray/pixel index batch over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_rays(x: jnp.ndarray, mesh: Optional[Mesh]):
    """Sharding hint on a per-ray tensor (leading axis = rays)."""
    if mesh is None:
        return x
    spec = P("data") if x.ndim == 1 else P("data", *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


# Multi-host bring-up lives in parallel/multihost.py (`multihost.initialize`)
# — the single distributed entry point; this module owns mesh construction
# and sharding specs only.
