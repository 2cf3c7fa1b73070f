"""Multi-host initialization and DCN×ICI mesh construction (SURVEY.md §7 M6).

The reference is single-node only (torchrun --standalone, SURVEY.md §4); this
module is the scale-out path for TPU pods: `jax.distributed` process bootstrap
plus a hybrid mesh whose outer (data) axis rides DCN between hosts and whose
inner (model) axis rides ICI within a slice — weights and KV tensor-sharded
intra-slice, batch sharded across hosts.

On a single host (or under the CPU test mesh) everything degrades to
parallel.sharding.make_mesh.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap (no-op when single-process).

    Equivalent role to the reference's init_dist/torchrun NCCL bootstrap
    (Engine/tp.py:54-64), but single-controller-per-host GSPMD instead of
    one process per GPU.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_hybrid_mesh(model_axis: int, data_axis: Optional[int] = None) -> Mesh:
    """data(DCN-major) × model(ICI) mesh over all visible devices.

    Device order from jax.devices() groups each host's local devices
    contiguously, so reshaping (data, model) with model minor keeps every
    model group inside one host/slice — the collectives after wo/w2 and the
    vocab argmax stay on ICI; only batch-parallel work crosses DCN.
    """
    devices = np.asarray(jax.devices())
    n = devices.size
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model axis {model_axis}")
    data_axis = data_axis or n // model_axis
    if data_axis * model_axis != n:
        raise ValueError(f"mesh {data_axis}x{model_axis} != {n} devices")
    local = jax.local_device_count()
    if model_axis > local and local > 1:
        raise ValueError(
            f"model axis {model_axis} would span hosts ({local} local devices); "
            "keep TP within a host/slice and scale batch over DCN")
    return Mesh(devices.reshape(data_axis, model_axis), ("data", "model"))
