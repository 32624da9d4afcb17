"""Device mesh construction (SURVEY.md §2.2 #10).

TPU-native communication = XLA collectives over ICI/DCN inside shard_map —
no NCCL/MPI analogue needed. Axes:

* ``data``   — batch (continuous batching shards slots across it; DCN-friendly)
* ``expert`` — expert parallelism (MoE weights shard per expert; one psum
  per layer combines routed outputs — ICI, like model)
* ``model``  — tensor parallelism (ICI; weight/KV shards, psum/all_gather)
* ``seq``    — sequence/context parallelism (ring attention; ICI neighbors)

For multi-host pods, ``make_mesh`` uses
``mesh_utils.create_hybrid_device_mesh`` so ``data`` maps to DCN (inter-host)
and model/seq ride ICI, matching BASELINE.json:5's "collectives overlapped
with decode compute" requirement (XLA async collectives handle overlap).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

__all__ = ["make_mesh", "hybrid_mesh_shapes", "init_distributed"]


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (SURVEY.md §3e): ``jax.distributed.initialize``.

    Call once per host before building the hybrid mesh; with no arguments
    the TPU runtime's own discovery is used (the normal pod-slice path).
    No-op when already initialized or single-process.
    """
    import jax

    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized


def hybrid_mesh_shapes(pipe: int, data: int, model: int, seq: int,
                       n_proc: int, expert: int = 1) -> tuple[tuple, tuple]:
    """Pure shape math for the multi-host (hybrid ICI/DCN) mesh.

    Returns ``(ici_mesh_shape, dcn_mesh_shape)`` for
    ``mesh_utils.create_hybrid_device_mesh``: the DCN (inter-host) factor
    is taken from the sparsest-traffic axis that divides ``n_proc`` —
    ``data`` first (batch-sharded serving), else ``pipe`` (PP across
    hosts, the 70B layout). expert/model/seq always stay on ICI: their
    psum / ppermute traffic is dense and latency-critical.
    """
    if data % n_proc == 0:
        return ((pipe, data // n_proc, expert, model, seq),
                (1, n_proc, 1, 1, 1))
    if pipe % n_proc == 0:
        return ((pipe // n_proc, data, expert, model, seq),
                (n_proc, 1, 1, 1, 1))
    raise ValueError(
        f"neither data={data} nor pipe={pipe} divides process count "
        f"{n_proc}: put the host boundary on one of the sparse axes")


def make_mesh(
    data: int = 1,
    model: int = 1,
    seq: int = 1,
    pipe: int = 1,
    expert: int = 1,
    devices=None,
) -> Mesh:
    """Build a (pipe, data, expert, model, seq) mesh over the devices.

    Axis order puts pipe/data outermost (DCN-friendly: stage/batch traffic
    is sparse) and expert/model/seq innermost (ICI: dense psum/permute
    traffic). ``expert`` shards MoE expert weights (SURVEY §2.2 #14); it
    is a no-op axis of size 1 for dense models.
    """
    devices = devices if devices is not None else jax.devices()
    n = data * model * seq * pipe * expert
    if n > len(devices):
        raise ValueError(f"mesh {pipe}x{data}x{expert}x{model}x{seq} "
                         f"needs {n} devices, have {len(devices)}")
    devices = devices[:n]
    if jax.process_count() > 1:
        ici, dcn = hybrid_mesh_shapes(pipe, data, model, seq,
                                      jax.process_count(), expert)
        # hybrid_mesh_shapes factors the DCN axis by PROCESS count, so
        # granules must be processes — slice granules would mis-count
        # both on multi-host single-slice pods (1 slice, N processes)
        # and on CPU multi-process (slice_index 0 everywhere)
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=ici, dcn_mesh_shape=dcn,
            process_is_granule=True,
        )
    else:
        arr = np.asarray(devices).reshape(pipe, data, expert, model, seq)
    return Mesh(arr, axis_names=("pipe", "data", "expert", "model", "seq"))
