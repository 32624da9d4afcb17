"""Device mesh construction (SURVEY.md §2.2 #10).

TPU-native communication = XLA collectives over ICI/DCN inside shard_map —
no NCCL/MPI analogue needed. Axes:

* ``data``  — batch (continuous batching shards slots across it; DCN-friendly)
* ``model`` — tensor parallelism (ICI; weight/KV shards, psum/all_gather)
* ``seq``   — sequence/context parallelism (ring attention; ICI neighbors)

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

__all__ = ["make_mesh"]


def make_mesh(
    data: int = 1,
    model: int = 1,
    seq: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model, seq) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = data * model * seq
    if n > len(devices):
        raise ValueError(f"mesh {data}x{model}x{seq} needs {n} devices, "
                         f"have {len(devices)}")
    devices = devices[:n]
    if jax.process_count() > 1:
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data // jax.process_count(), model, seq),
            dcn_mesh_shape=(jax.process_count(), 1, 1),
        )
    else:
        arr = np.asarray(devices).reshape(data, model, seq)
    return Mesh(arr, axis_names=("data", "model", "seq"))
