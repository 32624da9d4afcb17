"""Parallelism: device mesh, TP/DP sharding, sharded decode step."""

from quant_tpu.parallel.mesh import make_mesh
from quant_tpu.parallel.tp import (
    cache_specs,
    param_specs,
    shard_params,
    shard_cache,
    make_sharded_forward,
)
from quant_tpu.parallel.pp import (
    make_pp_forward,
    shard_params_pp,
    shard_cache_pp,
)
from quant_tpu.parallel import sp

__all__ = [
    "make_mesh",
    "param_specs",
    "cache_specs",
    "shard_params",
    "shard_cache",
    "make_sharded_forward",
    "make_pp_forward",
    "shard_params_pp",
    "shard_cache_pp",
    "sp",
]
