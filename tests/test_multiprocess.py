"""REAL multi-process distributed init (SURVEY §3e / VERDICT r1 weak #8).

Two actual OS processes run jax.distributed.initialize against a local
coordinator, build the hybrid (DCN x ICI) mesh through
parallel.init_distributed/make_mesh, and run a psum over the
cross-process ``data`` axis — the same code path a v5p pod slice takes,
with gRPC standing in for DCN. This is the one piece the 8-virtual-
device tests cannot cover (they fake process_count via monkeypatch).
"""

import pathlib
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
port, rank = sys.argv[1], int(sys.argv[2])
import jax
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2  # one CPU device per process

from quant_tpu.parallel import make_mesh
from quant_tpu.parallel.mesh import init_distributed

init_distributed()  # already-initialized → must be a clean no-op
mesh = make_mesh(data=2)  # hybrid path: data axis rides the DCN stand-in

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

# one shard per process; psum over the cross-process axis
local = jnp.full((1, 4), float(rank + 1))
arr = jax.make_array_from_single_device_arrays(
    (2, 4), NamedSharding(mesh, P("data", None)),
    [jax.device_put(local, jax.local_devices()[0])])

out = jax.jit(
    jax.shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
                  in_specs=P("data", None), out_specs=P("data", None),
                  check_vma=False))(arr)
got = np.asarray(out.addressable_shards[0].data)
np.testing.assert_allclose(got, 3.0)  # 1 + 2 summed across processes
print(f"RANK{rank}_OK", flush=True)
"""


_REPO = pathlib.Path(__file__).resolve().parents[1]


def test_two_process_distributed_psum():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=str(_REPO),
            # PYTHONPATH deliberately EXCLUDES /root/.axon_site here
            # (contra the usual repo rule): its sitecustomize imports
            # jax on the axon backend at interpreter start, before the
            # worker can force CPU — which would both break the pure-CPU
            # distributed test and contend the TPU relay.
            env={"PATH": "/usr/bin:/bin", "PYTHONPATH": str(_REPO),
                 "HOME": "/root"},
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}_OK" in out, out
