"""Collective/compute overlap evidence (VERDICT r1 #8; SURVEY §7 "verify
with profiler, don't assume").

What CAN be verified on this box, and what can't:

* Multi-chip hardware is unavailable (single axon chip) — wall-clock
  overlap of ICI collectives with MXU compute is physically unmeasurable
  here. What IS checkable is the COMPILED SCHEDULE: whether XLA emits
  collectives in their asynchronous start/done form with independent
  compute scheduled between the pair. On TPU the latency-hiding scheduler
  operates on exactly those async pairs, so "async pair + compute between"
  in the optimized HLO is the compile-time precondition for overlap.
* This script compiles the production TP decode step (make_sharded_forward,
  mesh {model: N}) and reports, per collective: sync/async form, and for
  async ones how many fusions/dots sit between -start and -done.
* Run on the CPU backend the schedule reflects the CPU emitter (often
  sync); the same dump under JAX_PLATFORMS=axon compiles for the TPU
  target. Single-chip TPU compiles elide cross-chip collectives entirely,
  so the CPU-mesh dump is the best available structural evidence — the
  README records this limitation honestly.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8
       JAX_PLATFORMS=cpu python scripts/overlap_evidence.py [tp]
"""

import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

# the axon sitecustomize forces platform=axon at interpreter start; the
# config update (not the env var) is the effective override (conftest.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig
from quant_tpu.parallel.mesh import make_mesh
from quant_tpu.parallel.tp import make_sharded_forward, shard_params, shard_cache


def main():
    tp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = ModelConfig(
        vocab_size=512, dim=256, n_layers=2, n_heads=8, n_kv_heads=4,
        intermediate=512, group_size=64, kernel_mode="xla",
    )
    mesh = make_mesh(model=tp, data=len(jax.devices()) // tp)
    params = llama.init_params(cfg, seed=0)
    cache = llama.init_cache(cfg, 8, 128)
    params = shard_params(params, mesh)
    cache = shard_cache(cache, mesh)
    fwd = make_sharded_forward(cfg, mesh, params, cache)
    tok = jnp.zeros((8, 1), jnp.int32)

    hlo = fwd.lower(params, tok, cache).compile().as_text()
    ops = [ln.strip() for ln in hlo.splitlines()]

    colls = {}
    for pat in ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute"):
        sync = sum(bool(re.match(rf"%?\S+ = \S+ {pat}\(", o)) for o in ops)
        starts = [i for i, o in enumerate(ops) if f"{pat}-start" in o
                  and "=" in o]
        colls[pat] = (sync, len(starts))
        for i in starts:
            # find matching -done and count compute ops in between
            for j in range(i + 1, len(ops)):
                if f"{pat}-done" in ops[j]:
                    between = sum(1 for o in ops[i + 1:j]
                                  if re.search(r"= \S+ (fusion|dot|"
                                               r"convolution)\(", o))
                    print(f"{pat}-start @{i}: {j - i - 1} ops to -done, "
                          f"{between} fusions/dots in between")
                    break
    print("\ncollective form summary (sync, async):")
    for k, v in colls.items():
        print(f"  {k:20s} sync={v[0]} async={v[1]}")
    n_async = sum(v[1] for v in colls.values())
    n_sync = sum(v[0] for v in colls.values())
    print(f"\nbackend={jax.default_backend()}  total sync={n_sync} "
          f"async={n_async}")


if __name__ == "__main__":
    main()
