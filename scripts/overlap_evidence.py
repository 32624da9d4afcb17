"""Collective/compute overlap evidence (VERDICT r1 #8; SURVEY §7 "verify
with profiler, don't assume").

Three sources of evidence on this box (no multi-chip hardware):

1. ``tpu-topo`` mode (the decisive one): AOT-compile the production TP
   decode step for a REAL v5e-8 target via
   ``jax.experimental.topologies.get_topology_desc("v5e:2x4")`` — no
   devices needed — and inspect the optimized HLO. Findings (recorded in
   README): the per-layer psums lower to ring-strategy TPU collective
   emitters (``RotatedPincerShortEmitter``/``StrategyRing``) with scoped
   VMEM buffers — the transfer is pipelined stride-by-stride over ICI —
   and the logits all-gather carries
   ``async_collective_name="all-gather-start"`` (async form). The decode
   psums themselves are data dependencies of the next op (Megatron TP:
   psum output feeds the residual), so there exists no independent
   compute to hide them behind at T=1 — ring pipelining IS the available
   latency hiding, and XLA applies it.
2. CPU-mesh mode: same module compiled for the 8-virtual-device CPU
   backend. The CPU emitter lowers collectives synchronously, so this
   dump only validates program structure, not scheduling.
3. Kernel-level wall-clock: ``scripts/tpu_profile_decode.py`` captures a
   real device trace through the axon relay (device-side events DO land —
   the r1 assumption that the relay can't trace was wrong) with
   per-kernel times for the decode step.

Usage:
  python scripts/overlap_evidence.py tpu-topo [tp]   # v5e:2x4 AOT dump
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/overlap_evidence.py cpu [tp]
"""

import os
import re
import sys

MODE = sys.argv[1] if len(sys.argv) > 1 else "tpu-topo"
TP = int(sys.argv[2]) if len(sys.argv) > 2 else 8

if MODE == "cpu":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if MODE == "cpu":
    # the axon sitecustomize forces platform=axon at interpreter start; the
    # config update (not the env var) is the effective override (conftest)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from quant_tpu.models import llama  # noqa: E402
from quant_tpu.models.config import ModelConfig  # noqa: E402

COLLS = ("all-gather", "all-reduce", "reduce-scatter", "collective-permute")


def analyze(hlo: str) -> None:
    ops = [ln.strip() for ln in hlo.splitlines()]
    print("collective lowering:")
    for i, o in enumerate(ops):
        for pat in COLLS:
            if not re.search(rf"= \S+ {pat}[.\d]*\(", o):
                continue
            emitter = re.search(r'"emitter":"(\w+)"', o)
            strat = re.search(r"Strategy(\w+)", o)
            async_name = re.search(r'async_collective_name="([\w-]+)"', o)
            scoped = re.search(
                r'used_scoped_memory_configs":\[\{"memory_space":"1",'
                r'"offset":"\d+","size":"(\d+)"', o)
            bits = [pat]
            if emitter:
                bits.append(f"emitter={emitter.group(1)}")
            if strat:
                bits.append(f"strategy={strat.group(1)}")
            if async_name:
                bits.append(f"async={async_name.group(1)}")
            if scoped:
                bits.append(f"scoped_vmem={int(scoped.group(1))//1024}KiB")
            print("  " + "  ".join(bits))
    for pat in COLLS:
        starts = [i for i, o in enumerate(ops)
                  if f"{pat}-start" in o and "=" in o]
        for i in starts:
            for j in range(i + 1, len(ops)):
                if f"{pat}-done" in ops[j]:
                    between = sum(1 for o in ops[i + 1:j]
                                  if re.search(r"= \S+ (fusion|dot|"
                                               r"convolution)[.\d]*\(", o))
                    print(f"  {pat}-start async pair: {between} "
                          f"fusions/dots scheduled between start and done")
                    break


def main():
    cfg = ModelConfig(
        vocab_size=4096, dim=1024, n_layers=2, n_heads=16, n_kv_heads=8,
        intermediate=4096, group_size=128, kernel_mode="xla",
    )
    from jax.sharding import Mesh
    from quant_tpu.parallel.tp import sharded_forward_fn

    if MODE == "tpu-topo":
        from jax.experimental import topologies
        topo = topologies.get_topology_desc(
            platform="tpu", topology_name=f"v5e:2x{TP // 2}")
        devs = np.array(topo.devices).reshape(1, 1, TP, 1)
    else:
        devs = np.array(jax.devices()[:TP]).reshape(1, 1, TP, 1)
    mesh = Mesh(devs, ("pipe", "data", "model", "seq"))
    params = llama.init_params(cfg, seed=0, tp=TP)
    cache = llama.init_cache(cfg, 8, 256)
    fwd = sharded_forward_fn(cfg, mesh, params, cache)
    shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), (params, cache))
    tok = jax.ShapeDtypeStruct((8, 1), jnp.int32)
    hlo = jax.jit(fwd).lower(shapes[0], tok, shapes[1]).compile().as_text()
    out = f"/tmp/tp_decode_{MODE}_{TP}.hlo"
    with open(out, "w") as f:
        f.write(hlo)
    print(f"optimized HLO ({MODE}, tp={TP}) -> {out}  "
          f"[{len(hlo.splitlines())} lines]")
    analyze(hlo)


if __name__ == "__main__":
    main()
