"""AOT cost analysis of the 70B decode step at the v5p-16 geometry
(VERDICT r3 #7: scaling-efficiency evidence for BASELINE config 5 —
"Llama-3-70B INT4 tensor-sharded across a multi-host v5p-16 slice,
collectives overlapped with decode").

No pod hardware exists on this box, so the evidence is ANALYTIC but
exact where it can be: the FULL 80-layer Llama-3-70B sharded decode step
is AOT-compiled (abstract shapes — no arrays materialize) for a real
16-device TPU topology via jax.experimental.topologies, and the
OPTIMIZED HLO is parsed for every collective's payload bytes. Those are
compared against the per-chip weight-stream bytes (the decode-step
floor) under nominal v5p HBM (2765 GB/s) and ICI (4x3 links, ~100 GB/s
per direction per link usable) bandwidths to bound the modeled scaling
efficiency. Writes docs/scaling_70b_evidence.md.

Usage: python scripts/aot_70b_cost.py [tp] [batch]
"""
import dataclasses
import math
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quant_tpu.models import PRESETS, llama  # noqa: E402

TP = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
MAX_SEQ = 2048
HBM_GBPS = 2765.0          # v5p nominal per chip
ICI_GBPS = 90.0            # per direction per link, conservative v5p
DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "f16": 2, "s16": 2, "u16": 2,
               "f64": 8, "s64": 8, "u64": 8}


def _shape_bytes(sig: str) -> int:
    """'bf16[8,1,512]{2,1,0}' → bytes."""
    m = re.match(r"(\w+)\[([\d,]*)\]", sig)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def collective_bytes(hlo: str) -> dict:
    """Sum output-payload bytes per collective kind in the optimized HLO."""
    out: dict = {}
    pat = re.compile(
        r"= ((?:\([^)]*\))|(?:\S+)) (all-gather|all-reduce|reduce-scatter"
        r"|collective-permute|all-to-all)(?:-start)?[.\d]*\(")
    for ln in hlo.splitlines():
        m = pat.search(ln)
        if not m:
            continue
        sig, kind = m.group(1), m.group(2)
        if sig.startswith("("):
            total = sum(_shape_bytes(p.strip())
                        for p in sig[1:-1].split(",") if "[" in p)
        else:
            total = _shape_bytes(sig)
        out[kind] = out.get(kind, 0) + total
    return out


def main():
    cfg = dataclasses.replace(PRESETS["llama-3-70b"], kernel_mode="xla")
    from jax.experimental import topologies
    from jax.sharding import Mesh

    topo = None
    for name in ("v5p:2x2x4", "v5e:4x4"):
        try:
            topo = topologies.get_topology_desc(platform="tpu",
                                                topology_name=name)
            print(f"topology: {name} ({len(topo.devices)} devices)")
            break
        except Exception as e:
            print(f"topology {name}: {repr(e)[:120]}")
    devs = np.array(topo.devices[:2 * TP]).reshape(2, 1, 1, TP, 1)
    mesh = Mesh(devs, ("pipe", "data", "expert", "model", "seq"))

    from quant_tpu.parallel import pp as pp_mod

    # abstract params/cache: full 80 layers, nothing materializes
    params = jax.eval_shape(
        lambda: llama.init_params(
            dataclasses.replace(cfg, n_layers=2), seed=0, tp=TP))

    def grow(x):
        if hasattr(x, "shape") and x.shape and x.shape[0] == 2:
            return jax.ShapeDtypeStruct((cfg.n_layers,) + x.shape[1:],
                                        x.dtype)
        return x

    params = jax.tree.map(
        grow, params,
        is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct))
    cache = jax.eval_shape(
        lambda: llama.init_cache(cfg, BATCH, MAX_SEQ))
    tok = jax.ShapeDtypeStruct((BATCH, 1), jnp.int32)

    fwd = pp_mod.pp_forward_fn(cfg, mesh, params, cache, n_micro=1)
    lowered = jax.jit(fwd).lower(params, tok, cache)
    comp = lowered.compile()
    hlo = comp.as_text()
    cost = comp.cost_analysis()

    colls = collective_bytes(hlo)
    coll_total = sum(colls.values())
    # per-chip weight stream: int4 codes + scales of this chip's shard
    wbytes = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree.leaves(params)
        if hasattr(x, "dtype") and x.dtype in (jnp.int8.dtype,
                                               jnp.uint8.dtype))
    scale_b = sum(
        int(np.prod(x.shape)) * 4
        for p, x in jax.tree_util.tree_leaves_with_path(params)
        if hasattr(x, "dtype") and "scales" in str(p))
    per_chip_w = (wbytes + scale_b) / (2 * TP)
    kv_b = (2 * BATCH * MAX_SEQ * cfg.n_kv_heads * cfg.head_dim
            * cfg.n_layers) / (2 * TP)
    hbm_ms = (per_chip_w + kv_b) / (HBM_GBPS * 1e6)
    # ICI time: collective payload rides >=2 links per hop direction on a
    # v5p torus ring; conservative single-direction, 2-link model
    ici_ms = coll_total / (2 * ICI_GBPS * 1e6)
    eff = hbm_ms / (hbm_ms + ici_ms)

    lines = [
        "# 70B @ v5p-16: AOT collective-vs-compute cost analysis",
        "",
        "Generated by `scripts/aot_70b_cost.py` — the FULL 80-layer",
        "Llama-3-70B INT4 sharded decode step (pipe=2 x model="
        f"{TP}, batch {BATCH}, S {MAX_SEQ}) AOT-compiled for a real "
        "16-device TPU",
        "topology (no chips needed) and the optimized HLO parsed for",
        "every collective payload. BASELINE.json config 5 evidence",
        "(the slice itself does not exist in this environment).",
        "",
        f"- optimized-HLO collectives per decode step: "
        + ", ".join(f"{k} {v/1e6:.2f} MB" for k, v in sorted(colls.items()))
        + f" — total {coll_total/1e6:.2f} MB",
        f"- per-chip weight+scale stream: {per_chip_w/1e9:.3f} GB/step",
        f"- per-chip INT8 KV read (full cache): {kv_b/1e9:.3f} GB/step",
        f"- HBM floor per step @ {HBM_GBPS:.0f} GB/s: {hbm_ms:.3f} ms",
        f"- ICI transfer @ 2x{ICI_GBPS:.0f} GB/s links, zero overlap "
        f"assumed: {ici_ms:.3f} ms",
        f"- modeled per-step efficiency bound (no overlap): "
        f"{100 * eff:.1f}%",
        "",
        "XLA additionally pipelines the ring collectives and emits the",
        "logits all-gather in async form (scripts/overlap_evidence.py),",
        "so the no-overlap bound is the FLOOR of achievable efficiency;",
        f"the >=80% scaling target (BASELINE.json:5) holds with "
        f"{100 * eff:.0f}% >= 80% before any overlap is credited."
        if eff >= 0.8 else
        "NOTE: the no-overlap bound is below 80% — overlap must close it.",
        "",
        "XLA cost analysis of the compiled module: "
        + ", ".join(f"{k}={v:.3g}" for k, v in sorted(cost.items())
                    if isinstance(v, float) and v),
    ]
    import pathlib
    out = pathlib.Path("docs/scaling_70b_evidence.md")
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
