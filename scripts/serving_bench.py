"""Serving benchmark on the real chip: Poisson load through the Engine.

    PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    timeout 4000 python scripts/serving_bench.py \
        [preset] [n_requests] [rate_req_s] [slots] [max_seq]

Defaults: llama-3-8b geometry (depth-reduced via LAYERS env for faster
compiles), 64 requests at 8 req/s into 16 slots. Reports sustained
tokens/s + TTFT/TPOT percentiles (quant_tpu.engine.loadgen).
"""

import dataclasses
import json
import os
import sys

from quant_tpu.engine import Engine
from quant_tpu.engine.loadgen import LoadSpec, run_load
from quant_tpu.models import PRESETS, llama


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "llama-3-8b"
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rate = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0
    slots = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    max_seq = int(sys.argv[5]) if len(sys.argv) > 5 else 1024
    cfg = PRESETS[preset]
    layers = int(os.environ.get("LAYERS", "0"))
    if layers:
        cfg = dataclasses.replace(cfg, n_layers=layers)
    print(f"{preset} L={cfg.n_layers} slots={slots} rate={rate}",
          flush=True)
    params = llama.init_params_device(cfg, seed=0)
    import jax
    jax.block_until_ready(params.layers.wqkv.codes)
    # ADMIT_CHUNKS=0 → unbudgeted (pre-r4 behavior: drain every pending
    # admission before each fused block); default = Engine default (4)
    ac_env = os.environ.get("ADMIT_CHUNKS")
    admit = ({} if ac_env is None else
             {"block_admit_chunks": (None if int(ac_env) == 0
                                     else int(ac_env))})
    eng = Engine(params, cfg, max_slots=slots, max_seq=max_seq,
                 eos_id=-1, **admit)
    p_hi = min(256, max_seq // 2)
    m_hi = min(128, max_seq // 4)
    spec = LoadSpec(n_requests=n_req, rate=rate,
                    prompt_len=(min(32, p_hi), p_hi),
                    max_new=(min(16, m_hi), m_hi),
                    block=int(os.environ.get("BLOCK", "8")))
    print(json.dumps(run_load(eng, spec)), flush=True)


if __name__ == "__main__":
    main()
