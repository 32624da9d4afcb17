"""Real-TPU smoke + timing for the fused dequant+matmul kernel.

Run on the axon chip (default env). Prints correctness deltas vs the XLA
reference and a rough roofline estimate for the 4096x4096 config
(BASELINE.json:8).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.core.qtensor import quantize_tensor, to_device
from quant_tpu.kernels import dequant_matmul, dequant_matmul_reference

HBM_GBPS = 819.0  # TPU v5e


def bench(fn, *args, iters=50):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    k = n = 4096
    w = rng.standard_normal((k, n), dtype=np.float32)
    for bits, gs in [(8, None), (8, 128), (4, None), (4, 128)]:
        qt = to_device(quantize_tensor(w, bits=bits, group_size=gs))
        for m in (16, 256):
            x = jnp.asarray(
                rng.standard_normal((m, k), dtype=np.float32), jnp.bfloat16
            )
            ref = np.asarray(dequant_matmul_reference(x, qt), np.float32)
            out = np.asarray(dequant_matmul(x, qt), np.float32)
            err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            dt = bench(lambda a: dequant_matmul(a, qt), x)
            w_bytes = k * n * (1 if bits == 8 else 0.5)
            xb = m * k * 2 + m * n * 2
            gbps = (w_bytes + xb) / dt / 1e9
            print(
                f"bits={bits} gs={gs} m={m}: rel_err={err:.2e} "
                f"t={dt*1e6:.0f}us bw={gbps:.0f}GB/s "
                f"roofline={100*gbps/HBM_GBPS:.0f}%"
            )


if __name__ == "__main__":
    main()
