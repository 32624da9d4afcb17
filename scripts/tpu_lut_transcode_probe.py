"""Codebook transcode-at-load on hardware (r5, VERDICT r4 weak #3).

Measures the three ways to EXECUTE a codebook checkpoint at decode M:
  word4       in-kernel int8-requant table gather (int4 device bytes)
  sel15       in-kernel exact-f32 select tree
  transcode   load-time map through the word4 table → plain linear int8
              QTensor (2x device bytes, zero in-kernel table work)

plus the linear int4 baseline, and checks transcode == word4 outputs.
Expectation from tpu_lut_probe (2026-08-19): word4 181 / sel15 111 GB/s
of packed bytes vs ~520 linear int4; the transcoded int8 stream should
run at the linear int8 kernel's rate — more GB but fewer ms.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from quant_tpu.core.qtensor import (
    quantize_tensor_device, transcode_lut_int8,
)
from quant_tpu.kernels.dequant_matmul import dequant_matmul
from quant_tpu.utils.timing import differential_time


def main():
    m, k, n = 16, 4096, 14336
    key = jax.random.key(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (m, k), jnp.float32)
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.02
    qt_lut = quantize_tensor_device(w, bits=4, group_size=128,
                                    codebook="nf4")
    qt_i8 = transcode_lut_int8(qt_lut)
    qt_lin4 = quantize_tensor_device(w, bits=4, group_size=128)
    assert qt_i8.bits == 8 and qt_i8.lut is None

    y_w4 = np.asarray(dequant_matmul(x, qt_lut))
    y_i8 = np.asarray(dequant_matmul(x, qt_i8))
    d = np.abs(y_w4 - y_i8).max() / (np.abs(y_w4).max() + 1e-9)
    print(f"transcode vs word4 rel|d|: {d:.2e}", flush=True)
    assert d < 5e-3, d

    def time_case(name, qt, **kw_):
        def make(nrep):
            @jax.jit
            def f(x, codes, scales):
                import dataclasses as dc
                q = dc.replace(qt, codes=codes, scales=scales)

                def body(i, acc):
                    out = dequant_matmul(x + acc * 1e-20, q, **kw_)
                    return jnp.sum(out) * 1e-9
                return jax.lax.fori_loop(0, nrep, body, jnp.float32(0))
            return f
        per = differential_time(make, (x, qt.codes, qt.scales), 8, 104,
                                iters=4)
        byt = qt.codes.size * qt.codes.dtype.itemsize
        print(f"  {name:10s}: {per*1e3:.3f} ms  "
              f"({byt/per/1e9:.0f} GB/s of code bytes)", flush=True)
        return per

    t_lin = time_case("linear-i4", qt_lin4)
    t_w4 = time_case("word4", qt_lut)
    t_sel = time_case("sel15", qt_lut, lut_exact=True)
    t_i8 = time_case("transcode", qt_i8)
    print(f"  transcode vs word4 speedup: {t_w4/t_i8:.2f}x "
          f"(vs linear-i4 cost: {t_i8/t_lin:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
