"""On-device INT4 unpack kernel (checkpoint-load path).

BASELINE.json:5 requires "byte-unpacking of entropy-packed weight codes done
on-device at load": the variable-length entropy stage decodes on host (C++,
`cpp/quantref.cpp`), producing fixed-width packed nibbles; THIS kernel turns
those into int8 codes on the TPU, so the host→device transfer is the packed
(half-size) buffer. Used by the checkpoint loader when a consumer needs raw
codes; the fused matmul kernel instead consumes packed bytes directly.

Layout contract = ``codec.pack_int4_matmul`` (split-K): packed[i, n] holds
code (i, n) in the low nibble and (i + K/2, n) in the high nibble.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["unpack_int4_device"]


def _kernel(p_ref, o_ref):
    wi = p_ref[:].astype(jnp.int32)
    o_ref[0] = ((wi & 0xF) - 8).astype(jnp.int8)
    o_ref[1] = ((wi >> 4) - 8).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def unpack_int4_device(packed: jax.Array, *, interpret: bool = False):
    """[K//2, N] uint8 split-K packed → [K, N] int8 codes, on device."""
    k2, n = packed.shape
    tk = k2  # whole packed-row range per program; tile N only
    tn = 512 if (n > 512 and n % 512 == 0) else n
    out = pl.pallas_call(
        _kernel,
        grid=(k2 // tk, n // tn),
        in_specs=[
            pl.BlockSpec((tk, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((2, tk, tn), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, k2, n), jnp.int8),
        interpret=interpret,
    )(packed)
    return out.reshape(2 * k2, n)
