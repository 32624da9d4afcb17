"""ctypes binding to the C++ oracle ``libquantref`` (cpp/quantref.cpp).

The oracle is the bit-exactness contract for the codec (BASELINE.json:7).
This module builds it on demand via ``make`` (toolchain is baked into the
image) and exposes the C API with NumPy signatures. All tests comparing the
Python codec to C++ go through here; the checkpoint converter also uses the
C++ entropy coder as its fast path when available.
"""

from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess

import numpy as np

_CPP_DIR = pathlib.Path(__file__).resolve().parents[2] / "cpp"
_LIB_PATH = _CPP_DIR / "build" / "libquantref.so"


class OracleUnavailable(RuntimeError):
    pass


def build() -> pathlib.Path:
    """Build libquantref.so via make; idempotent."""
    try:
        subprocess.run(
            ["make", "-s", str(_LIB_PATH.relative_to(_CPP_DIR))],
            cwd=_CPP_DIR,
            check=True,
            capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError) as e:
        raise OracleUnavailable(f"cannot build libquantref: {e}") from e
    return _LIB_PATH


@functools.lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    if not _LIB_PATH.exists():
        build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_i8p = ctypes.POINTER(ctypes.c_int8)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.qr_quantize.restype = ctypes.c_int
    lib.qr_quantize.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_int, c_f32p, c_i8p]
    lib.qr_quantize_grouped.restype = ctypes.c_int
    lib.qr_quantize_grouped.argtypes = [
        c_f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
        c_f32p, c_i8p,
    ]
    lib.qr_dequantize.restype = None
    lib.qr_dequantize.argtypes = [c_i8p, ctypes.c_int64, ctypes.c_float, c_f32p]
    lib.qr_pack_int4.restype = ctypes.c_int64
    lib.qr_pack_int4.argtypes = [c_i8p, ctypes.c_int64, c_u8p]
    lib.qr_unpack_int4.restype = ctypes.c_int64
    lib.qr_unpack_int4.argtypes = [c_u8p, ctypes.c_int64, c_i8p]
    lib.qr_quantize_lut.restype = ctypes.c_int
    lib.qr_quantize_lut.argtypes = [c_f32p, ctypes.c_int64, c_f32p, c_f32p,
                                    c_i8p]
    lib.qr_quantize_lut_grouped.restype = ctypes.c_int
    lib.qr_quantize_lut_grouped.argtypes = [
        c_f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, c_f32p,
        c_f32p, c_i8p,
    ]
    lib.qr_dequantize_lut.restype = None
    lib.qr_dequantize_lut.argtypes = [c_i8p, ctypes.c_int64, c_f32p,
                                      ctypes.c_float, c_f32p]
    lib.qr_mse.restype = ctypes.c_double
    lib.qr_mse.argtypes = [c_f32p, c_f32p, ctypes.c_int64]
    lib.qr_entropy_bound.restype = ctypes.c_int64
    lib.qr_entropy_bound.argtypes = [ctypes.c_int64]
    lib.qr_entropy_encode.restype = ctypes.c_int64
    lib.qr_entropy_encode.argtypes = [c_u8p, ctypes.c_int64, c_u8p, ctypes.c_int64]
    lib.qr_entropy_decode.restype = ctypes.c_int64
    lib.qr_entropy_decode.argtypes = [c_u8p, ctypes.c_int64, c_u8p, ctypes.c_int64]
    lib.qr_entropy_decoded_size.restype = ctypes.c_int64
    lib.qr_entropy_decoded_size.argtypes = [c_u8p, ctypes.c_int64]
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except OracleUnavailable:
        return False


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def quantize(x: np.ndarray, bits: int) -> tuple[np.ndarray, float]:
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    codes = np.empty(x.size, dtype=np.int8)
    scale = ctypes.c_float()
    rc = _lib().qr_quantize(_f32p(x), x.size, bits, ctypes.byref(scale), _i8p(codes))
    if rc:
        raise ValueError(f"qr_quantize failed: rc={rc}")
    return codes, scale.value


def quantize_grouped(
    x: np.ndarray, bits: int, group_size: int
) -> tuple[np.ndarray, np.ndarray]:
    x2 = np.ascontiguousarray(x, dtype=np.float32)
    rows = int(np.prod(x2.shape[:-1])) if x2.ndim > 1 else 1
    cols = x2.shape[-1]
    codes = np.empty(x2.size, dtype=np.int8)
    scales = np.empty(rows * (cols // group_size), dtype=np.float32)
    rc = _lib().qr_quantize_grouped(
        _f32p(x2.reshape(-1)), rows, cols, bits, group_size, _f32p(scales), _i8p(codes)
    )
    if rc:
        raise ValueError(f"qr_quantize_grouped failed: rc={rc}")
    return (
        codes.reshape(x2.shape),
        scales.reshape(*x2.shape[:-1], cols // group_size),
    )


def nf4_table() -> np.ndarray:
    """The oracle's normative 16-entry NF4 codebook (QR_NF4_TABLE)."""
    tbl = ctypes.cast(
        ctypes.addressof(ctypes.c_float.in_dll(_lib(), "QR_NF4_TABLE")),
        ctypes.POINTER(ctypes.c_float * 16),
    ).contents
    return np.array(tbl, dtype=np.float32)


def quantize_lut(x: np.ndarray, lut: np.ndarray) -> tuple[np.ndarray, float]:
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    lut = np.ascontiguousarray(lut, dtype=np.float32)
    codes = np.empty(x.size, dtype=np.int8)
    scale = ctypes.c_float()
    rc = _lib().qr_quantize_lut(_f32p(x), x.size, _f32p(lut),
                                ctypes.byref(scale), _i8p(codes))
    if rc:
        raise ValueError(f"qr_quantize_lut failed: rc={rc}")
    return codes, scale.value


def quantize_lut_grouped(
    x: np.ndarray, lut: np.ndarray, group_size: int
) -> tuple[np.ndarray, np.ndarray]:
    x2 = np.ascontiguousarray(x, dtype=np.float32)
    lut = np.ascontiguousarray(lut, dtype=np.float32)
    rows = int(np.prod(x2.shape[:-1])) if x2.ndim > 1 else 1
    cols = x2.shape[-1]
    codes = np.empty(x2.size, dtype=np.int8)
    scales = np.empty(rows * (cols // group_size), dtype=np.float32)
    rc = _lib().qr_quantize_lut_grouped(
        _f32p(x2.reshape(-1)), rows, cols, group_size, _f32p(lut),
        _f32p(scales), _i8p(codes)
    )
    if rc:
        raise ValueError(f"qr_quantize_lut_grouped failed: rc={rc}")
    return (
        codes.reshape(x2.shape),
        scales.reshape(*x2.shape[:-1], cols // group_size),
    )


def dequantize_lut(codes: np.ndarray, lut: np.ndarray,
                   scale: float) -> np.ndarray:
    c = np.ascontiguousarray(codes, dtype=np.int8).reshape(-1)
    lut = np.ascontiguousarray(lut, dtype=np.float32)
    out = np.empty(c.size, dtype=np.float32)
    _lib().qr_dequantize_lut(_i8p(c), c.size, _f32p(lut), scale, _f32p(out))
    return out.reshape(codes.shape)


def dequantize(codes: np.ndarray, scale: float) -> np.ndarray:
    c = np.ascontiguousarray(codes, dtype=np.int8).reshape(-1)
    out = np.empty(c.size, dtype=np.float32)
    _lib().qr_dequantize(_i8p(c), c.size, scale, _f32p(out))
    return out.reshape(codes.shape)


def pack_int4(codes: np.ndarray) -> np.ndarray:
    c = np.ascontiguousarray(codes, dtype=np.int8).reshape(-1)
    out = np.empty((c.size + 1) // 2, dtype=np.uint8)
    _lib().qr_pack_int4(_i8p(c), c.size, _u8p(out))
    return out


def unpack_int4(packed: np.ndarray, n: int) -> np.ndarray:
    p = np.ascontiguousarray(packed, dtype=np.uint8).reshape(-1)
    out = np.empty(n, dtype=np.int8)
    _lib().qr_unpack_int4(_u8p(p), n, _i8p(out))
    return out


def mse(a: np.ndarray, b: np.ndarray) -> float:
    a = np.ascontiguousarray(a, dtype=np.float32).reshape(-1)
    b = np.ascontiguousarray(b, dtype=np.float32).reshape(-1)
    return _lib().qr_mse(_f32p(a), _f32p(b), a.size)


def entropy_encode(data: bytes | np.ndarray) -> bytes:
    arr = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(
        data, (bytes, bytearray)
    ) else np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    cap = _lib().qr_entropy_bound(arr.size)
    out = np.empty(cap, dtype=np.uint8)
    n = _lib().qr_entropy_encode(_u8p(arr), arr.size, _u8p(out), cap)
    if n < 0:
        raise ValueError("qr_entropy_encode failed")
    return out[:n].tobytes()


def entropy_decode(comp: bytes) -> bytes:
    c = np.frombuffer(comp, dtype=np.uint8)
    size = _lib().qr_entropy_decoded_size(_u8p(c), c.size)
    if size < 0:
        raise ValueError("bad QREF frame")
    out = np.empty(max(size, 1), dtype=np.uint8)
    n = _lib().qr_entropy_decode(_u8p(c), c.size, _u8p(out), size)
    if n < 0:
        raise ValueError("qr_entropy_decode failed")
    return out[:n].tobytes()
