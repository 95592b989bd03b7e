"""Native (C++) host-math runtime, loaded via ctypes.

Compiled on demand with g++ into the user cache dir; every entry point has
a pure-Python fallback in the context layer, so the package works without a
compiler (the native path makes logN>=16 context generation seconds instead
of minutes).
"""

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False


def _cache_dir() -> Path:
    return Path(os.environ.get(
        "LIBERATE_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "liberate_tpu")))


def _build_and_load():
    src = Path(__file__).with_name("hostmath.cpp")
    code = src.read_bytes()
    tag = hashlib.sha256(code).hexdigest()[:16]
    out = _cache_dir() / f"hostmath_{tag}.so"
    if not out.exists():
        out.parent.mkdir(parents=True, exist_ok=True)
        tmp = out.with_suffix(".so.tmp")
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(tmp), str(src)],
            check=True, capture_output=True)
        os.replace(tmp, out)
    lib = ctypes.CDLL(str(out))

    u64 = ctypes.c_uint64
    i32 = ctypes.c_int32
    p64 = ctypes.POINTER(ctypes.c_uint64)

    lib.powmod_u64.restype = u64
    lib.powmod_u64.argtypes = [u64, u64, u64]
    lib.miller_rabin_u64.restype = i32
    lib.miller_rabin_u64.argtypes = [u64]
    lib.find_ntt_prime.restype = u64
    lib.find_ntt_prime.argtypes = [u64, u64, i32]
    lib.psi_banks.restype = None
    lib.psi_banks.argtypes = [p64, p64, p64, i32, i32, p64, p64]
    lib.primitive_root_2N.restype = u64
    lib.primitive_root_2N.argtypes = [u64, u64]
    p32 = ctypes.POINTER(ctypes.c_uint32)
    i64 = ctypes.c_int64
    lib.chacha20_blocks.restype = None
    lib.chacha20_blocks.argtypes = [p32, p32, p64, i64, p32]
    p8 = ctypes.POINTER(ctypes.c_int8)
    pi64 = ctypes.POINTER(ctypes.c_int64)
    lib.mxu_decompose.restype = i64
    lib.mxu_decompose.argtypes = [p64, i64, i64, u64, i32, i32, i32,
                                  p8, pi64]
    lib.shoup_precompute.restype = None
    lib.shoup_precompute.argtypes = [p64, i64, u64, p64]
    return lib


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build_and_load()
        except Exception:
            _LIB = None
    return _LIB


def available() -> bool:
    return get_lib() is not None


# -- typed wrappers ----------------------------------------------------------


def miller_rabin(n: int):
    """Exact 64-bit primality test; None if out of native range."""
    lib = get_lib()
    if lib is None or n >= (1 << 63):
        return None
    return bool(lib.miller_rabin_u64(n))


def find_ntt_prime(start: int, M: int, up: bool):
    lib = get_lib()
    if lib is None or start >= (1 << 63):
        return None
    q = lib.find_ntt_prime(start, M, 1 if up else 0)
    return int(q) or None


def primitive_root_2N(q: int, N: int):
    lib = get_lib()
    if lib is None or q >= (1 << 63):
        return None
    return int(lib.primitive_root_2N(q, N))


def chacha20_blocks(key, nonce, counters):
    """ChaCha20 keystream: uint32 [n, 16] for the given 64-bit counters;
    None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    key = np.ascontiguousarray(np.asarray(key, dtype=np.uint32))
    nonce = np.ascontiguousarray(np.asarray(nonce, dtype=np.uint32))
    counters = np.ascontiguousarray(np.asarray(counters, dtype=np.uint64))
    n = counters.shape[0]
    out = np.empty((n, 16), dtype=np.uint32)
    p32 = ctypes.POINTER(ctypes.c_uint32)
    p64 = ctypes.POINTER(ctypes.c_uint64)
    lib.chacha20_blocks(key.ctypes.data_as(p32), nonce.ctypes.data_as(p32),
                        counters.ctypes.data_as(p64), n,
                        out.ctypes.data_as(p32))
    return out


def mxu_decompose(M, q: int, dA: int, dB: int, centered: bool = False):
    """Balanced base-256 digit decomposition of an MXU-NTT table
    (ntt/mxu_ntt.py _decompose_table): (digits int8 [dA, O, dB*I],
    rowsums int32 [dA, O]); None if unavailable. centered: decompose the
    centered (-q/2, q/2] representatives."""
    lib = get_lib()
    if lib is None or q >= (1 << 63):
        return None
    M = np.ascontiguousarray(np.asarray(M, dtype=np.uint64))
    O, I = M.shape
    digits = np.empty((dA, O, dB, I), dtype=np.int8)
    rowsum = np.empty((dA, O), dtype=np.int64)
    p64 = ctypes.POINTER(ctypes.c_uint64)
    p8 = ctypes.POINTER(ctypes.c_int8)
    pi64 = ctypes.POINTER(ctypes.c_int64)
    errs = lib.mxu_decompose(M.ctypes.data_as(p64), O, I, q, dA, dB,
                             1 if centered else 0,
                             digits.ctypes.data_as(p8),
                             rowsum.ctypes.data_as(pi64))
    if errs:
        return None
    rs = 128 * rowsum
    if np.abs(rs).max() >= 2 ** 31:
        return None
    return digits.reshape(dA, O, dB * I), rs.astype(np.int32)


def shoup_precompute(w, q: int):
    """wp = floor(w * 2^64 / q) per element (uint64 [..]); None if the
    native library is unavailable (caller falls back to Python ints)."""
    lib = get_lib()
    if lib is None or q >= (1 << 63):
        return None
    w = np.ascontiguousarray(np.asarray(w, dtype=np.uint64))
    out = np.empty(w.shape, dtype=np.uint64)
    p64 = ctypes.POINTER(ctypes.c_uint64)
    lib.shoup_precompute(w.ctypes.data_as(p64), w.size, q,
                         out.ctypes.data_as(p64))
    return out


def psi_banks(qs, psis, ipsis, logN: int):
    """Bit-reversed psi power banks for all channels: (fwd, inv) uint64
    arrays of shape [C, N]; None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    qs = np.ascontiguousarray(np.asarray(qs, dtype=np.uint64))
    psis = np.ascontiguousarray(np.asarray(psis, dtype=np.uint64))
    ipsis = np.ascontiguousarray(np.asarray(ipsis, dtype=np.uint64))
    C = qs.shape[0]
    N = 1 << logN
    fwd = np.empty((C, N), dtype=np.uint64)
    inv = np.empty((C, N), dtype=np.uint64)
    pp = ctypes.POINTER(ctypes.c_uint64)
    lib.psi_banks(qs.ctypes.data_as(pp), psis.ctypes.data_as(pp),
                  ipsis.ctypes.data_as(pp), C, logN,
                  fwd.ctypes.data_as(pp), inv.ctypes.data_as(pp))
    return fwd, inv
