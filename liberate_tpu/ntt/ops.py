"""Polynomial modular ops over packed uint32-limb arrays (pure jnp / XLA path).

A poly is a jnp.uint32 array of shape [2, C, N] (limb-major; see
liberate_tpu.ntt.u64). Per-channel Montgomery constants come in a
``LevelPack`` (see ntt_context). Every op here is a pure function: they
compose into jitted pipelines and shard trivially along the channel axis.

Semantics are bit-exact mirrors of the reference CUDA kernels
(reference: src/liberate/ntt/ntt_cuda_kernel.cu); validated against
liberate_tpu.ntt.golden in tests/test_ops.py.

The NTT is the Longa-Naehrig negacyclic transform expressed as logN
reshape+elementwise stages: stage ``logm`` views the coefficient axis as
[m, 2, t] so the even/odd butterfly halves are contiguous — no gathers, no
index tables; XLA lowers each stage to fused vector ops (and the Pallas
backend runs all stages in VMEM).
"""

from functools import partial

import jax.numpy as jnp
import numpy as np

from . import u64

__all__ = [
    "mont_mult", "mont_mult_signed", "mont_enter", "mont_enter_scale",
    "mont_enter_scalar", "mont_redc", "mont_add", "mont_sub",
    "reduce_2q", "make_signed", "make_unsigned", "tile_unsigned",
    "ntt", "intt", "enter_ntt", "intt_exit", "intt_exit_reduce",
    "intt_exit_reduce_signed", "neg",
]


def _consts(pack, extra_dims):
    """Broadcast per-channel u32 constants [C] -> [C, 1, ...]."""
    shape = (-1,) + (1,) * extra_dims
    return (pack.ql.reshape(shape), pack.qh.reshape(shape),
            pack.kl.reshape(shape), pack.kh.reshape(shape))


def _pair(x):
    return x[0], x[1]


def _q2(pack, extra_dims):
    shape = (-1,) + (1,) * extra_dims
    return (pack.q2[0].reshape(shape), pack.q2[1].reshape(shape))


def _cond_sub(v, q2):
    over = ~u64.lt_signed(v, q2)
    return u64.select(over, u64.sub(v, q2), v)


# -- pointwise Montgomery ops -------------------------------------------------


def mont_mult(a, b, pack):
    ql, qh, kl, kh = _consts(pack, a.ndim - 2)
    r = u64.montmul(_pair(a), _pair(b), ql, qh, kl, kh)
    return u64.pack(*r)


def mont_mult_signed(a, b, pack):
    ql, qh, kl, kh = _consts(pack, a.ndim - 2)
    r = u64.montmul_signed(_pair(a), _pair(b), ql, qh, kl, kh)
    return u64.pack(*r)


def mont_enter(a, pack):
    """Enter Montgomery form: multiply by R^2 (-> a*R mod q)."""
    return mont_mult(a, pack.Rs[:, :, None], pack)


def mont_enter_scale(a, pack):
    """Multiply by scale*R (encode-side fused scaling)."""
    return mont_mult(a, pack.Rs_scale[:, :, None], pack)


def mont_enter_scalar(a, scalar, pack, signed=False):
    """Multiply by a per-channel Montgomery-form scalar [2, C]."""
    b = scalar[:, :, None] if a.ndim == 3 else scalar
    return (mont_mult_signed if signed else mont_mult)(a, b, pack)


def mont_redc(a, pack):
    ql, qh, kl, kh = _consts(pack, a.ndim - 2)
    r = u64.montredc(_pair(a), ql, qh, kl, kh)
    return u64.pack(*r)


def mont_add(a, b, pack):
    q2 = _q2(pack, a.ndim - 2)
    return u64.pack(*_cond_sub(u64.add(_pair(a), _pair(b)), q2))


def mont_sub(a, b, pack):
    q2 = _q2(pack, a.ndim - 2)
    s = u64.add(_pair(a), q2)
    s = u64.sub(s, _pair(b))
    return u64.pack(*_cond_sub(s, q2))


def reduce_2q(a, pack):
    q2 = _q2(pack, a.ndim - 2)
    q = u64.shr(q2, 1)
    lt = u64.lt_signed(_pair(a), q)
    return u64.pack(*u64.select(lt, _pair(a), u64.sub(_pair(a), q)))


def make_signed(a, pack):
    """[0, q) -> centered two's-complement representative."""
    q2 = _q2(pack, a.ndim - 2)
    q = u64.shr(q2, 1)
    q_half = u64.shr(q, 1)
    le = ~u64.lt_signed(q_half, _pair(a))
    return u64.pack(*u64.select(le, _pair(a), u64.sub(_pair(a), q)))


def make_unsigned(a, pack):
    q2 = _q2(pack, a.ndim - 2)
    q = u64.shr(q2, 1)
    return u64.pack(*u64.add(_pair(a), q))


def tile_unsigned(a, pack):
    """Broadcast a signed [2, N] (or [2, 1, N]) poly to [2, C, N]: a + q."""
    if a.ndim == 2:
        a = a[:, None, :]
    C = pack.q2.shape[1]
    q2 = _q2(pack, a.ndim - 2)
    q = u64.shr(q2, 1)
    lo = jnp.broadcast_to(a[0], (C, a.shape[2]))
    hi = jnp.broadcast_to(a[1], (C, a.shape[2]))
    return u64.pack(*u64.add((lo, hi), q))


def neg(a, pack):
    """Modular negation keeping values non-negative: (2q - a) mod-corrected.

    The reference stores two's-complement negatives and repairs signedness
    later (reference: ckks_engine.py:2035-2046); we keep the lazy-residue
    invariant [0, 2q) instead — identical mod q.
    """
    q2 = _q2(pack, a.ndim - 2)
    s = u64.sub(q2, _pair(a))
    return u64.pack(*_cond_sub(s, q2))


# -- NTT / INTT ----------------------------------------------------------------


def ntt(a, pack):
    """Forward negacyclic NTT over [2, C, N]; preserves Montgomery domain."""
    _, C, N = a.shape
    logN = N.bit_length() - 1
    ql, qh, kl, kh = _consts(pack, 2)
    q2 = _q2(pack, 2)
    for logm in range(logN):
        m = 1 << logm
        t = N >> (logm + 1)
        v = a.reshape(2, C, m, 2, t)
        U = (v[0, :, :, 0, :], v[1, :, :, 0, :])
        O = (v[0, :, :, 1, :], v[1, :, :, 1, :])
        S = pack.psi[logm]
        Sp = (S[0][:, :, None], S[1][:, :, None])
        V = u64.montmul(Sp, O, ql, qh, kl, kh)
        even = _cond_sub(u64.add(U, V), q2)
        odd = _cond_sub(u64.sub(u64.add(U, q2), V), q2)
        a = jnp.stack(
            [jnp.stack([even[0], odd[0]], axis=2),
             jnp.stack([even[1], odd[1]], axis=2)], axis=0
        ).reshape(2, C, N)
    return a


def intt_no_norm(a, pack):
    """Gentleman-Sande inverse NTT without the final N^{-1} normalization."""
    _, C, N = a.shape
    logN = N.bit_length() - 1
    ql, qh, kl, kh = _consts(pack, 2)
    q2 = _q2(pack, 2)
    for logm in range(logN, 0, -1):
        h = 1 << (logm - 1)
        t = N >> logm
        v = a.reshape(2, C, h, 2, t)
        U = (v[0, :, :, 0, :], v[1, :, :, 0, :])
        V = (v[0, :, :, 1, :], v[1, :, :, 1, :])
        S = pack.ipsi[logm - 1]
        Sp = (S[0][:, :, None], S[1][:, :, None])
        O = _cond_sub(u64.sub(u64.add(U, q2), V), q2)
        W = u64.montmul(Sp, O, ql, qh, kl, kh)
        even = _cond_sub(u64.add(U, V), q2)
        a = jnp.stack(
            [jnp.stack([even[0], W[0]], axis=2),
             jnp.stack([even[1], W[1]], axis=2)], axis=0
        ).reshape(2, C, N)
    return a


def intt(a, pack):
    """Inverse NTT with N^{-1} normalization (Ninv = N^{-1}*R mod q)."""
    a = intt_no_norm(a, pack)
    return mont_mult(a, pack.Ninv[:, :, None], pack)


# -- fused chains (reference: ntt_cuda_kernel.cu:349-423, 709-903) -------------


def enter_ntt(a, pack):
    return ntt(mont_enter(a, pack), pack)


def intt_exit(a, pack):
    return mont_redc(intt(a, pack), pack)


def intt_exit_reduce(a, pack):
    return reduce_2q(intt_exit(a, pack), pack)


def intt_exit_reduce_signed(a, pack):
    return make_signed(intt_exit_reduce(a, pack), pack)
