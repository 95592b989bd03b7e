"""Polynomial modular ops over packed uint32-limb arrays (pure jnp / XLA path).

A poly is a jnp.uint32 array of shape [2, C, N] (limb-major; see
liberate_tpu.ntt.u64). Per-channel Montgomery constants come in a
``LevelPack`` (see ntt_context). Every op here is a pure function: they
compose into jitted pipelines and shard trivially along the channel axis.

Semantics are bit-exact mirrors of the reference CUDA kernels
(reference: src/liberate/ntt/ntt_cuda_kernel.cu); validated against
liberate_tpu.ntt.golden in tests/test_ops.py.

The NTT is the Longa-Naehrig negacyclic transform expressed as ONE
lax.fori_loop whose body performs a shape-invariant butterfly stage via
precomputed index banks (see _stage_banks): jit traces stay small at any
logN, and the same code handles batched [2, P, C, N] inputs (the key
switcher batches gadget parts through a single NTT). The Pallas TPU
backend replaces this with a fused in-VMEM kernel.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import u64

__all__ = [
    "mont_mult", "mont_mult_signed", "mont_enter", "mont_enter_scale",
    "mont_enter_scalar", "mont_redc", "mont_add", "mont_sub",
    "reduce_2q", "make_signed", "make_unsigned", "tile_unsigned",
    "fit_channels",
    "ntt", "intt", "enter_ntt", "intt_exit", "intt_exit_reduce",
    "intt_exit_reduce_signed", "neg",
]


def _consts(pack, extra_dims):
    """Broadcast per-channel u32 constants [C] so the channel axis lands at
    axis -2 of the data: [C, 1] for [C, N] data, [1, C, 1] for batched
    [P, C, N] data (the key switcher batches gadget parts)."""
    shape = (1,) * (extra_dims - 1) + (-1, 1)
    return (pack.ql.reshape(shape), pack.qh.reshape(shape),
            pack.kl.reshape(shape), pack.kh.reshape(shape))


def _pair(x):
    return x[0], x[1]


def _q2(pack, extra_dims):
    shape = (1,) * (extra_dims - 1) + (-1, 1)
    return (pack.q2[0].reshape(shape), pack.q2[1].reshape(shape))


def _bcast_scalar(scalar, ndim):
    """Reshape a packed per-channel scalar [2, C] to broadcast against
    packed data of the given ndim ([2, ..., C, N])."""
    extra = ndim - 3
    return scalar.reshape(scalar.shape[:1] + (1,) * extra
                          + (scalar.shape[1], 1))


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


def mont_enter(a, pack, signed=False):
    """Enter Montgomery form: multiply by R^2 (-> a*R mod q)."""
    b = _bcast_scalar(pack.Rs, a.ndim)
    return (mont_mult_signed if signed else mont_mult)(a, b, pack)


def mont_enter_scale(a, pack):
    """Multiply by scale*R (encode-side fused scaling)."""
    return mont_mult(a, _bcast_scalar(pack.Rs_scale, a.ndim), pack)


def mont_enter_scalar(a, scalar, pack, signed=False):
    """Multiply by a per-channel Montgomery-form scalar [2, C]."""
    b = _bcast_scalar(scalar, a.ndim)
    return (mont_mult_signed if signed else mont_mult)(a, b, pack)


def mont_redc(a, pack):
    ql, qh, kl, kh = _consts(pack, a.ndim - 2)
    r = u64.montredc(_pair(a), ql, qh, kl, kh)
    return u64.pack(*r)


def mont_redc_signed(a, pack):
    """Montgomery reduce tolerating wrapped-negative int64 inputs."""
    ql, qh, kl, kh = _consts(pack, a.ndim - 2)
    r = u64.montredc_signed(_pair(a), ql, qh, kl, kh)
    return u64.pack(*r)


def pack_slice(pack, start, stop, with_psi=False):
    """Restrict a LevelPack to the channel slice [start, stop).

    The sliced pack is for pointwise ops only: the Pallas plan is dropped
    (its twiddle planes are full-layout).
    """
    psi = ipsi = None
    if with_psi and pack.psi is not None:
        psi = pack.psi[:, start:stop]
        ipsi = pack.ipsi[:, start:stop]
    return pack._replace(
        pallas=None,
        mxu=None,
        coef=None,
        ql=pack.ql[start:stop], qh=pack.qh[start:stop],
        kl=pack.kl[start:stop], kh=pack.kh[start:stop],
        q2=pack.q2[:, start:stop], Rs=pack.Rs[:, start:stop],
        Rs_scale=pack.Rs_scale[:, start:stop], Ninv=pack.Ninv[:, start:stop],
        psi=psi, ipsi=ipsi,
    )


def fit_channels(d, W):
    """Slice or zero-pad the channel axis (axis -2) to width ``W``.

    The multi-chip layout pads every channel axis to a multiple of the mesh
    size (see liberate_tpu.parallel): real channels are always a contiguous
    prefix; padded rows are never read back and only need to stay bounded
    under every modular op, which zeros do ([0, q) closed under the whole
    lazy-residue op set). Zero-pad specifically (NOT mode="edge"): the
    edge pad lowers to slice+broadcast+reshape, which the GSPMD
    partitioner can only reshard by full rematerialization on sharded
    channel axes (the round-4 keygen SPMD warning); a constant pad is one
    trivially-shardable HLO.
    """
    C = d.shape[-2]
    if C == W:
        return d
    if C > W:
        return d[..., :W, :]
    pad = [(0, 0)] * d.ndim
    pad[-2] = (0, W - C)
    return jnp.pad(d, pad)


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


def canon_2q(a, pack):
    """Repair two's-complement negatives in (-2q, 2q) to the lazy [0, 2q).

    Keeps all downstream operands non-negative so the fast (unsigned)
    Montgomery path applies; used after signed coefficient permutations.
    """
    q2 = _q2(pack, a.ndim - 2)
    neg = (a[1].astype(jnp.int32) < 0)
    fixed = u64.add(_pair(a), q2)
    lo = jnp.where(neg, fixed[0], a[0])
    hi = jnp.where(neg, fixed[1], a[1])
    return u64.pack(lo, hi)


def apply_signed_perm(a, gather_idx, neg_mask):
    """Signed coefficient permutation out[j] = (-1)^neg[j] * a[..., idx[j]].

    The Galois automorphism mu_p on negacyclic polynomials: coefficients
    permute and wrap with a sign flip (reference: encdec.py:224-270). The
    negation is two's-complement (0 - x), exactly like the reference's
    torch tensor negation; the consumer repairs signedness afterwards with
    make_unsigned (reference: ckks_engine.py:1196-1200).
    """
    g = jnp.take(a, gather_idx, axis=-1)
    zero = jnp.zeros_like(g[0])
    neg = u64.sub((zero, zero), (g[0], g[1]))
    lo = jnp.where(neg_mask, neg[0], g[0])
    hi = jnp.where(neg_mask, neg[1], g[1])
    return u64.pack(lo, hi)


# -- NTT / INTT ----------------------------------------------------------------


_STAGE_BANKS = {}


def _stage_banks(N: int):
    """Per-stage butterfly index banks, shared by forward and inverse NTT.

    Stage ``s`` views the coefficient axis as [m, 2, t] blocks with
    m = 2^s, t = N >> (s+1): pair j sits at (u, u+t) with u = (j//t)*2t +
    j%t, and uses twiddle bank entry m + j//t (the Longa-Naehrig layout the
    reference paints into tables — reference: ckks_context.py:89-112). The
    banks make every stage's computation shape-identical, so the whole NTT
    is ONE lax.fori_loop stage body instead of logN unrolled stages — this
    keeps jit traces (and XLA compile times) small at any logN.
    """
    if N in _STAGE_BANKS:
        return _STAGE_BANKS[N]
    logN = N.bit_length() - 1
    u_b, o_b, t_b = [], [], []
    for s in range(logN):
        m = 1 << s
        t = N >> (s + 1)
        j = np.arange(N // 2)
        b = j // t
        u = b * 2 * t + j % t
        u_b.append(u)
        o_b.append(u + t)
        t_b.append(m + b)
    # Cached as numpy: jnp conversion happens per call so no device array
    # created inside one jit trace leaks into another.
    banks = (np.stack(u_b).astype(np.int32),
             np.stack(o_b).astype(np.int32),
             np.stack(t_b).astype(np.int32))
    _STAGE_BANKS[N] = banks
    return banks


def mxu_kernels_ok(ref) -> bool:
    """Whether the fused Pallas MXU kernels can serve this ref: flags on,
    and either single-chip or a channel-SHARDED mesh plan (which runs
    per-shard under shard_map). Replicated non-divisible mesh layouts
    take the XLA einsum composition instead — GSPMD cannot partition a
    pallas_call."""
    from .. import config

    if not (config.use_mxu_pallas and config.pallas_enabled()):
        return False
    return (not ref.on_mesh) or ref.mesh is not None


def ntt(a, pack, signed=False):
    """Forward negacyclic NTT over [2, C, N]; preserves Montgomery domain.

    Cooley-Tukey butterflies, natural-order input, bit-reversed output
    (reference: ntt_cuda_kernel.cu:237-342). ``signed=True`` mirrors the
    CUDA kernel's int64 (arithmetic-shift) semantics for inputs that may be
    wrapped-negative — the key-switching basis-extension outputs
    (reference: ckks_engine.py:917-920); the lazy [0, 2q) fast path assumes
    non-negative inputs < 2^62.

    Dispatches to the fused Pallas TPU kernel when the pack carries a plan,
    or to the MXU matmul backend (natural-order domain) when it carries an
    MxuRef — see liberate_tpu.config.use_mxu_ntt.
    """
    if pack.coef is not None:
        from ..parallel import coef_shard

        if signed:
            a = make_unsigned(a, pack)
        return coef_shard.ntt_coef_sharded(a, pack.coef)
    if pack.mxu is not None:
        from .. import config
        from . import mxu_ntt

        if signed:
            a = make_unsigned(a, pack)
        if mxu_kernels_ok(pack.mxu):
            from . import mxu_pallas

            return mxu_pallas.dispatch(a, pack.mxu,
                                       interpret=config.pallas_interpret)
        return mxu_ntt.ntt(a, pack.mxu.resolve())
    if pack.pallas is not None:
        from .. import config
        from . import pallas_ntt

        return pallas_ntt.ntt(a, pack.pallas, signed=signed,
                              interpret=config.pallas_interpret)
    mm = u64.montmul_signed if signed else u64.montmul
    N = a.shape[-1]
    logN = N.bit_length() - 1
    u_idx, o_idx, tw_idx = (jnp.asarray(b) for b in _stage_banks(N))
    ql, qh, kl, kh = _consts(pack, a.ndim - 2)
    q2 = _q2(pack, a.ndim - 2)
    psi = pack.psi

    def body(s, a):
        ui, oi, ti = u_idx[s], o_idx[s], tw_idx[s]
        U = (jnp.take(a[0], ui, axis=-1), jnp.take(a[1], ui, axis=-1))
        O = (jnp.take(a[0], oi, axis=-1), jnp.take(a[1], oi, axis=-1))
        S = (jnp.take(psi[0], ti, axis=-1), jnp.take(psi[1], ti, axis=-1))
        # The data operand O may be wrapped-negative; twiddles never are.
        V = mm(O, S, ql, qh, kl, kh) if signed \
            else u64.montmul(S, O, ql, qh, kl, kh)
        even = _cond_sub(u64.add(U, V), q2)
        odd = _cond_sub(u64.sub(u64.add(U, q2), V), q2)
        a = a.at[..., ui].set(u64.pack(*even), unique_indices=True)
        a = a.at[..., oi].set(u64.pack(*odd), unique_indices=True)
        return a

    return jax.lax.fori_loop(0, logN, body, a)


def intt_no_norm(a, pack, signed=False):
    """Gentleman-Sande inverse NTT without the final N^{-1} normalization
    (reference: ntt_cuda_kernel.cu:434-548)."""
    mm = u64.montmul_signed if signed else u64.montmul
    N = a.shape[-1]
    logN = N.bit_length() - 1
    u_idx, o_idx, tw_idx = (jnp.asarray(b) for b in _stage_banks(N))
    ql, qh, kl, kh = _consts(pack, a.ndim - 2)
    q2 = _q2(pack, a.ndim - 2)
    ipsi = pack.ipsi

    def body(i, a):
        s = logN - 1 - i
        ui, oi, ti = u_idx[s], o_idx[s], tw_idx[s]
        U = (jnp.take(a[0], ui, axis=-1), jnp.take(a[1], ui, axis=-1))
        V = (jnp.take(a[0], oi, axis=-1), jnp.take(a[1], oi, axis=-1))
        S = (jnp.take(ipsi[0], ti, axis=-1), jnp.take(ipsi[1], ti, axis=-1))
        O = _cond_sub(u64.sub(u64.add(U, q2), V), q2)
        W = mm(O, S, ql, qh, kl, kh) if signed \
            else u64.montmul(S, O, ql, qh, kl, kh)
        even = _cond_sub(u64.add(U, V), q2)
        a = a.at[..., ui].set(u64.pack(*even), unique_indices=True)
        a = a.at[..., oi].set(u64.pack(*W), unique_indices=True)
        return a

    return jax.lax.fori_loop(0, logN, body, a)


def intt(a, pack, signed=False):
    """Inverse NTT with N^{-1} normalization (Ninv = N^{-1}*R mod q)."""
    if pack.coef is not None:
        from ..parallel import coef_shard

        if signed:
            a = make_unsigned(a, pack)
        return coef_shard.intt_coef_sharded(a, pack.coef)
    if pack.mxu is not None:
        from .. import config
        from . import mxu_ntt

        if signed:
            a = make_unsigned(a, pack)
        # N^{-1} is folded into the MXU stage-2 table (plain, which equals
        # the classic path's Montgomery Ninv multiply after REDC).
        if mxu_kernels_ok(pack.mxu):
            from . import mxu_pallas

            return mxu_pallas.dispatch(a, pack.mxu, inverse=True,
                                       interpret=config.pallas_interpret)
        return mxu_ntt.intt_no_norm_factor(a, pack.mxu.resolve())
    if pack.pallas is not None:
        from .. import config
        from . import pallas_ntt

        return pallas_ntt.intt(a, pack.pallas, signed=signed,
                               interpret=config.pallas_interpret)
    a = intt_no_norm(a, pack, signed=signed)
    b = _bcast_scalar(pack.Ninv, a.ndim)
    return (mont_mult_signed if signed else mont_mult)(a, b, pack)


# -- fused chains (reference: ntt_cuda_kernel.cu:349-423, 709-903) -------------


def enter_ntt(a, pack):
    if pack.coef is not None:
        from ..parallel import coef_shard

        return coef_shard.ntt_coef_sharded(a, pack.coef, pre_enter=True)
    if pack.mxu is not None:
        from .. import config

        if mxu_kernels_ok(pack.mxu):
            from . import mxu_pallas

            # Montgomery enter folded into the stage-1 tables: the
            # transform of a*R in one kernel (no XLA mont_enter pass).
            return mxu_pallas.dispatch(a, pack.mxu, enter=True,
                                       interpret=config.pallas_interpret)
        return ntt(mont_enter(a, pack), pack)
    if pack.pallas is not None:
        from .. import config
        from . import pallas_ntt

        return pallas_ntt.ntt(a, pack.pallas, pre_enter=True,
                              interpret=config.pallas_interpret)
    return ntt(mont_enter(a, pack), pack)


def intt_exit(a, pack, signed=False):
    if pack.coef is not None:
        from ..parallel import coef_shard

        if signed:
            a = make_unsigned(a, pack)
        return coef_shard.intt_coef_sharded(a, pack.coef, post_exit=True)
    if pack.mxu is not None:
        from .. import config

        if mxu_kernels_ok(pack.mxu):
            from . import mxu_pallas

            if signed:
                a = make_unsigned(a, pack)
            # Montgomery exit folded into the stage-2 tables.
            return mxu_pallas.dispatch(a, pack.mxu, inverse=True,
                                       exitx=True,
                                       interpret=config.pallas_interpret)
        r = intt(a, pack, signed=signed)
        return mont_redc(r, pack)
    if pack.pallas is not None:
        from .. import config
        from . import pallas_ntt

        return pallas_ntt.intt(a, pack.pallas, signed=signed, post_exit=True,
                               interpret=config.pallas_interpret)
    if signed:
        return mont_redc_signed(intt(a, pack, signed=True), pack)
    return mont_redc(intt(a, pack), pack)


def intt_exit_reduce(a, pack, signed=False):
    if pack.coef is not None:
        from ..parallel import coef_shard

        if signed:
            a = make_unsigned(a, pack)
        return coef_shard.intt_coef_sharded(a, pack.coef, post_exit=True,
                                            post_reduce=True)
    if pack.mxu is not None:
        from .. import config

        if mxu_kernels_ok(pack.mxu):
            from . import mxu_pallas

            if signed:
                a = make_unsigned(a, pack)
            return mxu_pallas.dispatch(a, pack.mxu, inverse=True,
                                       exitx=True, post_reduce=True,
                                       interpret=config.pallas_interpret)
        return reduce_2q(intt_exit(a, pack, signed=signed), pack)
    if pack.pallas is not None:
        from .. import config
        from . import pallas_ntt

        return pallas_ntt.intt(a, pack.pallas, signed=signed, post_exit=True,
                               post_reduce=True,
                               interpret=config.pallas_interpret)
    return reduce_2q(intt_exit(a, pack, signed=signed), pack)


def intt_exit_reduce_signed(a, pack):
    return make_signed(intt_exit_reduce(a, pack), pack)


def intt_reduce(a, pack):
    """Inverse NTT + N^{-1} normalize + [0,2q)->[0,q) reduce, with NO
    Montgomery exit. Used by the Shoup-form key switch
    (config.use_shoup_extend): the basis extension is plain-domain, so
    the ksk products carry exactly one R factor which the normalize's
    montmul consumes — the result is already plain."""
    if pack.mxu is not None:
        from .. import config

        if mxu_kernels_ok(pack.mxu):
            from . import mxu_pallas

            return mxu_pallas.dispatch(a, pack.mxu, inverse=True,
                                       post_reduce=True,
                                       interpret=config.pallas_interpret)
        return reduce_2q(intt(a, pack), pack)
    if pack.pallas is not None:
        from .. import config
        from . import pallas_ntt

        return pallas_ntt.intt(a, pack.pallas, post_exit=False,
                               post_reduce=True,
                               interpret=config.pallas_interpret)
    return reduce_2q(intt(a, pack), pack)
