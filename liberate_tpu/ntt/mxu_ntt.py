"""MXU (systolic-array) negacyclic NTT: the transform as int8 matmuls.

The direct butterfly NTT is VPU-bound on TPU: every butterfly is an
emulated 62-bit Montgomery multiply (~60 vector int ops), and the VPU is
the scarce resource in the whole CKKS pipeline. This module reformulates
the transform so the O(N log N) multiply work becomes O(N sqrt N) int8
MACs on the MXU (~394 TOPS on v5e vs ~2 T int-op/s on the VPU), leaving
the VPU only one twiddle multiply and two digit recombinations per
element. It is the TPU answer to the reference's per-stage butterfly
kernels (reference: ntt_cuda_kernel.cu:237-342) — there is no CUDA
counterpart; tensor-core NTT literature uses the same decomposition idea.

Math (per RNS channel q, N = R*S, psi a primitive 2N-th root, W = psi^2):
    data viewed as A[r, s] = a[s*R + r]
    stage 1:  B[k2, r]   = sum_s M1[k2, s] * A[r, s]
              M1[k2, s]  = W_S^{s k2} * psi^{R s}          (W_S = W^R)
    twiddle:  B'[k2, r]  = B[k2, r] * psi^r W^{r k2}
    stage 2:  X[k1*S+k2] = sum_r M2[k1, r] * B'[k2, r]     (W_R = W^S)
              M2[k1, r]  = W_R^{r k1}
giving X[k] = sum_n a[n] psi^n W^{nk} in NATURAL order — a fixed
permutation of the classic bit-reversed-output butterfly NTT. Both
transforms evaluate at the same point set, and the engine only ever uses
the NTT domain pointwise (ct/ksk products, NTT-domain uniform sampling),
so the backends are interchangeable as long as one engine instance uses
one backend throughout (intt here inverts exactly this map).

Exact integer matmuls over Z via base-256 digits (validated vs brute
force and the golden model in tests/test_mxu.py):
  * table side (host): fold the data-digit weights into the table,
    M^(v) = M * 2^{8v} mod q, and decompose each M^(v) into dA=8
    BALANCED digits in [-128, 127] (exact carry propagation; q < 2^61).
  * data side (device): dB=8 unsigned base-256 digits, shipped as s8
    via the -128 offset; the offset correction 128*rowsum(digits) is a
    precomputed per-row constant.
  * one einsum per stage contracts the merged (digit, position) axis:
    E_u = sum_{v,pos} M_dig[u, v, out, pos] * B_dig[v, pos, col],
    |E_u| <= dB * K * 128^2 + corrections < 2^28  (int32-exact).
  * V = sum_u E_u 2^{8u} splits as V_lo + 2^40 V_hi with |V_lo| < 2^60,
    |V_hi| < 2^52, and the result is two signed Montgomery multiplies:
    V_lo * (R mod q) + V_hi * (2^40 R mod q)  ->  V mod q in [0, 2q).
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import u64

U32 = jnp.uint32

_ARRAY_FIELDS = ("m1", "m1_rs", "tw", "m2", "m2_rs",
                 "i1", "i1_rs", "itw", "i2", "i2_rs",
                 "c_lo", "c_hi", "ql", "qh", "kl", "kh", "q2",
                 "bp", "whi", "wphi", "corr",
                 "m1e", "m1e_rs", "i2x", "i2x_rs")


@dataclasses.dataclass(frozen=True)
class MxuPlan:
    """Per-channel matmul tables for one channel set.

    Registered as a pytree with the shape parameters static (like
    pallas_ntt.PallasPlan), so plans pass through jit as arguments and
    the digit loops unroll at trace time.
    dA: balanced table digits (ceil(qbits / 8));
    dB: data digits (ceil((word_bits + 1) / 8));
    split: V_lo takes digit weights 2^0..2^{8(split-1)}, V_hi the rest
    (empty when dA <= split: 30-bit mode needs one Montgomery multiply
    per element instead of two).
    """
    R: int
    S: int
    dA: int
    dB: int
    split: int
    # forward: stage-1 [C, dA, S, dB*S] s8, stage-2 [C, dA, R, dB*R] s8
    m1: jnp.ndarray
    m1_rs: jnp.ndarray       # [C, dA, S] int32 offset corrections
    tw: jnp.ndarray          # [2, C, S, R] Montgomery-form twiddles
    m2: jnp.ndarray
    m2_rs: jnp.ndarray       # [C, dA, R] int32
    # inverse: stage-1 contracts k1 (R), stage-2 contracts k2 (S)
    i1: jnp.ndarray          # [C, dA, R, dB*R] s8
    i1_rs: jnp.ndarray
    itw: jnp.ndarray         # [2, C, S, R] (indexed [k2, j])
    i2: jnp.ndarray          # [C, dA, S, dB*S] s8
    i2_rs: jnp.ndarray
    # reduction constants, Montgomery style:
    # c_lo = R mod q, c_hi = 2^{8*split} R mod q
    c_lo: jnp.ndarray        # [2, C]
    c_hi: jnp.ndarray        # [2, C]
    ql: jnp.ndarray          # [C] u32 (replicated from the pack for
    qh: jnp.ndarray          # self-contained kernel signatures)
    kl: jnp.ndarray
    kh: jnp.ndarray
    q2: jnp.ndarray          # [2, C]
    # Shoup-form recombination constants (mxu_pallas kernels): Barrett
    # reciprocal floor(2^64/q), plain 2^{8*split} mod q + its Shoup
    # quotient, and the combined +2^63-offset correction
    # (-2^63*(1 + whi) mod q, or -2^63 when dA <= split).
    bp: jnp.ndarray          # [2, C]
    whi: jnp.ndarray         # [2, C]
    wphi: jnp.ndarray        # [2, C]
    corr: jnp.ndarray        # [2, C]
    # Enter/exit-folded table variants (mxu_pallas): m1e = M1 * R mod q
    # (forward transform of a * R — replaces the XLA mont_enter pass);
    # i2x = I2 * R^{-1} mod q (inverse with the Montgomery exit folded —
    # replaces the XLA mont_redc pass).
    m1e: jnp.ndarray         # [C, dA, S, dB*S] s8
    m1e_rs: jnp.ndarray      # [C, dA, S] i32
    i2x: jnp.ndarray         # [C, dA, S, dB*S] s8
    i2x_rs: jnp.ndarray      # [C, dA, S] i32

    def tree_flatten(self):
        return (tuple(getattr(self, f) for f in _ARRAY_FIELDS),
                (self.R, self.S, self.dA, self.dB, self.split))

    @classmethod
    def tree_unflatten(cls, aux, children):
        R, S, dA, dB, split = aux
        return cls(R, S, dA, dB, split, *children)


jax.tree_util.register_pytree_node(
    MxuPlan, lambda p: p.tree_flatten(), MxuPlan.tree_unflatten)


def _balanced_digits_np(M, nd):
    """uint64 array -> [nd, *M.shape] int8 balanced base-256 digits."""
    out = np.zeros((nd,) + M.shape, dtype=np.int8)
    x = M.astype(object)
    for u in range(nd):
        d = x & 0xFF
        x = x >> 8
        carry = d > 127
        d = np.where(carry, d - 256, d)
        x = x + carry
        out[u] = d.astype(np.int64)
    assert not np.any(x), "table entry too large for nd balanced digits"
    return out


def _decompose_table(M, q, dA, dB):
    """M: [out, in] uint64 < q. Returns (digits s8 [dA, out, dB*in],
    rowsum corrections i32 [dA, out]).

    Runs in the native C++ host-math runtime when available (exact
    __int128 arithmetic, ~100x the numpy-object path — the platinum
    master build drops from minutes to seconds); the Python path below
    is the portable oracle (tests/test_mxu.py pins them identical)."""
    from .. import native

    r = native.mxu_decompose(M, int(q), dA, dB)
    if r is not None:
        return r
    O, I = M.shape
    digs = np.zeros((dA, O, dB, I), dtype=np.int8)
    for v in range(dB):
        Mv = ((M.astype(object) * pow(2, 8 * v, q)) % q).astype(np.uint64)
        digs[:, :, v, :] = _balanced_digits_np(Mv, dA)
    rs = 128 * digs.astype(np.int64).sum(axis=(2, 3))
    assert np.abs(rs).max() < 2 ** 31
    return digs.reshape(dA, O, dB * I), rs.astype(np.int32)


def _pow_table(base, q, n):
    """[base^0, .., base^{n-1}] mod q as uint64."""
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = acc * base % q
    return out


def digit_params(word_bits):
    """(dA, dB, split) for a buffer word size.

    dB covers data values < 2^{word_bits+1} (lazy [0, 2q) residues);
    dA covers table entries < q < 2^{word_bits-1}; split keeps
    |V_lo| < 2^62 (|E_u| < 2^28, so weights up to 2^{8*(split-1)} with
    8*(split-1) + 28 < 62).
    """
    dB = -(-(word_bits + 1) // 8)
    dA = -(-(word_bits - 1) // 8)
    split = min(dA, 5)
    return dA, dB, split


def channel_digit_params(q):
    """(dA, dB) for ONE modulus: dA = fewest balanced base-256 digits
    whose positive capacity covers q-1 (127 * (256^dA - 1) / 255);
    dB = bytes covering the lazy residue bound 2q. 40-bit scale primes
    get (6, 6) — 36 MACs and ~56% of the table bytes of the uniform
    62-bit (8, 8) parameters."""
    q = int(q)
    dA = 1
    while 127 * ((256 ** dA - 1) // 255) < q - 1:
        dA += 1
    dB = -(-((2 * q - 1).bit_length()) // 8)
    return dA, dB


def width_groups(q_list):
    """Contiguous channel runs with equal (dA, dB): [(start, stop,
    (dA, dB)), ...]. The global prime order [scales..., base, specials]
    makes this two runs for 40-bit-scale parameter sets."""
    runs = []
    for i, q in enumerate(q_list):
        p = channel_digit_params(q)
        if runs and runs[-1][1] == i and runs[-1][2] == p:
            runs[-1] = (runs[-1][0], i + 1, p)
        else:
            runs.append((i, i + 1, p))
    return runs


def make_plan(logN, q_list, R_list, psi_list, ipsi_list, Ninv_list,
              word_bits=62, dA=None, dB=None):
    """Host-side table build for one channel set.

    q_list: channel moduli; R_list: Montgomery radix R mod q per channel
    (R = 2^word_bits); psi/ipsi: primitive 2N-th roots and inverses;
    Ninv_list: N^{-1} mod q (plain). dA/dB override the word-size digit
    parameters for width-grouped plans (see width_groups). Reference
    analogue: the psi 'paint' tables of ckks_context.py:89-142,
    re-derived as matmul factors.
    """
    dA_w, dB_w, split = digit_params(word_bits)
    dA = dA_w if dA is None else dA
    dB = dB_w if dB is None else dB
    split = min(dA, 5)
    N = 1 << logN
    S = 1 << ((logN + 1) // 2)
    R = N // S
    C = len(q_list)

    m1 = np.zeros((C, dA, S, dB * S), dtype=np.int8)
    m1_rs = np.zeros((C, dA, S), dtype=np.int32)
    m1e = np.zeros((C, dA, S, dB * S), dtype=np.int8)
    m1e_rs = np.zeros((C, dA, S), dtype=np.int32)
    i2x = np.zeros((C, dA, S, dB * S), dtype=np.int8)
    i2x_rs = np.zeros((C, dA, S), dtype=np.int32)
    m2 = np.zeros((C, dA, R, dB * R), dtype=np.int8)
    m2_rs = np.zeros((C, dA, R), dtype=np.int32)
    i1 = np.zeros((C, dA, R, dB * R), dtype=np.int8)
    i1_rs = np.zeros((C, dA, R), dtype=np.int32)
    i2 = np.zeros((C, dA, S, dB * S), dtype=np.int8)
    i2_rs = np.zeros((C, dA, S), dtype=np.int32)
    tw = np.zeros((C, S, R), dtype=np.uint64)
    itw = np.zeros((C, S, R), dtype=np.uint64)
    c_lo = np.zeros(C, dtype=np.uint64)
    c_hi = np.zeros(C, dtype=np.uint64)
    bp = np.zeros(C, dtype=np.uint64)
    whi = np.zeros(C, dtype=np.uint64)
    wphi = np.zeros(C, dtype=np.uint64)
    corr = np.zeros(C, dtype=np.uint64)

    for c, (q, Rm, psi, ipsi, Ninv) in enumerate(
            zip(q_list, R_list, psi_list, ipsi_list, Ninv_list)):
        W = psi * psi % q
        Wi = ipsi * ipsi % q
        pw = _pow_table(W, q, N).astype(object)
        pwi = _pow_table(Wi, q, N).astype(object)
        ppsi = _pow_table(psi, q, 2 * N).astype(object)
        pipsi = _pow_table(ipsi, q, 2 * N).astype(object)

        k2v, sv = np.arange(S)[:, None], np.arange(S)[None, :]
        k1v, rv = np.arange(R)[:, None], np.arange(R)[None, :]
        # forward stage-1: M1[k2, s] = W^{R s k2} psi^{R s}
        M1 = (pw[(sv * k2v * R) % N] * ppsi[(sv * R) % (2 * N)]) % q
        m1[c], m1_rs[c] = _decompose_table(M1.astype(np.uint64), q, dA, dB)
        # enter-folded: transform of a * R in one pass
        M1e = (M1 * int(Rm)) % q
        m1e[c], m1e_rs[c] = _decompose_table(M1e.astype(np.uint64),
                                             q, dA, dB)
        # forward twiddle, [S(k2), R(r)] layout, Montgomery form
        TW = (ppsi[np.arange(R)[None, :]] *
              pw[(np.arange(R)[None, :] * np.arange(S)[:, None]) % N]
              ) % q
        tw[c] = ((TW * Rm) % q).astype(np.uint64)
        # forward stage-2: M2[k1, r] = W^{S r k1}
        M2 = pw[(rv * k1v * S) % N] % q
        m2[c], m2_rs[c] = _decompose_table(M2.astype(np.uint64), q, dA, dB)

        # inverse stage-1 (contract k1): I1[j, k1] = W^{-S j k1}
        jv = np.arange(R)[:, None]
        I1 = pwi[(jv * np.arange(R)[None, :] * S) % N] % q
        i1[c], i1_rs[c] = _decompose_table(I1.astype(np.uint64), q, dA, dB)
        # inverse twiddle [S(k2), R(j)]: psi^{-j} W^{-j k2}
        ITW = (pipsi[np.arange(R)[None, :]] *
               pwi[(np.arange(R)[None, :] * np.arange(S)[:, None]) % N]) % q
        itw[c] = ((ITW * Rm) % q).astype(np.uint64)
        # inverse stage-2 (contract k2): I2[s, k2] = W^{-R s k2} psi^{-R s} / N
        srow, k2col = np.arange(S)[:, None], np.arange(S)[None, :]
        I2 = (pwi[(srow * k2col * R) % N] * pipsi[(srow * R) % (2 * N)]
              * Ninv) % q
        i2[c], i2_rs[c] = _decompose_table(I2.astype(np.uint64), q, dA, dB)
        # exit-folded: the Montgomery exit (x -> x * R^{-1}) in the
        # inverse stage-2 table
        I2x = (I2 * pow(int(Rm), -1, q)) % q
        i2x[c], i2x_rs[c] = _decompose_table(I2x.astype(np.uint64),
                                             q, dA, dB)

        c_lo[c] = Rm % q
        c_hi[c] = (pow(2, 8 * split, q) * Rm) % q
        # Shoup recombination constants (mxu_pallas): V mod q via
        # barrett(v_lo + 2^63) + shoup(v_hi + 2^63, whi) + corr.
        bp[c] = (1 << 64) // q
        w_hi = pow(2, 8 * split, q)
        whi[c] = w_hi
        wphi[c] = (w_hi << 64) // q
        off = pow(2, 63, q)
        corr[c] = ((-off * (1 + (w_hi if dA > split else 0))) % q)

    def _pk(x64):  # uint64 [..] -> packed [2, ..] u32
        return jnp.asarray(u64.from_int64_np(
            x64.astype(np.int64)))

    return dict(R=R, S=S, dA=dA, dB=dB, split=split,
                m1=jnp.asarray(m1), m1_rs=jnp.asarray(m1_rs),
                tw=_pk(tw), m2=jnp.asarray(m2), m2_rs=jnp.asarray(m2_rs),
                i1=jnp.asarray(i1), i1_rs=jnp.asarray(i1_rs),
                itw=_pk(itw), i2=jnp.asarray(i2), i2_rs=jnp.asarray(i2_rs),
                c_lo=_pk(c_lo), c_hi=_pk(c_hi),
                bp=_pk(bp), whi=_pk(whi), wphi=_pk(wphi), corr=_pk(corr),
                m1e=jnp.asarray(m1e), m1e_rs=jnp.asarray(m1e_rs),
                i2x=jnp.asarray(i2x), i2x_rs=jnp.asarray(i2x_rs))


def plan_from_dict(d, ql, qh, kl, kh, q2):
    return MxuPlan(ql=ql, qh=qh, kl=kl, kh=kh, q2=q2, **d)


# Fields whose channel axis is axis 1 (packed [2, C, ...]); the rest put
# channels first ([C, ...] / [C]).
_C_AXIS1 = frozenset({"tw", "itw", "c_lo", "c_hi", "q2",
                      "bp", "whi", "wphi", "corr"})


def take_channels(plan: MxuPlan, idx):
    """Restrict a (master) plan to a channel index list.

    ``idx`` is static (a tuple), so inside jit this traces to gathers of
    full channel rows from the ONE master table set — per-level packs
    share the master's device storage instead of materializing per-level
    copies (the m1/i2 tables are ~4 MB per channel at logN=15).
    """
    idx = jnp.asarray(np.asarray(idx, dtype=np.int32))
    kw = {}
    for f in _ARRAY_FIELDS:
        x = getattr(plan, f)
        kw[f] = jnp.take(x, idx, axis=1 if f in _C_AXIS1 else 0)
    return MxuPlan(plan.R, plan.S, plan.dA, plan.dB, plan.split, **kw)


@dataclasses.dataclass(frozen=True)
class MxuRef:
    """A channel-restricted VIEW of the master plan, for LevelPacks.

    Holds the master plan plus a static channel index tuple; ``resolve``
    traces to gathers inside jit, so every level pack shares the one
    master table set on device (take_channels eagerly would copy ~10 MB
    per channel per level).

    ``groups``: width-grouped master plans ((gstart, gstop, MxuPlan),
    ...) over GLOBAL channel indices, with per-group digit parameters
    (width_groups) — consumed by the fused Pallas kernels
    (mxu_pallas.dispatch); empty means uniform word-size digits only.

    ``mesh``/``mesh_axis``: set on 1-D rns-mesh refs whose table arrays
    are CHANNEL-SHARDED over the mesh — mxu_pallas.dispatch then runs
    the fused kernels per-shard under jax.shard_map (like
    pallas_ntt._sharded_transform). ``on_mesh`` marks any mesh-sliced
    ref (including replicated non-divisible layouts, where the kernels
    cannot run and dispatch falls back to the XLA einsums).
    """
    plan: MxuPlan
    idx: tuple
    groups: tuple = ()
    mesh: object = None
    mesh_axis: str = "rns"
    on_mesh: bool = False

    def resolve(self) -> MxuPlan:
        if tuple(self.idx) == tuple(range(self.plan.ql.shape[0])):
            return self.plan
        return take_channels(self.plan, self.idx)

    def tree_flatten(self):
        gplans = tuple(g[2] for g in self.groups)
        gbounds = tuple((g[0], g[1]) for g in self.groups)
        return ((self.plan, gplans),
                (tuple(self.idx), gbounds, self.mesh, self.mesh_axis,
                 self.on_mesh))

    @classmethod
    def tree_unflatten(cls, aux, children):
        idx, gbounds, mesh, mesh_axis, on_mesh = aux
        plan, gplans = children
        groups = tuple((b[0], b[1], p) for b, p in zip(gbounds, gplans))
        return cls(plan, idx, groups, mesh, mesh_axis, on_mesh)


jax.tree_util.register_pytree_node(
    MxuRef, lambda r: r.tree_flatten(), MxuRef.tree_unflatten)


def _digits_s8(lo, hi, dB):
    """Packed u32 pair [.., C, X, Y] -> offset s8 digits [.., C, dB, X, Y].

    Digit v<4 comes from lo, v>=4 from hi (the 32-bit limb split is
    8-bit aligned). Offset by -128 so digits land in s8 exactly.
    """
    ds = []
    for v in range(dB):
        w = lo if v < 4 else hi
        sh = 8 * (v % 4)
        d = ((w >> U32(sh)) & U32(0xFF)).astype(jnp.int32) - 128
        ds.append(d.astype(jnp.int8))
    return jnp.stack(ds, axis=-3)


def _merge_zd(d):
    """[.., C, dB, K, J] -> [.., C, dB*K, J] (matches table digit layout)."""
    sh = d.shape
    return d.reshape(sh[:-3] + (sh[-3] * sh[-2], sh[-1]))


def _sext(e32):
    """int32 -> packed signed u32 pair (two's-complement sign extension)."""
    lo = e32.astype(jnp.uint32)
    hi = (e32 >> 31).astype(jnp.uint32)
    return lo, hi


def _recombine(E, plan, extra_dims):
    """E: int32 [.., C, dA, O, J] -> V mod q in [0, 2q), packed
    [2, .., C, O, J]. Two signed Montgomery multiplies per element (one
    when dA <= split, e.g. the 30-bit word mode)."""
    lo_terms = [E[..., u, :, :] for u in range(min(plan.split, plan.dA))]
    hi_terms = [E[..., u, :, :] for u in range(plan.split, plan.dA)]

    def horner(terms):
        v = _sext(terms[-1])
        for t in terms[-2::-1]:
            v = u64.add(u64.shl(v, 8), _sext(t))
        return v

    v_lo = horner(lo_terms)
    shape = (1,) * (extra_dims - 1) + (-1, 1, 1)
    ql, qh, kl, kh = (plan.ql.reshape(shape), plan.qh.reshape(shape),
                      plan.kl.reshape(shape), plan.kh.reshape(shape))

    def bc(scalar):
        s = scalar.reshape(scalar.shape[:1] + (1,) * (extra_dims - 1)
                           + (scalar.shape[1], 1, 1))
        return (s[0], s[1])

    s = u64.montmul_signed(v_lo, bc(plan.c_lo), ql, qh, kl, kh)
    if hi_terms:
        v_hi = horner(hi_terms)
        r_hi = u64.montmul_signed(v_hi, bc(plan.c_hi), ql, qh, kl, kh)
        s = u64.add(s, r_hi)                      # < 4q
        q2 = bc(plan.q2)
        over = ~u64.lt_unsigned(s, q2)
        s = u64.select(over, u64.sub(s, q2), s)   # -> [0, 2q)
    return s


def _modmatmul(x_lo, x_hi, table, rs, plan, extra_dims):
    """x: packed pair [.., C, K, J] (values < 2^63). table [C, dA, O, dB*K].
    Returns packed [2?, .., C, O, J] pair via one s8 einsum."""
    d = _merge_zd(_digits_s8(x_lo, x_hi, plan.dB))        # [.., C, dB*K, J]
    E = jnp.einsum("cuoz,...czj->...cuoj", table, d,
                   preferred_element_type=jnp.int32)
    E = E + rs[..., None]                         # offset correction
    return _recombine(E, plan, extra_dims)


def _mont_tw(x, twp, plan, extra_dims):
    """Pointwise Montgomery multiply by the twiddle plane [2, C, S, R]."""
    shape = (1,) * (extra_dims - 1) + (-1, 1, 1)
    ql, qh, kl, kh = (plan.ql.reshape(shape), plan.qh.reshape(shape),
                      plan.kl.reshape(shape), plan.kh.reshape(shape))
    ext = (1,) * (extra_dims - 1)
    t = twp.reshape(twp.shape[:1] + ext + twp.shape[1:])
    return u64.montmul(x, (t[0], t[1]), ql, qh, kl, kh)


def ntt(a, plan: MxuPlan):
    """Forward negacyclic NTT, natural-order output.

    a: packed [2, .., C, N] in [0, 2^63) (lazy residues). Returns the
    same shape in [0, 2q).
    """
    R, S = plan.R, plan.S
    sh = a.shape                      # [2, .., C, N]
    extra = a.ndim - 2                # dims before (C,): batch... + C
    lo = a[0].reshape(sh[1:-1] + (S, R))
    hi = a[1].reshape(sh[1:-1] + (S, R))
    # stage 1: contract s -> B [.., C, S(k2), R(r)]
    b = _modmatmul(lo, hi, plan.m1, plan.m1_rs, plan, extra)
    # twiddle (tables already [S, R])
    b = _mont_tw(b, plan.tw, plan, extra)
    # stage 2: contract r -> need digits along r: [.., C, (v r), k2]
    blo = jnp.swapaxes(b[0], -1, -2)  # [.., C, R(r), S(k2)]
    bhi = jnp.swapaxes(b[1], -1, -2)
    x = _modmatmul(blo, bhi, plan.m2, plan.m2_rs, plan, extra)
    # x: [.., C, R(k1), S(k2)] -> N with k = k1*S + k2
    return jnp.stack([x[0].reshape(sh[1:]), x[1].reshape(sh[1:])])


def intt_no_norm_factor(a, plan: MxuPlan):
    """Inverse transform (N^{-1} folded into the stage-2 table).

    a: packed [2, .., C, N] natural-order NTT domain, values < 2^63.
    Returns coefficients in [0, 2q), plain domain.
    """
    R, S = plan.R, plan.S
    sh = a.shape
    extra = a.ndim - 2
    # X viewed [.., C, R(k1), S(k2)]; stage 1 contracts k1 (already the
    # -2 axis): Y[j, k2] = sum_k1 I1[j, k1] X[k1, k2]
    lo = a[0].reshape(sh[1:-1] + (R, S))
    hi = a[1].reshape(sh[1:-1] + (R, S))
    y = _modmatmul(lo, hi, plan.i1, plan.i1_rs, plan, extra)
    # y: [.., C, R(j), S(k2)]; twiddle tables are [S(k2), R(j)] ->
    # transpose y to match
    y = (jnp.swapaxes(y[0], -1, -2), jnp.swapaxes(y[1], -1, -2))
    y = _mont_tw(y, plan.itw, plan, extra)        # [.., C, S(k2), R(j)]
    # stage 2 contracts k2 (already the -2 axis):
    # a[s*R + j] = sum_k2 I2[s, k2] Y'[k2, j]
    out = _modmatmul(y[0], y[1], plan.i2, plan.i2_rs, plan, extra)
    # out: [.., C, S(s), R(j)] -> n = s*R + j
    return jnp.stack([out[0].reshape(sh[1:]), out[1].reshape(sh[1:])])
