"""MXU matmul NTT as fused Pallas kernels (VMEM-resident 4-step).

The XLA composition of the MXU backend (mxu_ntt.py) loses to the VPU
butterfly kernels on real hardware because its int32 digit intermediates
([C, dA, S, R] — 4x the polynomial size) round-trip HBM between the
einsums and the VPU recombinations (round-3 A/B: 44.6 vs 20.9 ms/mult at
silver; docs/DESIGN.md 6-7). This module runs the whole transform of one
channel inside ONE Pallas kernel: digitize -> int8 MXU matmul ->
recombine -> twiddle multiply -> transpose -> digitize -> matmul ->
recombine, with every intermediate in VMEM. The systolic array does the
O(N sqrt N) MAC work concurrently with the VPU's digit/recombine chains;
HBM sees one read + one write of the polynomial plus the per-channel
tables (~5 MB, reused across the batch axis by grid ordering).

Numerics are IDENTICAL to mxu_ntt (same digit layout, same Horner, same
Montgomery recombination order) — pinned bit-exact in
tests/test_mxu_pallas.py. The transform domain is the mxu_ntt
natural-order domain; the engine integration goes through the same
pack.mxu route (config.use_mxu_ntt + use_mxu_pallas).

Reference equivalent: none — the reference's CUDA NTT is butterfly-only
(src/liberate/ntt/ntt_cuda_kernel.cu); this is the TPU-native
tensor-core formulation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u64

I32 = jnp.int32
U32 = jnp.uint32


def _consts_from_plan(plan):
    """[18, C] u32 SMEM rows: ql qh kl kh q2 clo chi bp whi wphi corr."""
    return jnp.stack([
        plan.ql, plan.qh, plan.kl, plan.kh,
        plan.q2[0], plan.q2[1],
        plan.c_lo[0], plan.c_lo[1],
        plan.c_hi[0], plan.c_hi[1],
        plan.bp[0], plan.bp[1],
        plan.whi[0], plan.whi[1],
        plan.wphi[0], plan.wphi[1],
        plan.corr[0], plan.corr[1],
    ])


def _digits_k(lo, hi, dB):
    """[K, J] u32 pair -> [dB*K, J] s8 offset digits (v-major rows),
    matching mxu_ntt._digits_s8 + _merge_zd exactly."""
    ds = []
    for v in range(dB):
        w = lo if v < 4 else hi
        sh = 8 * (v % 4)
        d = ((w >> U32(sh)) & U32(0xFF)).astype(I32) - 128
        ds.append(d.astype(jnp.int8))
    return jnp.concatenate(ds, axis=0)


def _sext(e32):
    return (e32.astype(U32), (e32 >> 31).astype(U32))


def _recombine_k(E, c, dA, split, shoup_rec):
    """E int32 [dA*O, J] (plane u at rows [u*O, (u+1)*O)) -> packed pair
    in [0, 2q).

    shoup_rec=True: Barrett/Shoup form — the signed partial sums are
    offset by +2^63, reduced with the precomputed reciprocals, and
    corrected with one per-channel constant (~25% fewer VPU ops than the
    two Montgomery multiplies; same values mod q, different lazy
    representatives). shoup_rec=False: identical op order to
    mxu_ntt._recombine (bit-exact parity mode)."""
    O = E.shape[0] // dA
    planes = [E[u * O:(u + 1) * O] for u in range(dA)]
    lo_terms = planes[:min(split, dA)]
    hi_terms = planes[split:]

    def horner(terms):
        v = _sext(terms[-1])
        for t in terms[-2::-1]:
            v = u64.add(u64.shl(v, 8), _sext(t))
        return v

    if shoup_rec:
        HI = np.uint32(0x80000000)
        q = u64.shr(c["q2"], 1)
        v_lo = horner(lo_terms)
        r = u64.barrett_2q((v_lo[0], v_lo[1] + HI), c["bp"], q)
        if hi_terms:
            v_hi = horner(hi_terms)
            r = u64.add(r, u64.shoup_mul((v_hi[0], v_hi[1] + HI),
                                         c["whi"], c["wphi"], q))
        r = u64.add(r, c["corr"])               # < 5q
        q4 = u64.shl(c["q2"], 1)
        over = ~u64.lt_unsigned(r, q4)
        r = u64.select(over, u64.sub(r, q4), r)  # < 4q
        over = ~u64.lt_unsigned(r, c["q2"])
        return u64.select(over, u64.sub(r, c["q2"]), r)

    s = u64.montmul_signed(horner(lo_terms), c["clo"],
                           c["ql"], c["qh"], c["kl"], c["kh"])
    if hi_terms:
        r_hi = u64.montmul_signed(horner(hi_terms), c["chi"],
                                  c["ql"], c["qh"], c["kl"], c["kh"])
        s = u64.add(s, r_hi)
        over = ~u64.lt_unsigned(s, c["q2"])
        s = u64.select(over, u64.sub(s, c["q2"]), s)
    return s


def _read_consts_at(cref, ch):
    return {
        "ql": cref[0, ch], "qh": cref[1, ch],
        "kl": cref[2, ch], "kh": cref[3, ch],
        "q2": (cref[4, ch], cref[5, ch]),
        "clo": (cref[6, ch], cref[7, ch]),
        "chi": (cref[8, ch], cref[9, ch]),
        "bp": (cref[10, ch], cref[11, ch]),
        "whi": (cref[12, ch], cref[13, ch]),
        "wphi": (cref[14, ch], cref[15, ch]),
        "corr": (cref[16, ch], cref[17, ch]),
    }


def _read_consts(cref, ch_off=0):
    return _read_consts_at(cref, pl.program_id(0) + ch_off)


def _matmul_s8(table, d):
    """[O, Z] s8 @ [Z, J] s8 -> [O, J] int32 on the MXU."""
    return jax.lax.dot_general(
        table, d, (((1,), (0,)), ((), ())),
        preferred_element_type=I32)


def _ntt_kernel(cref, x_ref, m1_ref, r1_ref, tw_ref, m2_ref, r2_ref,
                o_ref, *, dA, dB, split, ch_off=0, shoup_rec=True):
    c = _read_consts(cref, ch_off)
    lo = x_ref[0, 0, 0]                      # [S, R]
    hi = x_ref[1, 0, 0]
    # stage 1: contract s
    d = _digits_k(lo, hi, dB)                # [dB*S, R]
    E = _matmul_s8(m1_ref[0], d) + r1_ref[0]
    b = _recombine_k(E, c, dA, split, shoup_rec)        # [S(k2), R(r)] in [0, 2q)
    # twiddle (Montgomery form, [S, R])
    t = (tw_ref[0, 0], tw_ref[1, 0])
    b = u64.montmul(b, t, c["ql"], c["qh"], c["kl"], c["kh"])
    # stage 2: contract r — digits along r, transposed view
    d2 = _digits_k(b[0].T, b[1].T, dB)        # [dB*R, S]
    E2 = _matmul_s8(m2_ref[0], d2) + r2_ref[0]
    x = _recombine_k(E2, c, dA, split, shoup_rec)        # [R(k1), S(k2)]
    o_ref[0, 0, 0] = x[0]
    o_ref[1, 0, 0] = x[1]


def _intt_kernel(cref, x_ref, i1_ref, r1_ref, itw_ref, i2_ref, r2_ref,
                 o_ref, *, dA, dB, split, ch_off=0, shoup_rec=True,
                 post_reduce=False):
    c = _read_consts(cref, ch_off)
    lo = x_ref[0, 0, 0]                      # [R(k1), S(k2)]
    hi = x_ref[1, 0, 0]
    # stage 1: contract k1
    d = _digits_k(lo, hi, dB)                # [dB*R, S]
    E = _matmul_s8(i1_ref[0], d) + r1_ref[0]
    y = _recombine_k(E, c, dA, split, shoup_rec)         # [R(j), S(k2)]
    # twiddle tables are [S(k2), R(j)] — transpose to match (mxu_ntt
    # swaps axes before _mont_tw)
    y = (y[0].T, y[1].T)                      # [S(k2), R(j)]
    t = (itw_ref[0, 0], itw_ref[1, 0])
    y = u64.montmul(y, t, c["ql"], c["qh"], c["kl"], c["kh"])
    # stage 2: contract k2
    d2 = _digits_k(y[0], y[1], dB)            # [dB*S, R]
    E2 = _matmul_s8(i2_ref[0], d2) + r2_ref[0]
    x = _recombine_k(E2, c, dA, split, shoup_rec)        # [S(s), R(j)]
    if post_reduce:
        q = u64.shr(c["q2"], 1)
        lt = u64.lt_unsigned(x, q)
        x = u64.select(lt, x, u64.sub(x, q))
    o_ref[0, 0, 0] = x[0]
    o_ref[1, 0, 0] = x[1]


def _call(kernel, a, plan, t1, r1, tw, t2, r2, in_rows, out_rows,
          interpret, ch_off=0):
    """Launch over grid (C, B) — batch fastest, so per-channel tables
    stay resident in VMEM across the batch axis. ch_off: the data's
    channel 0 maps to table channel ch_off (level layouts are contiguous
    suffixes of the master tables — block indexing instead of gathers)."""
    batched = a.ndim == 4
    if not batched:
        a = a[:, None]
    _, B, C, N = a.shape
    cols_in = N // in_rows
    cols_out = N // out_rows
    av = a.reshape(2, B, C, in_rows, cols_in)
    consts = _consts_from_plan(plan)

    out = pl.pallas_call(
        kernel,
        grid=(C, B),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 1, 1, in_rows, cols_in),
                         lambda ch, b: (0, b, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + t1.shape[1:],
                         lambda ch, b: (ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + r1.shape[1:],
                         lambda ch, b: (ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1) + tw.shape[2:],
                         lambda ch, b: (0, ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + t2.shape[1:],
                         lambda ch, b: (ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + r2.shape[1:],
                         lambda ch, b: (ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, 1, out_rows, cols_out),
                               lambda ch, b: (0, b, ch, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, B, C, out_rows, cols_out),
                                       a.dtype),
        interpret=interpret,
    )(consts, av, t1, r1, tw, t2, r2)

    # Load-bearing: when the kernel output has multiple consumers (e.g.
    # the B=4 enter_ntt stack in _cc_mult_core feeding four mont_mults),
    # XLA's fusion pass produces WRONG VALUES for the width-group calls
    # on both the CPU interpret path and the compiled TPU path (round-5
    # root-cause of the engine-level MXU A/B failure: channels of the
    # narrow-digit group decode to garbage while a single-consumer use of
    # the same kernel is bit-exact). The barrier pins the kernel output
    # as one materialized value before fan-out.
    out = jax.lax.optimization_barrier(out)
    out = out.reshape(2, B, C, N)
    return out if batched else out[:, 0]


def _flat_tables(plan, fwd, enter=False, exitx=False):
    """Reshape the MxuPlan digit tables to kernel layout:
    [C, dA, O, dB*K] -> [C, dA*O, dB*K]; rowsums [C, dA, O] ->
    [C, dA*O, 1] int32. Pure views — no copies. enter: the R-folded
    forward stage-1 tables (transform of a*R); exitx: the
    R^{-1}-folded inverse stage-2 tables (Montgomery exit fused)."""
    if fwd:
        m1 = plan.m1e if enter else plan.m1
        r1 = plan.m1e_rs if enter else plan.m1_rs
        m2, r2 = plan.m2, plan.m2_rs
        tw = plan.tw
    else:
        m1, r1 = plan.i1, plan.i1_rs
        m2 = plan.i2x if exitx else plan.i2
        r2 = plan.i2x_rs if exitx else plan.i2_rs
        tw = plan.itw
    C = m1.shape[0]

    def flat(t):
        return t.reshape(C, t.shape[1] * t.shape[2], t.shape[3])

    def flat_rs(t):
        return t.reshape(C, t.shape[1] * t.shape[2], 1)

    return flat(m1), flat_rs(r1), tw, flat(m2), flat_rs(r2)


def _sharded_dispatch(a, mxu_ref, inverse, interpret, kw):
    """Run the fused kernels per-shard under jax.shard_map: the data's
    channel axis (-2) and every plan leaf's channel axis live on the
    ref's mesh axis (the 1-D rns-mesh plans are eagerly channel-sliced
    and sharded — ntt_context._maybe_mxu_ref); each chip transforms its
    local channel block with its local tables. Mirrors
    pallas_ntt._sharded_transform."""
    from jax.sharding import PartitionSpec as P

    from . import mxu_ntt

    mesh, ax = mxu_ref.mesh, mxu_ref.mesh_axis
    plan = mxu_ref.plan
    leaves, aux = plan.tree_flatten()

    def leaf_spec(name, x):
        c_ax = 1 if name in mxu_ntt._C_AXIS1 else 0
        return P(*([None] * c_ax), ax, *([None] * (x.ndim - c_ax - 1)))

    names = mxu_ntt._ARRAY_FIELDS
    data_spec = P(*([None] * (a.ndim - 2)), ax, None)
    f = intt_no_norm_factor if inverse else ntt

    def body(a_l, leaves_l):
        lp = type(plan).tree_unflatten(aux, leaves_l)
        return f(a_l, lp, interpret=interpret, **kw)

    # check_vma=False: pallas_call's out_shape carries no vma annotation.
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(data_spec,
                  tuple(leaf_spec(n, x) for n, x in zip(names, leaves))),
        out_specs=data_spec, check_vma=False)(a, leaves)


def dispatch(a, mxu_ref, inverse=False, interpret=False, **kw):
    """Transform through an MxuRef: width-grouped plans when available
    (per-group digit parameters — 40-bit scale primes run dA=dB=6), one
    pallas_call per contiguous group, block-offset table indexing.
    ``kw``: variant flags (enter / exitx / post_reduce / shoup_rec).

    Mesh refs: channel-sharded plans run per-shard under shard_map
    (_sharded_dispatch). Replicated (non-divisible) mesh layouts must
    not reach here — ops.py's mxu_kernels_ok() routes them to the XLA
    einsum composition (GSPMD cannot partition a pallas_call and the
    kernels' static block offsets cannot follow a dynamic shard
    index)."""
    if mxu_ref.mesh is not None:
        return _sharded_dispatch(a, mxu_ref, inverse, interpret, kw)
    f = intt_no_norm_factor if inverse else ntt
    idx = tuple(mxu_ref.idx)
    contig = idx == tuple(range(idx[0], idx[0] + len(idx)))
    if mxu_ref.groups and contig:
        start, stop = idx[0], idx[0] + len(idx)
        outs = []
        for gs, ge, gplan in mxu_ref.groups:
            lo, hi = max(gs, start), min(ge, stop)
            if hi <= lo:
                continue
            outs.append(f(a[..., lo - start:hi - start, :], gplan,
                          ch_off=lo - gs, interpret=interpret, **kw))
        if len(outs) == 1:
            return outs[0]
        # The barrier is load-bearing (see _call): a multi-consumer
        # concat of the per-group kernel outputs miscompiles the same
        # way the raw kernel output does.
        return jax.lax.optimization_barrier(
            jnp.concatenate(outs, axis=-2))
    if contig:
        return f(a, mxu_ref.plan, ch_off=idx[0], interpret=interpret, **kw)
    return f(a, mxu_ref.resolve(), interpret=interpret, **kw)


def dispatch_ksk_accum(ext, k0_full, k1_full, mxu_ref, level, part_off,
                       interpret=False, fold_inverse=False):
    """Fused switch through an MxuRef (the ref must be the level's
    with-special pack: global channels [level, C0)). ``ext`` may be
    [2, P, C, N] flat or [2, P, C, N/128, 128] tiled (channel slicing
    is on axis 2 either way). fold_inverse: see ntt_ksk_accum — outputs
    become [2, C, S, R] tiled coefficient-domain values."""
    C = ext.shape[2]
    cat_axis = 1 if fold_inverse else -2
    if mxu_ref.groups:
        outs0, outs1 = [], []
        for gs, ge, gplan in mxu_ref.groups:
            lo, hi = max(gs, level), min(ge, level + C)
            if hi <= lo:
                continue
            o0, o1 = ntt_ksk_accum(
                ext[:, :, lo - level:hi - level], k0_full, k1_full,
                gplan, lo, part_off, interpret=interpret, ch_off=lo - gs,
                fold_inverse=fold_inverse)
            outs0.append(o0)
            outs1.append(o1)
        if len(outs0) == 1:
            return outs0[0], outs1[0]
        # The barrier is load-bearing (see _call / dispatch).
        return jax.lax.optimization_barrier(
            (jnp.concatenate(outs0, axis=cat_axis),
             jnp.concatenate(outs1, axis=cat_axis)))
    plan, off, _ = resolve_ref(mxu_ref)
    return ntt_ksk_accum(ext, k0_full, k1_full, plan, level, part_off,
                         interpret=interpret, ch_off=off,
                         fold_inverse=fold_inverse)


def resolve_ref(mxu_ref):
    """(master plan, ch_off) when the ref's channel set is a contiguous
    run of the master tables (every level layout is — the global prime
    order makes alive channels a suffix), else (materialized plan, 0).
    Contiguity means the kernels index the ONE master table set by block
    offset: no per-call gather copies of ~10 MB/channel."""
    idx = tuple(mxu_ref.idx)
    if idx == tuple(range(idx[0], idx[0] + len(idx))):
        return mxu_ref.plan, idx[0], len(idx)
    return mxu_ref.resolve(), 0, len(idx)


def ntt(a, plan, interpret=False, ch_off=0, shoup_rec=True,
        enter=False):
    """Forward negacyclic NTT (natural order). a: packed [2, .., C, N]
    in [0, 2^{8*dB}) lazy residues (any u64 for the word-size digit
    parameters). ch_off: table channel of the data's channel 0.
    shoup_rec=False: bit-exact parity with mxu_ntt.ntt (Montgomery
    recombination); True (default): same values mod q, ~25% fewer VPU
    ops."""
    t1, r1, tw, t2, r2 = _flat_tables(plan, fwd=True, enter=enter)
    kern = functools.partial(_ntt_kernel, dA=plan.dA, dB=plan.dB,
                             split=plan.split, ch_off=ch_off,
                             shoup_rec=shoup_rec)
    # input viewed [S, R] (a[s*R + r]); output [R(k1), S(k2)]
    return _call(kern, a, plan, t1, r1, tw, t2, r2,
                 in_rows=plan.S, out_rows=plan.R, interpret=interpret,
                 ch_off=ch_off)


def intt_no_norm_factor(a, plan, interpret=False, ch_off=0,
                        shoup_rec=True, exitx=False, post_reduce=False):
    """Inverse transform (N^{-1} folded into the stage-2 table);
    shoup_rec=False is bit-exact with mxu_ntt.intt_no_norm_factor."""
    t1, r1, itw, t2, r2 = _flat_tables(plan, fwd=False, exitx=exitx)
    kern = functools.partial(_intt_kernel, dA=plan.dA, dB=plan.dB,
                             split=plan.split, ch_off=ch_off,
                             shoup_rec=shoup_rec, post_reduce=post_reduce)
    # input viewed [R(k1), S(k2)]; output [S(s), R(j)]
    return _call(kern, a, plan, t1, r1, itw, t2, r2,
                 in_rows=plan.R, out_rows=plan.S, interpret=interpret,
                 ch_off=ch_off)


# ---------------------------------------------------------------------------
# Fused key-switch core (MXU backend): forward transform + both ksk
# multiplies + part-axis accumulation, outputs resident in VMEM.
# ---------------------------------------------------------------------------


def _mulacc_kernel(cref, x_ref, m1_ref, r1_ref, tw_ref, m2_ref, r2_ref,
                   k0_ref, k1_ref, o0_ref, o1_ref, *, dA, dB, split,
                   ch_off, shoup_rec=True):
    """Per (channel, part) block: the forward MXU transform of the
    plain-domain basis extension, multiply by BOTH ksk halves (natural-
    order NTT domain), accumulate over the part axis. The MXU-backend
    analogue of pallas_ntt._ntt_mulacc_kernel (requires
    config.use_shoup_extend: inputs already unsigned [0, 2q))."""
    c = _read_consts(cref, ch_off)
    p = pl.program_id(1)
    lo = x_ref[0, 0, 0]                       # [S, R]
    hi = x_ref[1, 0, 0]
    d = _digits_k(lo, hi, dB)
    E = _matmul_s8(m1_ref[0], d) + r1_ref[0]
    b = _recombine_k(E, c, dA, split, shoup_rec)
    t = (tw_ref[0, 0], tw_ref[1, 0])
    b = u64.montmul(b, t, c["ql"], c["qh"], c["kl"], c["kh"])
    d2 = _digits_k(b[0].T, b[1].T, dB)
    E2 = _matmul_s8(m2_ref[0], d2) + r2_ref[0]
    x = _recombine_k(E2, c, dA, split, shoup_rec)        # [R(k1), S(k2)]

    k0 = (k0_ref[0, 0, 0], k0_ref[1, 0, 0])
    k1 = (k1_ref[0, 0, 0], k1_ref[1, 0, 0])
    if k0wp_ref is not None:
        # Shoup-form ksk (config.use_shoup_ksk): plain values k0/k1 with
        # precomputed quotients — same product mod q as the Montgomery
        # multiply at ~2.4x fewer VPU ops.
        qk = u64.shr(c["q2"], 1)
        p0 = u64.shoup_mul(x, k0, (k0wp_ref[0, 0, 0], k0wp_ref[1, 0, 0]),
                           qk)
        p1 = u64.shoup_mul(x, k1, (k1wp_ref[0, 0, 0], k1wp_ref[1, 0, 0]),
                           qk)
    else:
        p0 = u64.montmul(x, k0, c["ql"], c["qh"], c["kl"], c["kh"])
        p1 = u64.montmul(x, k1, c["ql"], c["qh"], c["kl"], c["kh"])

    def csub(v):
        over = ~u64.lt_unsigned(v, c["q2"])
        return u64.select(over, u64.sub(v, c["q2"]), v)

    @pl.when(p == 0)
    def _init():
        o0_ref[0, 0] = p0[0]
        o0_ref[1, 0] = p0[1]
        o1_ref[0, 0] = p1[0]
        o1_ref[1, 0] = p1[1]

    @pl.when(p != 0)
    def _accum():
        a0 = csub(u64.add((o0_ref[0, 0], o0_ref[1, 0]), p0))
        o0_ref[0, 0] = a0[0]
        o0_ref[1, 0] = a0[1]
        a1 = csub(u64.add((o1_ref[0, 0], o1_ref[1, 0]), p1))
        o1_ref[0, 0] = a1[0]
        o1_ref[1, 0] = a1[1]


def _mulacc_inv_tail(c, lo, hi, m1_ref, r1_ref, tw_ref, m2_ref, r2_ref,
                     i1_ref, ir1_ref, itw_ref, i2_ref, ir2_ref,
                     k0_ref, k1_ref, o0_ref, o1_ref, a0_ref, a1_ref,
                     dA, dB, split, P, shoup_rec, out_rank4=False,
                     k0wp_ref=None, k1wp_ref=None, fold_cb=None):
    """Shared tail of the fold-inverse switch kernels: forward
    transform of (lo, hi) [S, R], ksk multiplies, part-axis VMEM-scratch
    accumulation, and — on the last part — the inverse transform +
    plain reduce of the accumulators.

    Grid axis 1 may run over a ct-batch of part segments (bp = b*P + p):
    accumulation restarts at every p == bp % P == 0 and folds at
    p == P - 1, so B independent switches stream through one kernel."""
    p = pl.program_id(1) % P
    d = _digits_k(lo, hi, dB)
    E = _matmul_s8(m1_ref[0], d) + r1_ref[0]
    b = _recombine_k(E, c, dA, split, shoup_rec)
    t = (tw_ref[0, 0], tw_ref[1, 0])
    b = u64.montmul(b, t, c["ql"], c["qh"], c["kl"], c["kh"])
    d2 = _digits_k(b[0].T, b[1].T, dB)
    E2 = _matmul_s8(m2_ref[0], d2) + r2_ref[0]
    x = _recombine_k(E2, c, dA, split, shoup_rec)        # [R(k1), S(k2)]

    k0 = (k0_ref[0, 0, 0], k0_ref[1, 0, 0])
    k1 = (k1_ref[0, 0, 0], k1_ref[1, 0, 0])
    if k0wp_ref is not None:
        # Shoup-form ksk (config.use_shoup_ksk): plain values k0/k1 with
        # precomputed quotients — same product mod q as the Montgomery
        # multiply at ~2.4x fewer VPU ops.
        qk = u64.shr(c["q2"], 1)
        p0 = u64.shoup_mul(x, k0, (k0wp_ref[0, 0, 0], k0wp_ref[1, 0, 0]),
                           qk)
        p1 = u64.shoup_mul(x, k1, (k1wp_ref[0, 0, 0], k1wp_ref[1, 0, 0]),
                           qk)
    else:
        p0 = u64.montmul(x, k0, c["ql"], c["qh"], c["kl"], c["kh"])
        p1 = u64.montmul(x, k1, c["ql"], c["qh"], c["kl"], c["kh"])

    def csub(v):
        over = ~u64.lt_unsigned(v, c["q2"])
        return u64.select(over, u64.sub(v, c["q2"]), v)

    @pl.when(p == 0)
    def _init():
        a0_ref[0], a0_ref[1] = p0[0], p0[1]
        a1_ref[0], a1_ref[1] = p1[0], p1[1]

    @pl.when(p != 0)
    def _accum():
        s0 = csub(u64.add((a0_ref[0], a0_ref[1]), p0))
        a0_ref[0], a0_ref[1] = s0[0], s0[1]
        s1 = csub(u64.add((a1_ref[0], a1_ref[1]), p1))
        a1_ref[0], a1_ref[1] = s1[0], s1[1]

    @pl.when(p == P - 1)
    def _fold_inverse():
        for half, (acc_ref, o_ref) in enumerate(((a0_ref, o0_ref),
                                                 (a1_ref, o1_ref))):
            ilo, ihi = acc_ref[0], acc_ref[1]          # [R(k1), S(k2)]
            di = _digits_k(ilo, ihi, dB)
            Ei = _matmul_s8(i1_ref[0], di) + ir1_ref[0]
            y = _recombine_k(Ei, c, dA, split, shoup_rec)   # [R(j), S]
            y = (y[0].T, y[1].T)                       # [S(k2), R(j)]
            ti = (itw_ref[0, 0], itw_ref[1, 0])
            y = u64.montmul(y, ti, c["ql"], c["qh"], c["kl"], c["kh"])
            di2 = _digits_k(y[0], y[1], dB)
            Ei2 = _matmul_s8(i2_ref[0], di2) + ir2_ref[0]
            r = _recombine_k(Ei2, c, dA, split, shoup_rec)  # [S(s), R(j)]
            q = u64.shr(c["q2"], 1)
            lt = u64.lt_unsigned(r, q)
            r = u64.select(lt, r, u64.sub(r, q))
            if fold_cb is not None:
                # mod-down fold: may transform r (ordinary channels) and
                # stash/export special-channel rows; returns the value to
                # write (see _moddown_cbs).
                r = fold_cb(c, half, r)
            if out_rank4:          # [2, B, C, S, R] blocks (ct-batched)
                o_ref[0, 0, 0] = r[0]
                o_ref[1, 0, 0] = r[1]
            else:                  # [2, C, S, R] blocks
                o_ref[0, 0] = r[0]
                o_ref[1, 0] = r[1]


def _mulacc_inv_kernel(cref, x_ref, m1_ref, r1_ref, tw_ref, m2_ref,
                       r2_ref, i1_ref, ir1_ref, itw_ref, i2_ref, ir2_ref,
                       k0_ref, k1_ref, o0_ref, o1_ref, a0_ref, a1_ref, *,
                       dA, dB, split, ch_off, P, shoup_rec=True):
    """_mulacc_kernel with the post-accumulation INVERSE transform
    folded in (see _mulacc_inv_tail). Outputs are PLAIN
    coefficient-domain [0, q) in the [S, R] tiled view."""
    c = _read_consts(cref, ch_off)
    _mulacc_inv_tail(c, x_ref[0, 0, 0], x_ref[1, 0, 0], m1_ref, r1_ref,
                     tw_ref, m2_ref, r2_ref, i1_ref, ir1_ref, itw_ref,
                     i2_ref, ir2_ref, k0_ref, k1_ref, o0_ref, o1_ref,
                     a0_ref, a1_ref, dA, dB, split, P, shoup_rec)


def _ext_mulacc_inv_kernel(cref, eref, oref, st_ref, m1_ref, r1_ref,
                           tw_ref, m2_ref, r2_ref, i1_ref, ir1_ref,
                           itw_ref, i2_ref, ir2_ref, k0_ref, k1_ref,
                           o0_ref, o1_ref, a0_ref, a1_ref, *,
                           dA, dB, split, ch_off, P, A, shoup_rec=True):
    """The fold-inverse switch kernel with the Shoup BASIS EXTENSION
    folded in as well: each (channel, part) cell reads the part's raw
    divided-difference state rows ([2, A, S, R] — shared across all
    channels) and computes the per-channel extension with scalar
    constants (engine extend_shoup, op for op) before the forward
    transform. The per-part XLA extension fusions, their HBM
    materialization ([2, P, C, N]), and the channel-slice all disappear.

    eref: SMEM u32 [P, A-1, 6, C_slice] — (w_lo, w_hi, wp_lo, wp_hi,
    cadj_lo, cadj_hi) per (part, term, channel), zero-padded for parts
    with fewer terms (a zero Shoup weight contributes exactly 0).
    oref: SMEM u32 [2, C_slice] — the +2^63-offset correction of the
    i=0 Barrett term. The Barrett reciprocal is c["bp"] (identical
    definition to the engine's _barrett_pack).
    """
    c = _read_consts(cref, ch_off)
    ch = pl.program_id(0)
    p = pl.program_id(1) % P        # part within the ct segment
    q = u64.shr(c["q2"], 1)
    HI = np.uint32(0x80000000)

    def csub2(v):
        over = ~u64.lt_unsigned(v, c["q2"])
        return u64.select(over, u64.sub(v, c["q2"]), v)

    s0 = (st_ref[0, 0, 0], st_ref[1, 0, 0] + HI)      # [S, R]
    acc = csub2(u64.add(u64.barrett_2q(s0, c["bp"], q),
                        (oref[0, ch], oref[1, ch])))
    for i in range(1, A):
        u_ = (st_ref[0, 0, i], st_ref[1, 0, i] + HI)
        w = (eref[p, i - 1, 0, ch], eref[p, i - 1, 1, ch])
        wp = (eref[p, i - 1, 2, ch], eref[p, i - 1, 3, ch])
        cadj = (eref[p, i - 1, 4, ch], eref[p, i - 1, 5, ch])
        e = u64.shoup_mul(u_, w, wp, q)
        e = csub2(u64.add(e, cadj))
        acc = csub2(u64.add(acc, e))
    _mulacc_inv_tail(c, acc[0], acc[1], m1_ref, r1_ref, tw_ref, m2_ref,
                     r2_ref, i1_ref, ir1_ref, itw_ref, i2_ref, ir2_ref,
                     k0_ref, k1_ref, o0_ref, o1_ref, a0_ref, a1_ref,
                     dA, dB, split, P, shoup_rec, out_rank4=True)


def ntt_ksk_accum(ext, k0_full, k1_full, plan, level, part_off,
                  interpret=False, ch_off=0, shoup_rec=True,
                  fold_inverse=False):
    """Fused MXU key-switch core. ext: [2, P, C, N] flat — or
    [2, P, C, N/128, 128] tiled, the producer-layout-preserving form
    (when plan.R == 128 the tiled view IS the kernel's [S, R] block
    view, so no reshape and no XLA layout fix-up copy) — PLAIN unsigned
    [0, 2q) basis-extension outputs (config.use_shoup_extend).
    k0_full/k1_full: [2, P_full, C0, N] pre-stacked natural-order-domain
    Montgomery ksk halves; level/part_off select the active slice via
    block indexing. Returns (d0, d1): [2, C, N] plain-domain NTT-domain
    accumulators in [0, 2q) (the ksk's R factor cancels in the montmul).

    fold_inverse=True additionally runs the inverse (N^-1-folded)
    transform + plain reduce on the accumulators inside the kernel
    (_mulacc_inv_kernel) and returns them as [2, C, S, R] TILED
    coefficient-domain values in [0, q) — the ops.intt_reduce pair after
    the switch disappears.
    """
    S, R = plan.S, plan.R
    if ext.ndim == 5:
        _, P, C, T, L = ext.shape
        N = T * L
        xv = ext if (T, L) == (S, R) else ext.reshape(2, P, C, S, R)
    else:
        _, P, C, N = ext.shape
        xv = ext.reshape(2, P, C, S, R)
    t1, r1, tw, t2, r2 = _flat_tables(plan, fwd=True)
    consts = _consts_from_plan(plan)
    if k0_full.ndim == 5:
        # Pre-tiled [2, P_full, C0, R, S] ksk stacks (engine
        # _ksk_stacked): no per-switch reshape/re-layout.
        k0v, k1v = k0_full, k1_full
    else:
        k0v = k0_full.reshape(2, k0_full.shape[1], k0_full.shape[2], R, S)
        k1v = k1_full.reshape(2, k1_full.shape[1], k1_full.shape[2], R, S)
    if fold_inverse:
        return _ksk_accum_inv_call(
            xv, consts, t1, r1, tw, t2, r2, k0v, k1v, plan, level,
            part_off, C, P, S, R, ch_off, shoup_rec, interpret)
    kern = functools.partial(_mulacc_kernel, dA=plan.dA, dB=plan.dB,
                             split=plan.split, ch_off=ch_off,
                             shoup_rec=shoup_rec)
    out_shape = jax.ShapeDtypeStruct((2, C, R, S), ext.dtype)
    o0, o1 = pl.pallas_call(
        kern,
        grid=(C, P),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 1, 1, S, R), lambda ch, p: (0, p, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + t1.shape[1:],
                         lambda ch, p: (ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + r1.shape[1:],
                         lambda ch, p: (ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, S, R), lambda ch, p: (0, ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + t2.shape[1:],
                         lambda ch, p: (ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + r2.shape[1:],
                         lambda ch, p: (ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, 1, R, S),
                         lambda ch, p: (0, p + part_off, ch + level, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, 1, R, S),
                         lambda ch, p: (0, p + part_off, ch + level, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, 1, R, S), lambda ch, p: (0, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, R, S), lambda ch, p: (0, ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(consts, xv, t1, r1, tw, t2, r2, k0v, k1v)
    # Same multiple-consumer fusion hazard as _call (see there).
    o0, o1 = jax.lax.optimization_barrier((o0, o1))
    return o0.reshape(2, C, N), o1.reshape(2, C, N)


def _ksk_accum_inv_call(xv, consts, t1, r1, tw, t2, r2, k0v, k1v, plan,
                        level, part_off, C, P, S, R, ch_off, shoup_rec,
                        interpret):
    """pallas_call wrapper for _mulacc_inv_kernel (fold_inverse path)."""
    i1f, ir1, itw, i2f, ir2 = _flat_tables(plan, fwd=False)
    kern = functools.partial(_mulacc_inv_kernel, dA=plan.dA, dB=plan.dB,
                             split=plan.split, ch_off=ch_off, P=P,
                             shoup_rec=shoup_rec)
    out_shape = jax.ShapeDtypeStruct((2, C, S, R), xv.dtype)

    def tblspec(t):
        return pl.BlockSpec((1,) + t.shape[1:],
                            lambda ch, p: (ch + ch_off, 0, 0),
                            memory_space=pltpu.VMEM)

    o0, o1 = pl.pallas_call(
        kern,
        grid=(C, P),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 1, 1, S, R), lambda ch, p: (0, p, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            tblspec(t1),
            tblspec(r1),
            pl.BlockSpec((2, 1, S, R), lambda ch, p: (0, ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            tblspec(t2),
            tblspec(r2),
            tblspec(i1f),
            tblspec(ir1),
            pl.BlockSpec((2, 1, S, R), lambda ch, p: (0, ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            tblspec(i2f),
            tblspec(ir2),
            pl.BlockSpec((2, 1, 1, R, S),
                         lambda ch, p: (0, p + part_off, ch + level, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, 1, R, S),
                         lambda ch, p: (0, p + part_off, ch + level, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, 1, S, R), lambda ch, p: (0, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, S, R), lambda ch, p: (0, ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out_shape, out_shape],
        scratch_shapes=[pltpu.VMEM((2, R, S), jnp.uint32),
                        pltpu.VMEM((2, R, S), jnp.uint32)],
        interpret=interpret,
    )(consts, xv, t1, r1, tw, t2, r2, i1f, ir1, itw, i2f, ir2, k0v, k1v)
    # Same multiple-consumer fusion hazard as _call (see there).
    return jax.lax.optimization_barrier((o0, o1))


def _ext_mulacc_inv_kernel_sk(cref, eref, oref, st_ref, m1_ref, r1_ref,
                              tw_ref, m2_ref, r2_ref, i1_ref, ir1_ref,
                              itw_ref, i2_ref, ir2_ref, k0_ref, k0wp_ref,
                              k1_ref, k1wp_ref, o0_ref, o1_ref,
                              a0_ref, a1_ref, *, dA, dB, split, ch_off,
                              P, A, shoup_rec=True):
    """_ext_mulacc_inv_kernel with Shoup-form ksk operands
    (config.use_shoup_ksk): two extra block inputs carry the
    precomputed quotients and the ksk products run as Shoup constant
    multiplies in the shared tail."""
    c = _read_consts(cref, ch_off)
    ch = pl.program_id(0)
    p = pl.program_id(1) % P        # part within the ct segment
    q = u64.shr(c["q2"], 1)
    HI = np.uint32(0x80000000)

    def csub2(v):
        over = ~u64.lt_unsigned(v, c["q2"])
        return u64.select(over, u64.sub(v, c["q2"]), v)

    s0 = (st_ref[0, 0, 0], st_ref[1, 0, 0] + HI)      # [S, R]
    acc = csub2(u64.add(u64.barrett_2q(s0, c["bp"], q),
                        (oref[0, ch], oref[1, ch])))
    for i in range(1, A):
        u_ = (st_ref[0, 0, i], st_ref[1, 0, i] + HI)
        w = (eref[p, i - 1, 0, ch], eref[p, i - 1, 1, ch])
        wp = (eref[p, i - 1, 2, ch], eref[p, i - 1, 3, ch])
        cadj = (eref[p, i - 1, 4, ch], eref[p, i - 1, 5, ch])
        e = u64.shoup_mul(u_, w, wp, q)
        e = csub2(u64.add(e, cadj))
        acc = csub2(u64.add(acc, e))
    _mulacc_inv_tail(c, acc[0], acc[1], m1_ref, r1_ref, tw_ref, m2_ref,
                     r2_ref, i1_ref, ir1_ref, itw_ref, i2_ref, ir2_ref,
                     k0_ref, k1_ref, o0_ref, o1_ref, a0_ref, a1_ref,
                     dA, dB, split, P, shoup_rec, out_rank4=True,
                     k0wp_ref=k0wp_ref, k1wp_ref=k1wp_ref)


def _make_md_kernel(mode, n_sp, dA, dB, split, ch_off, P, A, C_loc,
                    shoup_rec=True):
    """Build the extension+transform+switch+inverse kernel with the
    Shoup MOD-DOWN folded in as well (config.use_shoup_moddown +
    use_shoup_ksk). Two variants:

    - mode='special': the width group holding the special primes. The
      grid is REINDEXED so the dropped channels run first (grid ch k <
      n_sp -> actual channel C_loc-1-k, in drop order); their reduced
      inverse outputs are iterated in VMEM scratch into the canonical
      src rows, exported through an extra output for the other groups,
      and this group's ordinary channels apply the n_sp removal steps
      before writing — their rows leave the kernel FULLY mod-downed.
    - mode='ordinary': other groups; consumes the exported src rows.

    Same values mod q as engine._mod_down_shoup (the per-step
    canonicalization differs in lazy representatives for n_sp > 2;
    decode-level equivalence is pinned by the engine tests)."""

    def amap(ch):
        if mode != "special":
            return ch
        return jnp.where(ch < n_sp, C_loc - 1 - ch, ch - n_sp)

    def kernel(*refs):
        if mode == "special":
            (cref, eref, oref, piw_ref, st_ref, m1_ref, r1_ref, tw_ref,
             m2_ref, r2_ref, i1_ref, ir1_ref, itw_ref, i2_ref, ir2_ref,
             k0_ref, k0wp_ref, k1_ref, k1wp_ref,
             o0_ref, o1_ref, srcs_ref, a0_ref, a1_ref, scr_ref) = refs
        else:
            (cref, eref, oref, piw_ref, srcs_in, st_ref, m1_ref, r1_ref,
             tw_ref, m2_ref, r2_ref, i1_ref, ir1_ref, itw_ref, i2_ref,
             ir2_ref, k0_ref, k0wp_ref, k1_ref, k1wp_ref,
             o0_ref, o1_ref, a0_ref, a1_ref) = refs
        ch = pl.program_id(0)
        ach = amap(ch)
        c = _read_consts_at(cref, ach + ch_off)
        p = pl.program_id(1) % P
        b = pl.program_id(1) // P
        q = u64.shr(c["q2"], 1)
        HI = np.uint32(0x80000000)

        def csub2(v):
            over = ~u64.lt_unsigned(v, c["q2"])
            return u64.select(over, u64.sub(v, c["q2"]), v)

        s0 = (st_ref[0, 0, 0], st_ref[1, 0, 0] + HI)
        acc = csub2(u64.add(u64.barrett_2q(s0, c["bp"], q),
                            (oref[0, ach], oref[1, ach])))
        for i in range(1, A):
            u_ = (st_ref[0, 0, i], st_ref[1, 0, i] + HI)
            w = (eref[p, i - 1, 0, ach], eref[p, i - 1, 1, ach])
            wp = (eref[p, i - 1, 2, ach], eref[p, i - 1, 3, ach])
            cadj = (eref[p, i - 1, 4, ach], eref[p, i - 1, 5, ach])
            e = u64.shoup_mul(u_, w, wp, q)
            e = csub2(u64.add(e, cadj))
            acc = csub2(u64.add(acc, e))

        def md_iter(v, src, j):
            # one removal step, engine _mod_down_shoup op for op
            w = (piw_ref[j, 0, ach], piw_ref[j, 1, ach])
            wp = (piw_ref[j, 2, ach], piw_ref[j, 3, ach])
            tile = u64.barrett_2q(src, c["bp"], q)
            s = u64.sub(u64.add(v, c["q2"]), tile)
            return u64.shoup_mul(s, w, wp, q)     # [0, 2q)

        def reduce_q(v):
            lt = u64.lt_unsigned(v, q)
            return u64.select(lt, v, u64.sub(v, q))

        def fold_cb(c_, half, r):
            if mode == "ordinary":
                v = r
                for j in range(n_sp):
                    src = (srcs_in[0, 0, half * n_sp + j],
                           srcs_in[1, 0, half * n_sp + j])
                    v = md_iter(v, src, j)
                return reduce_q(v)
            # special group: stash the iterated dropped-channel rows
            for k in range(n_sp):
                @pl.when(ch == k)
                def _(k=k):
                    v = r
                    for j in range(k):
                        src = (scr_ref[half * n_sp + j, 0, b],
                               scr_ref[half * n_sp + j, 1, b])
                        v = reduce_q(md_iter(v, src, j))
                    scr_ref[half * n_sp + k, 0, b] = v[0]
                    scr_ref[half * n_sp + k, 1, b] = v[1]
            # EVERY cell re-exports the (b, half) src rows from scratch:
            # output blocks flush unconditionally on revisit, so an
            # unwritten revisit would flush stale VMEM over good data.
            # Early special cells export not-yet-written scratch rows;
            # the LAST channel's flush per b is complete and wins.
            for jj in range(n_sp):
                srcs_ref[0, 0, half * n_sp + jj] = \
                    scr_ref[half * n_sp + jj, 0, b]
                srcs_ref[1, 0, half * n_sp + jj] = \
                    scr_ref[half * n_sp + jj, 1, b]
            # this group's ordinary channels apply the removal inline
            v = r
            for j in range(n_sp):
                src = (scr_ref[half * n_sp + j, 0, b],
                       scr_ref[half * n_sp + j, 1, b])
                v = md_iter(v, src, j)
            v = reduce_q(v)
            is_ord = ch >= n_sp
            return u64.select(is_ord, v, r)

        _mulacc_inv_tail(c, acc[0], acc[1], m1_ref, r1_ref, tw_ref,
                         m2_ref, r2_ref, i1_ref, ir1_ref, itw_ref,
                         i2_ref, ir2_ref, k0_ref, k1_ref, o0_ref, o1_ref,
                         a0_ref, a1_ref, dA, dB, split, P, shoup_rec,
                         out_rank4=True, k0wp_ref=k0wp_ref,
                         k1wp_ref=k1wp_ref, fold_cb=fold_cb)

    return kernel, amap


def ksk_accum_from_state(state, terms, off0, k0_full, k1_full, plan,
                         level, part_off, C, interpret=False, ch_off=0,
                         shoup_rec=True, parts=None, moddown=None):
    """Fused switch from the RAW divided-difference state: extension +
    forward transform + ksk multiplies + part accumulation + inverse
    transform, one kernel (_ext_mulacc_inv_kernel).

    state: [2, P, A, S, R] (or [2, P, A, N/128, 128] — same element
    order when plan.R == 128) raw per-part state rows, zero-padded on
    the A axis. terms: u32 [P, max(A-1,1), 6, C] extension scalars
    (already channel-sliced for this call). off0: u32 [2, C]. C: the
    output channel count. Returns [2, C, S, R] tiled plain [0, q)
    coefficient-domain accumulators x2.

    BATCHED form (``parts`` given): state's axis 1 holds B*parts
    segments (bp = b*parts + p); the kernel restarts accumulation at
    every segment boundary and writes per-ct outputs — B independent
    switches in ONE kernel launch, grid (C, B*parts). Returns
    [2, B, C, S, R] x 2."""
    S, R = plan.S, plan.R
    _, BP, A = state.shape[:3]
    P = BP if parts is None else parts
    B = BP // P
    sv = state if state.shape[3:] == (S, R) else state.reshape(
        2, BP, A, S, R)
    t1, r1, tw, t2, r2 = _flat_tables(plan, fwd=True)
    i1f, ir1, itw, i2f, ir2 = _flat_tables(plan, fwd=False)
    consts = _consts_from_plan(plan)
    shoup_ksk = isinstance(k0_full, tuple)
    if shoup_ksk:
        # (value, quotient) pre-tiled 5-D pairs (config.use_shoup_ksk).
        ks = [k0_full[0], k0_full[1], k1_full[0], k1_full[1]]
        kern_fn = _ext_mulacc_inv_kernel_sk
    else:
        if k0_full.ndim == 5:
            ks = [k0_full, k1_full]
        else:
            ks = [x.reshape(2, x.shape[1], x.shape[2], R, S)
                  for x in (k0_full, k1_full)]
        kern_fn = _ext_mulacc_inv_kernel
    if moddown is not None:
        assert shoup_ksk, "moddown fold requires use_shoup_ksk"
        return _ksk_from_state_md_call(
            sv, terms, off0, ks, plan, level, part_off, C, B, P, A,
            ch_off, shoup_rec, interpret, moddown)
    kern = functools.partial(kern_fn, dA=plan.dA,
                             dB=plan.dB, split=plan.split, ch_off=ch_off,
                             P=P, A=A, shoup_rec=shoup_rec)
    out_shape = jax.ShapeDtypeStruct((2, B, C, S, R), state.dtype)

    def tblspec(t):
        return pl.BlockSpec((1,) + t.shape[1:],
                            lambda ch, p: (ch + ch_off, 0, 0),
                            memory_space=pltpu.VMEM)

    kspec = pl.BlockSpec((2, 1, 1, R, S),
                         lambda ch, p: (0, p % P + part_off,
                                        ch + level, 0, 0),
                         memory_space=pltpu.VMEM)
    o0, o1 = pl.pallas_call(
        kern,
        grid=(C, BP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 1, A, S, R), lambda ch, p: (0, p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            tblspec(t1),
            tblspec(r1),
            pl.BlockSpec((2, 1, S, R), lambda ch, p: (0, ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            tblspec(t2),
            tblspec(r2),
            tblspec(i1f),
            tblspec(ir1),
            pl.BlockSpec((2, 1, S, R), lambda ch, p: (0, ch + ch_off, 0, 0),
                         memory_space=pltpu.VMEM),
            tblspec(i2f),
            tblspec(ir2),
        ] + [kspec] * len(ks),
        out_specs=[
            pl.BlockSpec((2, 1, 1, S, R),
                         lambda ch, p: (0, p // P, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, 1, S, R),
                         lambda ch, p: (0, p // P, ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out_shape, out_shape],
        scratch_shapes=[pltpu.VMEM((2, R, S), jnp.uint32),
                        pltpu.VMEM((2, R, S), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(consts, terms, off0, sv, t1, r1, tw, t2, r2,
      i1f, ir1, itw, i2f, ir2, *ks)
    # Same multiple-consumer fusion hazard as _call (see there).
    o0, o1 = jax.lax.optimization_barrier((o0, o1))
    if parts is None:
        return o0[:, 0], o1[:, 0]
    return o0, o1


def _ksk_from_state_md_call(sv, terms, off0, ks, plan, level, part_off,
                            C, B, P, A, ch_off, shoup_rec, interpret,
                            moddown):
    """pallas_call wrapper for the mod-down-folded switch kernels
    (_make_md_kernel). moddown: dict(mode=, n_sp=, piw=[n_sp,4,C] SMEM
    scalars, srcs=input rows for mode='ordinary'). Returns
    (o0, o1[, srcs]) — o* are [2, B, C, S, R]; ordinary-channel rows
    are FULLY mod-downed, special rows raw (dropped by the caller)."""
    mode = moddown["mode"]
    n_sp = moddown["n_sp"]
    piw = moddown["piw"]
    S, R = plan.S, plan.R
    t1, r1, tw, t2, r2 = _flat_tables(plan, fwd=True)
    i1f, ir1, itw, i2f, ir2 = _flat_tables(plan, fwd=False)
    consts = _consts_from_plan(plan)
    kern, amap = _make_md_kernel(mode, n_sp, plan.dA, plan.dB, plan.split,
                                 ch_off, P, A, C, shoup_rec=shoup_rec)

    def tblspec(t):
        return pl.BlockSpec((1,) + t.shape[1:],
                            lambda ch, p: (amap(ch) + ch_off, 0, 0),
                            memory_space=pltpu.VMEM)

    twspec = pl.BlockSpec((2, 1, S, R),
                          lambda ch, p: (0, amap(ch) + ch_off, 0, 0),
                          memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((2, 1, 1, R, S),
                         lambda ch, p: (0, p % P + part_off,
                                        amap(ch) + level, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),     # consts
        pl.BlockSpec(memory_space=pltpu.SMEM),     # terms
        pl.BlockSpec(memory_space=pltpu.SMEM),     # off0
        pl.BlockSpec(memory_space=pltpu.SMEM),     # piw
    ]
    args = [consts, terms, off0, piw]
    if mode == "ordinary":
        in_specs.append(pl.BlockSpec(
            (2, 1, 2 * n_sp, S, R), lambda ch, p: (0, p // P, 0, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(moddown["srcs"])
    in_specs += [
        pl.BlockSpec((2, 1, A, S, R), lambda ch, p: (0, p, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        tblspec(t1), tblspec(r1), twspec, tblspec(t2), tblspec(r2),
        tblspec(i1f), tblspec(ir1),
        pl.BlockSpec((2, 1, S, R),
                     lambda ch, p: (0, amap(ch) + ch_off, 0, 0),
                     memory_space=pltpu.VMEM),
        tblspec(i2f), tblspec(ir2),
    ] + [kspec] * len(ks)
    args += [sv, t1, r1, tw, t2, r2, i1f, ir1, itw, i2f, ir2] + ks

    out_shape = [jax.ShapeDtypeStruct((2, B, C, S, R), sv.dtype)] * 2
    out_specs = [
        pl.BlockSpec((2, 1, 1, S, R),
                     lambda ch, p: (0, p // P, amap(ch), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1, 1, S, R),
                     lambda ch, p: (0, p // P, amap(ch), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((2, R, S), jnp.uint32),
               pltpu.VMEM((2, R, S), jnp.uint32)]
    if mode == "special":
        out_shape.append(
            jax.ShapeDtypeStruct((2, B, 2 * n_sp, S, R), sv.dtype))
        out_specs.append(pl.BlockSpec(
            (2, 1, 2 * n_sp, S, R), lambda ch, p: (0, p // P, 0, 0, 0),
            memory_space=pltpu.VMEM))
        scratch.append(pltpu.VMEM((2 * n_sp, 2, B, S, R), jnp.uint32))

    outs = pl.pallas_call(
        kern,
        grid=(C, B * P),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*args)
    # Same multiple-consumer fusion hazard as _call (see there).
    return jax.lax.optimization_barrier(tuple(outs))


def dispatch_ksk_from_state(state, terms, off0, k0_full, k1_full,
                            mxu_ref, level, part_off, W, interpret=False,
                            parts=None, moddown_piw=None, n_sp=0):
    """ksk_accum_from_state through an MxuRef: one kernel per
    width group, extension scalars channel-sliced per group. W: the
    level's channel count (terms/off0 trailing axis). parts: see
    ksk_accum_from_state (ct-batched segments).

    moddown_piw ([n_sp, 4, W] SMEM scalars): ALSO fold the Shoup
    special-prime removal into the kernels (_make_md_kernel) — the
    group holding the special primes runs first and exports the
    iterated dropped-channel rows to the other groups; returns
    [2, B, W, S, R] x 2 with the ordinary rows fully mod-downed
    (special rows raw; slice them off). Requires Shoup-ksk operands."""
    if moddown_piw is not None:
        if mxu_ref.groups:
            glist = [(gs, ge, gp) for gs, ge, gp in mxu_ref.groups
                     if min(ge, level + W) > max(gs, level)]
        else:
            # contiguous master ref: table channel == global channel, so
            # the span starts at 0 (ch_off = level - 0)
            plan0, off0_ch, _ = resolve_ref(mxu_ref)
            glist = [(level - off0_ch, level + W, plan0)]
        # the special primes are the LAST channels: their group has the
        # maximal hi
        sp_i = max(range(len(glist)), key=lambda i: glist[i][1])
        outs = [None] * len(glist)
        order = [sp_i] + [i for i in range(len(glist)) if i != sp_i]
        srcs = None
        for i in order:
            gs, ge, gplan = glist[i]
            lo, hi = max(gs, level), min(ge, level + W)
            md = {"mode": "special" if i == sp_i else "ordinary",
                  "n_sp": n_sp,
                  "piw": moddown_piw[..., lo - level:hi - level]}
            if i != sp_i:
                md["srcs"] = srcs
            res = ksk_accum_from_state(
                state, terms[..., lo - level:hi - level],
                off0[:, lo - level:hi - level], k0_full, k1_full,
                gplan, lo, part_off, hi - lo, interpret=interpret,
                ch_off=lo - gs, parts=parts, moddown=md)
            if i == sp_i:
                o0, o1, srcs = res
            else:
                o0, o1 = res
            outs[i] = (o0, o1)
        if len(outs) == 1:
            return outs[0]
        return jax.lax.optimization_barrier(
            (jnp.concatenate([o[0] for o in outs], axis=2),
             jnp.concatenate([o[1] for o in outs], axis=2)))
    cat_axis = 1 if parts is None else 2
    if mxu_ref.groups:
        outs0, outs1 = [], []
        for gs, ge, gplan in mxu_ref.groups:
            lo, hi = max(gs, level), min(ge, level + W)
            if hi <= lo:
                continue
            o0, o1 = ksk_accum_from_state(
                state, terms[..., lo - level:hi - level],
                off0[:, lo - level:hi - level], k0_full, k1_full,
                gplan, lo, part_off, hi - lo, interpret=interpret,
                ch_off=lo - gs, parts=parts)
            outs0.append(o0)
            outs1.append(o1)
        if len(outs0) == 1:
            return outs0[0], outs1[0]
        # The barrier is load-bearing (see _call / dispatch).
        return jax.lax.optimization_barrier(
            (jnp.concatenate(outs0, axis=cat_axis),
             jnp.concatenate(outs1, axis=cat_axis)))
    plan, off, _ = resolve_ref(mxu_ref)
    return ksk_accum_from_state(state, terms, off0, k0_full, k1_full,
                                plan, level, part_off, W,
                                interpret=interpret, ch_off=off,
                                parts=parts)
