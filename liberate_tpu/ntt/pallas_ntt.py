"""Fused Pallas TPU kernels for the negacyclic NTT / iNTT.

The XLA fallback in ops.py expresses butterflies as gathers/scatters, which
lower poorly on TPU (vector lanes cannot be shuffled cheaply). This kernel
runs ALL logN stages of one channel's transform inside VMEM with zero
gathers, using the (sublane, lane) = (N/128, 128) matrix view:

- Stages with butterfly span t >= 128 ("row stages") pair whole sublane
  rows: a reshape of the sublane axis makes the even/odd halves contiguous,
  and the twiddle is one scalar per row-pair (precomputed ``row_tw`` plane).
- The last 7 stages ("lane stages", t < 128) pair elements WITHIN a row.
  One 2D transpose moves the lane axis onto sublanes, the 7 stages become
  row stages in the transposed layout (twiddles precomputed per (block,
  original-row) in the ``lane_tw`` plane), and a second transpose restores
  the layout. Two transposes replace 7 stages of lane shuffles.

The butterfly network (and thus the output bit-reversed ordering and every
lazy [0,2q) representative) is identical to ops.ntt/ops.intt — the kernels
are drop-in, bit-exact replacements, validated in tests/test_pallas.py.

Reference equivalent: the per-stage CUDA kernel launches
(src/liberate/ntt/ntt_cuda_kernel.cu:237-548); here one kernel = one full
transform and HBM traffic is a single read+write of the polynomial.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u64

LANES = 128
LANE_STAGES = 7  # stages whose butterfly span t < 128
BIG_M = 256      # row stages with m >= BIG_M use the transposed-data form
# Lane stages with span t < SMALL_T use the full-width masked-roll
# butterfly instead of sublane slicing: a [k, 2, t, R] slice with t < 8
# has degenerate (t, R) tiles (1/8 sublane utilization), and in the
# INVERSE kernel the t=1 stage runs FIRST after the transpose, so its
# layout infects every later stage — the round-3 probes measured the
# 7-stage fused inverse lane phase at 651 us vs 149 us forward (v5e,
# logN=15 C=17). The masked form does one full-width multiply (half of
# it discarded) on perfectly tiled data plus two cheap sublane rolls,
# and selects the identical per-element results (bit-exact).
SMALL_T = 8


# ---------------------------------------------------------------------------
# Host-side twiddle plane construction.
# ---------------------------------------------------------------------------


def lane_tw_offsets(logN: int):
    """(offsets, ks): lane stage i (global stage logN-7+i) has
    k = 128/(2t) blocks per 128-lane row; its [k, R] twiddle plane sits at
    row ``offsets[i]`` of the flat lane_tw plane (sum of k = 127)."""
    ks = []
    for s in range(logN - LANE_STAGES, logN):
        t = 1 << (logN - 1 - s)
        ks.append(LANES // (2 * t))
    offsets = np.concatenate([[0], np.cumsum(ks)[:-1]]).astype(int)
    return offsets, ks


def build_tw_planes(bank: np.ndarray, logN: int):
    """Twiddle planes from a bit-reversed Montgomery twiddle bank [C, N].

    Returns (row_tw [C, n_row, R//2], lane_tw [C, 127, R]) as uint64. Row
    stage s uses row_tw[:, s, :m] (m = 2^s); lane stage i uses
    lane_tw[:, off_i : off_i + k_i, :] where entry [j, r] is the twiddle of
    block B = r*k + j (bank[m + B]).
    """
    N = 1 << logN
    R = N // LANES
    C = bank.shape[0]
    n_row = logN - LANE_STAGES

    # Lane-oriented per-PAIR-ROW plane [C, n_row, 1, R/2]: entry j of stage
    # s is the twiddle of U-row j (bank[m + j // th]); kernels reshape the
    # transposed [R/2, 1] slice straight to (m, th, 1). Lane orientation is
    # deliberate: a sublane-oriented trailing-1 dynamic operand crashes
    # Mosaic at R >= 512.
    row_tw = np.zeros((C, n_row, 1, max(R // 2, 1)), dtype=np.uint64)
    for s in range(n_row):
        m = 1 << s
        th = max(R // (2 * m), 1)
        j = np.arange(R // 2) if R >= 2 else np.arange(1)
        row_tw[:, s, 0, :len(j)] = bank[:, m + j // th]

    offsets, ks = lane_tw_offsets(logN)
    extras = _lane_extra_rows(logN)
    lane_tw = np.zeros((C, int(np.sum(ks)) + len(extras), R),
                       dtype=np.uint64)
    r = np.arange(R)
    for i, (off, k) in enumerate(zip(offsets, ks)):
        s = logN - LANE_STAGES + i
        m = 1 << s
        for j in range(k):
            lane_tw[:, off + j, :] = bank[:, m + r * k + j]
    # Appended rows: per-LANE twiddles of the small-th row stages that
    # execute inside the lane kernel's transposed view (value at lane r
    # = bank[m + r // (2 th)]; see _lane_extra_rows).
    base = int(np.sum(ks))
    for j, (s, m, th) in enumerate(extras):
        lane_tw[:, base + j, :] = bank[:, m + r // (2 * th)]
    return row_tw, lane_tw


# ---------------------------------------------------------------------------
# In-kernel butterfly phases (uint32 (lo, hi) value pairs).
# ---------------------------------------------------------------------------


def _mm(a, b, c, signed):
    if signed:
        return u64.montmul_signed(a, b, c["ql"], c["qh"], c["kl"], c["kh"])
    # Unsigned path: twiddle operand first (identical, keeps XLA-path parity).
    return u64.montmul(b, a, c["ql"], c["qh"], c["kl"], c["kh"])


def _tw_mul(a, S, Sp, c, signed):
    """Multiply by a twiddle-plane constant: Shoup when the plan carries
    precomputed quotient planes (Sp), Montgomery otherwise. Shoup returns
    a different [0, 2q) representative (same value mod q) — the parity
    mode (config.use_shoup_twiddles=False) keeps the Montgomery chain."""
    if Sp is None:
        return _mm(a, S, c, signed)
    return u64.shoup_mul(a, S, Sp, c["q"])


def _tw_pick(rt, f, signed):
    """Apply the slice/reshape ``f`` to every plane row; returns (S, Sp).
    rt is a tuple of 2 (Montgomery) or 4 (plain w + Shoup wp) planes."""
    if len(rt) == 4 and not signed:
        return (f(rt[0]), f(rt[1])), (f(rt[2]), f(rt[3]))
    return (f(rt[0]), f(rt[1])), None


def _cond_sub(v, q2):
    over = ~u64.lt_signed(v, q2)
    return u64.select(over, u64.sub(v, q2), v)


def _row_tw_expand(R, m, th):
    """Slice fn for _tw_pick: a [n_row, 1, R/2] plane row -> full-width
    [R, 1] per-ROW twiddle (value of row r = bank[m + r // (2 th)])."""
    def f(p, m=m, th=th):
        v = jnp.swapaxes(p, 0, 1)[:m * th].reshape(m, th, 1)
        return jnp.broadcast_to(v[:, :1, :], (m, 2 * th, 1)).reshape(R, 1)
    return f


def _row_mask(th, R):
    """[R, LANES] bool: True where the sublane row is the U (even) half
    of its span-th butterfly pair (bit th of the row index clear)."""
    pos = jax.lax.broadcasted_iota(jnp.uint32, (R, LANES), 0)
    return (pos & np.uint32(th)) == 0


def _row_stage_fwd_small(lo, hi, rt, s, m, th, c, signed):
    """CT row stage with span th < SMALL_T via masked sublane rolls on
    the natural [R, 128] view (same rationale as the lane-stage SMALL_T
    path: [m, 2, th, LANES] slices with th < 8 have degenerate sublane
    tiles). Bit-exact with the sliced form."""
    R = lo.shape[0]
    q2 = (c["q2l"], c["q2h"])
    S, Sp = _tw_pick(rt, lambda p: _row_tw_expand(R, m, th)(p[s]), signed)
    x = (lo, hi)
    W = _tw_mul(x, S, Sp, c, signed)              # V at odd rows
    up = (pltpu.roll(W[0], R - th, 0), pltpu.roll(W[1], R - th, 0))
    dn = (pltpu.roll(lo, th, 0), pltpu.roll(hi, th, 0))
    even = _cond_sub(u64.add(x, up), q2)
    odd = _cond_sub(u64.sub(u64.add(dn, q2), W), q2)
    msk = _row_mask(th, R)
    return (jnp.where(msk, even[0], odd[0]), jnp.where(msk, even[1], odd[1]))


def _row_stage_inv_small(lo, hi, rt, s, m, th, c, signed):
    """GS row stage with span th < SMALL_T via masked sublane rolls."""
    R = lo.shape[0]
    q2 = (c["q2l"], c["q2h"])
    S, Sp = _tw_pick(rt, lambda p: _row_tw_expand(R, m, th)(p[s]), signed)
    x = (lo, hi)
    vup = (pltpu.roll(lo, R - th, 0), pltpu.roll(hi, R - th, 0))
    diff = _cond_sub(u64.sub(u64.add(x, q2), vup), q2)    # U-V at even rows
    W = _tw_mul(diff, S, Sp, c, signed)
    even = _cond_sub(u64.add(x, vup), q2)
    Wdn = (pltpu.roll(W[0], th, 0), pltpu.roll(W[1], th, 0))
    msk = _row_mask(th, R)
    return (jnp.where(msk, even[0], Wdn[0]), jnp.where(msk, even[1], Wdn[1]))


def _lane_extra_rows(logN):
    """Row stages executed INSIDE the lane kernel's transposed view.

    Only the TRAILING run of small-th row stages (th < SMALL_T, not
    big-m) may move into the lane kernel — they sit immediately before
    the lane phase, so executing them first in the lane kernel preserves
    stage order. In the transposed [LANES, R] view their row index lives
    on the LANE axis, so the per-row twiddle becomes a lane-oriented
    [1, R] broadcast (the fast Mosaic form — the natural view needs the
    slow sublane-oriented [R, 1] form) and the pair exchange is a lane
    roll. At R > 256 the last row stages are BIG_M transposed-domain
    stages, so the trailing run is empty (gold/platinum keep the
    natural-view masked form). Returns (s, m, th) tuples in ascending s.
    """
    R = (1 << logN) // LANES
    n_row = logN - LANE_STAGES
    out = []
    for s in reversed(range(n_row)):
        m = 1 << s
        th = max(R // (2 * m), 1)
        if th < SMALL_T and m < BIG_M:
            out.append((s, m, th))
        else:
            break
    return tuple(reversed(out))


def _lane_mask_t(th, R):
    pos = jax.lax.broadcasted_iota(jnp.uint32, (LANES, R), 1)
    return (pos & np.uint32(th)) == 0


def _row_stage_fwd_small_t(lo, hi, lt, j, th, c, signed):
    """CT small-th row stage in the TRANSPOSED [LANES, R] view. The
    per-lane twiddle is a precomputed appended lane_tw row (index
    base + j; see build_tw_planes), sliced [1, R] — a sublane broadcast
    of a lane vector, the fast Mosaic form."""
    R = lo.shape[1]
    base = LANES - 1  # sum of lane-stage k's == 127
    q2 = (c["q2l"], c["q2h"])
    S, Sp = _tw_pick(lt, lambda p: p[base + j:base + j + 1, :], signed)
    x = (lo, hi)
    W = _tw_mul(x, S, Sp, c, signed)              # V at odd lanes
    up = (pltpu.roll(W[0], R - th, 1), pltpu.roll(W[1], R - th, 1))
    dn = (pltpu.roll(lo, th, 1), pltpu.roll(hi, th, 1))
    even = _cond_sub(u64.add(x, up), q2)
    odd = _cond_sub(u64.sub(u64.add(dn, q2), W), q2)
    msk = _lane_mask_t(th, R)
    return (jnp.where(msk, even[0], odd[0]), jnp.where(msk, even[1], odd[1]))


def _row_stage_inv_small_t(lo, hi, lt, j, th, c, signed):
    """GS small-th row stage in the TRANSPOSED [LANES, R] view."""
    R = lo.shape[1]
    base = LANES - 1
    q2 = (c["q2l"], c["q2h"])
    S, Sp = _tw_pick(lt, lambda p: p[base + j:base + j + 1, :], signed)
    x = (lo, hi)
    vup = (pltpu.roll(lo, R - th, 1), pltpu.roll(hi, R - th, 1))
    diff = _cond_sub(u64.sub(u64.add(x, q2), vup), q2)
    W = _tw_mul(diff, S, Sp, c, signed)
    even = _cond_sub(u64.add(x, vup), q2)
    Wdn = (pltpu.roll(W[0], th, 1), pltpu.roll(W[1], th, 1))
    msk = _lane_mask_t(th, R)
    return (jnp.where(msk, even[0], Wdn[0]), jnp.where(msk, even[1], Wdn[1]))


def _row_stages_fwd(lo, hi, rt, c, logN, signed, s_lo=0, s_hi=None):
    """Cooley-Tukey stages with t >= 128 on the [R, 128] view."""
    R = lo.shape[0]
    q2 = (c["q2l"], c["q2h"])
    if s_hi is None:
        s_hi = logN - LANE_STAGES
    skip = {e[0] for e in _lane_extra_rows(logN)}
    for s in range(s_lo, s_hi):
        if s in skip:
            continue  # executed inside the lane kernel (transposed view)
        m = 1 << s
        th = R // (2 * m)
        if th < SMALL_T and m < BIG_M:
            # Degenerate-tile spans: masked-roll form (see SMALL_T).
            lo, hi = _row_stage_fwd_small(lo, hi, rt, s, m, th, c, signed)
            continue
        if th == 1 and m < BIG_M:
            # 3D view: the 4D th=1 form trips Mosaic layout inference.
            vl = lo.reshape(m, 2, LANES)
            vh = hi.reshape(m, 2, LANES)
            U = (vl[:, 0], vh[:, 0])
            O = (vl[:, 1], vh[:, 1])
            S, Sp = _tw_pick(rt, lambda p: jnp.swapaxes(p[s], 0, 1)[:m],
                             signed)
            V = _tw_mul(O, S, Sp, c, signed)
            even = _cond_sub(u64.add(U, V), q2)
            odd = _cond_sub(u64.sub(u64.add(U, q2), V), q2)
            lo = jnp.stack([even[0], odd[0]], axis=1).reshape(R, LANES)
            hi = jnp.stack([even[1], odd[1]], axis=1).reshape(R, LANES)
            continue
        if m >= BIG_M:
            # Large-m stages: the whole butterfly runs in the TRANSPOSED
            # [128, R/2] domain (lane-oriented twiddles; sublane-oriented
            # big-m twiddle handling crashes Mosaic at R >= 1024, and
            # reusing a transposed-back product in two consumers does too).
            vl = lo.reshape(m, 2, th * LANES)
            vh = hi.reshape(m, 2, th * LANES)
            # Flatten (m, th, LANES) pair halves to [R/2, 128] row-major.
            Ul = vl[:, 0].reshape(R // 2, LANES)
            Uh = vh[:, 0].reshape(R // 2, LANES)
            Ol = vl[:, 1].reshape(R // 2, LANES)
            Oh = vh[:, 1].reshape(R // 2, LANES)
            Ut = (Ul.T, Uh.T)
            Ot = (Ol.T, Oh.T)
            S, Sp = _tw_pick(rt, lambda p: p[s], signed)
            Vt = _tw_mul(Ot, S, Sp, c, signed)
            even = _cond_sub(u64.add(Ut, Vt), q2)
            odd = _cond_sub(u64.sub(u64.add(Ut, q2), Vt), q2)
            e = (even[0].T.reshape(m, th, LANES),
                 even[1].T.reshape(m, th, LANES))
            o = (odd[0].T.reshape(m, th, LANES),
                 odd[1].T.reshape(m, th, LANES))
            lo = jnp.stack([e[0], o[0]], axis=1).reshape(R, LANES)
            hi = jnp.stack([e[1], o[1]], axis=1).reshape(R, LANES)
            continue
        vl = lo.reshape(m, 2, th, LANES)
        vh = hi.reshape(m, 2, th, LANES)
        U = (vl[:, 0], vh[:, 0])
        O = (vl[:, 1], vh[:, 1])
        S, Sp = _tw_pick(
            rt,
            lambda p: jnp.swapaxes(p[s], 0, 1)[:m * th].reshape(m, th, 1),
            signed)
        V = _tw_mul(O, S, Sp, c, signed)
        even = _cond_sub(u64.add(U, V), q2)
        odd = _cond_sub(u64.sub(u64.add(U, q2), V), q2)
        lo = jnp.stack([even[0], odd[0]], axis=1).reshape(R, LANES)
        hi = jnp.stack([even[1], odd[1]], axis=1).reshape(R, LANES)
    return lo, hi


def _expand_tw(plane, off, k, t, R):
    """[k, R] twiddle rows -> full-width [LANES, R] per-position plane
    (each pair's twiddle repeated over its 2t-position group)."""
    s = jnp.broadcast_to(plane[off:off + k][:, None, :], (k, 2 * t, R))
    return s.reshape(LANES, R)


def _even_mask(t, R):
    """[LANES, R] bool: True where the sublane position is in the even
    (U) half of its butterfly pair (bit t of the position clear)."""
    pos = jax.lax.broadcasted_iota(jnp.uint32, (LANES, R), 0)
    return (pos & np.uint32(t)) == 0


def _lane_stage_fwd_small(lo, hi, lt, off, k, t, c, signed):
    """CT lane stage via masked rolls (see SMALL_T). Bit-exact with the
    sliced form: identical op chains on the selected positions."""
    R = lo.shape[1]
    q2 = (c["q2l"], c["q2h"])
    S, Sp = _tw_pick(lt, lambda p: _expand_tw(p, off, k, t, R), signed)
    x = (lo, hi)
    W = _tw_mul(x, S, Sp, c, signed)              # V at odd positions
    # pltpu.roll wants non-negative shifts; LANES - t == -t mod LANES.
    up = (pltpu.roll(W[0], LANES - t, 0),
          pltpu.roll(W[1], LANES - t, 0))                     # V at even
    dn = (pltpu.roll(lo, t, 0), pltpu.roll(hi, t, 0))         # U at odd
    even = _cond_sub(u64.add(x, up), q2)
    odd = _cond_sub(u64.sub(u64.add(dn, q2), W), q2)
    m = _even_mask(t, R)
    return (jnp.where(m, even[0], odd[0]), jnp.where(m, even[1], odd[1]))


def _lane_stage_inv_small(lo, hi, lt, off, k, t, c, signed):
    """GS lane stage via masked rolls (see SMALL_T)."""
    R = lo.shape[1]
    q2 = (c["q2l"], c["q2h"])
    S, Sp = _tw_pick(lt, lambda p: _expand_tw(p, off, k, t, R), signed)
    x = (lo, hi)
    vup = (pltpu.roll(lo, LANES - t, 0),
           pltpu.roll(hi, LANES - t, 0))                      # V at even
    diff = _cond_sub(u64.sub(u64.add(x, q2), vup), q2)        # U-V at even
    W = _tw_mul(diff, S, Sp, c, signed)
    even = _cond_sub(u64.add(x, vup), q2)
    Wdn = (pltpu.roll(W[0], t, 0), pltpu.roll(W[1], t, 0))    # W at odd
    m = _even_mask(t, R)
    return (jnp.where(m, even[0], Wdn[0]), jnp.where(m, even[1], Wdn[1]))


def _lane_stages_fwd(lo, hi, lt, c, logN, signed,
                     l_lo=0, l_hi=LANE_STAGES, rt=None):
    """The last 7 CT stages, on the TRANSPOSED [128, R] view. When ``rt``
    (the row twiddle planes) is given, the trailing small-th ROW stages
    run here first, in the transposed view (see _lane_extra_rows)."""
    R = lo.shape[0]
    q2 = (c["q2l"], c["q2h"])
    lo = lo.T
    hi = hi.T
    if rt is not None:
        for j, (s, m, th) in enumerate(_lane_extra_rows(logN)):
            lo, hi = _row_stage_fwd_small_t(lo, hi, lt, j, th, c, signed)
    offsets, ks = lane_tw_offsets(logN)
    for i, (off, k) in enumerate(zip(offsets, ks)):
        if not (l_lo <= i < l_hi):
            continue
        t = LANES // (2 * k)
        if t < SMALL_T:
            lo, hi = _lane_stage_fwd_small(lo, hi, lt, off, k, t,
                                           c, signed)
            continue
        vl = lo.reshape(k, 2, t, R)
        vh = hi.reshape(k, 2, t, R)
        U = (vl[:, 0], vh[:, 0])
        O = (vl[:, 1], vh[:, 1])
        S, Sp = _tw_pick(lt, lambda p: p[off:off + k][:, None, :], signed)
        V = _tw_mul(O, S, Sp, c, signed)
        even = _cond_sub(u64.add(U, V), q2)
        odd = _cond_sub(u64.sub(u64.add(U, q2), V), q2)
        lo = jnp.stack([even[0], odd[0]], axis=1).reshape(LANES, R)
        hi = jnp.stack([even[1], odd[1]], axis=1).reshape(LANES, R)
    return lo.T, hi.T


def _lane_stages_inv(lo, hi, lt, c, logN, signed,
                     l_lo=0, l_hi=LANE_STAGES, rt=None):
    """The first 7 Gentleman-Sande stages, transposed view. When ``rt``
    is given, the leading small-th ROW stages (the last of the forward
    schedule, so the FIRST of the inverse) run here after the lane
    stages, still transposed (see _lane_extra_rows)."""
    R = lo.shape[0]
    q2 = (c["q2l"], c["q2h"])
    lo = lo.T
    hi = hi.T
    offsets, ks = lane_tw_offsets(logN)
    for i in reversed(range(l_lo, l_hi)):
        off, k = int(offsets[i]), int(ks[i])
        t = LANES // (2 * k)
        if t < SMALL_T:
            lo, hi = _lane_stage_inv_small(lo, hi, lt, off, k, t,
                                           c, signed)
            continue
        vl = lo.reshape(k, 2, t, R)
        vh = hi.reshape(k, 2, t, R)
        U = (vl[:, 0], vh[:, 0])
        V = (vl[:, 1], vh[:, 1])
        S, Sp = _tw_pick(lt, lambda p: p[off:off + k][:, None, :], signed)
        O = _cond_sub(u64.sub(u64.add(U, q2), V), q2)
        W = _tw_mul(O, S, Sp, c, signed)
        even = _cond_sub(u64.add(U, V), q2)
        lo = jnp.stack([even[0], W[0]], axis=1).reshape(LANES, R)
        hi = jnp.stack([even[1], W[1]], axis=1).reshape(LANES, R)
    if rt is not None:
        # GS order: these (the last forward row stages) come right after
        # the lane stages, highest s first.
        extras = _lane_extra_rows(logN)
        for j in reversed(range(len(extras))):
            th = extras[j][2]
            lo, hi = _row_stage_inv_small_t(lo, hi, lt, j, th, c, signed)
    return lo.T, hi.T


def _row_stages_inv(lo, hi, rt, c, logN, signed, s_lo=0, s_hi=None):
    """Gentleman-Sande stages with t >= 128, natural [R, 128] view."""
    R = lo.shape[0]
    q2 = (c["q2l"], c["q2h"])
    if s_hi is None:
        s_hi = logN - LANE_STAGES
    skip = {e[0] for e in _lane_extra_rows(logN)}
    for s in reversed(range(s_lo, s_hi)):
        if s in skip:
            continue  # executed inside the lane kernel (transposed view)
        m = 1 << s
        th = R // (2 * m)
        if th < SMALL_T and m < BIG_M:
            lo, hi = _row_stage_inv_small(lo, hi, rt, s, m, th, c, signed)
            continue
        if th == 1 and m < BIG_M:
            vl = lo.reshape(m, 2, LANES)
            vh = hi.reshape(m, 2, LANES)
            U = (vl[:, 0], vh[:, 0])
            V = (vl[:, 1], vh[:, 1])
            S, Sp = _tw_pick(rt, lambda p: jnp.swapaxes(p[s], 0, 1)[:m],
                             signed)
            O = _cond_sub(u64.sub(u64.add(U, q2), V), q2)
            W = _tw_mul(O, S, Sp, c, signed)
            even = _cond_sub(u64.add(U, V), q2)
            lo = jnp.stack([even[0], W[0]], axis=1).reshape(R, LANES)
            hi = jnp.stack([even[1], W[1]], axis=1).reshape(R, LANES)
            continue
        vl = lo.reshape(m, 2, th, LANES)
        vh = hi.reshape(m, 2, th, LANES)
        U = (vl[:, 0], vh[:, 0])
        V = (vl[:, 1], vh[:, 1])
        O = _cond_sub(u64.sub(u64.add(U, q2), V), q2)
        if m >= BIG_M:
            Ot = (O[0].reshape(R // 2, LANES).T, O[1].reshape(R // 2, LANES).T)
            S, Sp = _tw_pick(rt, lambda p: p[s], signed)
            Wt = _tw_mul(Ot, S, Sp, c, signed)
            W = (Wt[0].T.reshape(m, th, LANES), Wt[1].T.reshape(m, th, LANES))
        else:
            S, Sp = _tw_pick(
                rt,
                lambda p: jnp.swapaxes(p[s], 0, 1)[:m * th].reshape(m, th, 1),
                signed)
            W = _tw_mul(O, S, Sp, c, signed)
        even = _cond_sub(u64.add(U, V), q2)
        lo = jnp.stack([even[0], W[0]], axis=1).reshape(R, LANES)
        hi = jnp.stack([even[1], W[1]], axis=1).reshape(R, LANES)
    return lo, hi


# ---------------------------------------------------------------------------
# Kernels. Ref shapes carry singleton batch/channel dims from the BlockSpecs:
# consts [10, 1] (SMEM); x/o [2, 1, 1, R, 128]; row_tw [2, 1, n_row, R/2];
# lane_tw [2, 1, 127, R].
# ---------------------------------------------------------------------------


def _read_consts(cref):
    ch = pl.program_id(1)
    c = {
        "ql": cref[0, ch], "qh": cref[1, ch], "kl": cref[2, ch],
        "kh": cref[3, ch], "q2l": cref[4, ch], "q2h": cref[5, ch],
    }
    c["q"] = u64.shr((c["q2l"], c["q2h"]), 1)   # for the Shoup path
    return c


def _tw_planes(ref):
    """Plane rows of a twiddle ref: 2 (Montgomery) or 4 (w + Shoup wp)."""
    return tuple(ref[i, 0] for i in range(ref.shape[0]))


def _final_reduce(lo, hi, c):
    q2 = (c["q2l"], c["q2h"])
    q = u64.shr(q2, 1)
    ok = u64.lt_signed((lo, hi), q)
    red = u64.sub((lo, hi), q)
    return jnp.where(ok, lo, red[0]), jnp.where(ok, hi, red[1])


def _ntt_kernel(cref, x_ref, rowtw_ref, lanetw_ref, o_ref, *,
                logN, signed, pre_enter, post_reduce,
                do_rows=True, do_lanes=True, row_lo=0, row_hi=None,
                l_lo=0, l_hi=LANE_STAGES, pre_canon=False):
    c = _read_consts(cref)
    lo = x_ref[0, 0, 0]
    hi = x_ref[1, 0, 0]
    if pre_canon and do_rows and row_lo == 0:
        # canon_2q(montmul_signed(x, aux)): wrapped-negative inputs (the
        # basis-extension divided differences) -> [0, 2q); the stages then
        # run the unsigned fast path (same chain as _ntt_mulacc_kernel).
        ch = pl.program_id(1)
        S = (cref[6, ch], cref[7, ch])
        q2 = (c["q2l"], c["q2h"])
        lo, hi = u64.montmul_signed((lo, hi), S, c["ql"], c["qh"],
                                    c["kl"], c["kh"])
        neg = hi.astype(jnp.int32) < 0
        fl, fh = u64.add((lo, hi), q2)
        lo = jnp.where(neg, fl, lo)
        hi = jnp.where(neg, fh, hi)
    if pre_enter and do_rows and row_lo == 0:
        ch = pl.program_id(1)
        S = (cref[6, ch], cref[7, ch])
        if rowtw_ref.shape[0] == 4 and not signed:
            # Shoup plan: rows 6..9 = (R mod q, wp) -> x*R in one
            # cheap constant multiply (vs montmul by R^2).
            Sp = (cref[8, ch], cref[9, ch])
            lo, hi = u64.shoup_mul((lo, hi), S, Sp, c["q"])
        else:
            lo, hi = _mm((lo, hi), S, c, signed)
    if do_rows:
        lo, hi = _row_stages_fwd(lo, hi, _tw_planes(rowtw_ref),
                                 c, logN, signed, s_lo=row_lo, s_hi=row_hi)
    if do_lanes:
        lo, hi = _lane_stages_fwd(lo, hi, _tw_planes(lanetw_ref),
                                  c, logN, signed, l_lo=l_lo, l_hi=l_hi,
                                  rt=_tw_planes(rowtw_ref))
    if post_reduce and do_lanes:
        lo, hi = _final_reduce(lo, hi, c)
    o_ref[0, 0, 0] = lo
    o_ref[1, 0, 0] = hi


def _intt_kernel(cref, x_ref, rowtw_ref, lanetw_ref, o_ref, *,
                 logN, signed, post_exit, post_reduce,
                 do_rows=True, do_lanes=True, row_lo=0, row_hi=None,
                 no_norm=False, l_lo=0, l_hi=LANE_STAGES):
    c = _read_consts(cref)
    lo = x_ref[0, 0, 0]
    hi = x_ref[1, 0, 0]
    if do_lanes:
        lo, hi = _lane_stages_inv(lo, hi, _tw_planes(lanetw_ref),
                                  c, logN, signed, l_lo=l_lo, l_hi=l_hi,
                                  rt=_tw_planes(rowtw_ref))
    if do_rows:
        lo, hi = _row_stages_inv(lo, hi, _tw_planes(rowtw_ref),
                                 c, logN, signed, s_lo=row_lo, s_hi=row_hi)
        if row_lo == 0 and not no_norm:
            ch = pl.program_id(1)
            if cref.shape[0] == 14 and not signed:
                # Shoup consts: rows 6..9 = (Ninv, wp); rows 10..13 =
                # (Ninv*R^-1, wp) — norm and Montgomery exit FUSED into
                # one constant multiply.
                r0 = 10 if post_exit else 6
                S = (cref[r0, ch], cref[r0 + 1, ch])
                Sp = (cref[r0 + 2, ch], cref[r0 + 3, ch])
                lo, hi = u64.shoup_mul((lo, hi), S, Sp, c["q"])
            else:
                S = (cref[6, ch], cref[7, ch])  # Ninv (Montgomery form)
                lo, hi = _mm((lo, hi), S, c, signed)
                if post_exit:
                    f = u64.montredc_signed if signed else u64.montredc
                    lo, hi = f((lo, hi), c["ql"], c["qh"],
                               c["kl"], c["kh"])
            if post_reduce:
                lo, hi = _final_reduce(lo, hi, c)
    o_ref[0, 0, 0] = lo
    o_ref[1, 0, 0] = hi


def _ntt_mulacc_kernel(cref, x_ref, rowtw_ref, lanetw_ref, k0_ref, k1_ref,
                       o0_ref, o1_ref, *, logN, n_parts, canon=True):
    """Key-switch inner loop, fused: per (channel, part) block —
    identity-montmul + canon of the (signed) basis-extension output, the
    full forward NTT in VMEM, multiply by BOTH ksk halves, and accumulate
    over the part axis into the two output blocks (which stay resident in
    VMEM across the inner part loop).

    Replaces the composed chain canon(montmul_ident) -> ntt -> mont_mult
    x2 -> P-fold mont_add, whose intermediates each round-trip HBM
    (reference equivalent: the per-(device, part) ksk multiplies and
    accumulation, ckks_engine.py:788-840). Bit-exact: identical op order
    per element.
    """
    ch = pl.program_id(0)
    p = pl.program_id(1)
    c = {
        "ql": cref[0, ch], "qh": cref[1, ch], "kl": cref[2, ch],
        "kh": cref[3, ch], "q2l": cref[4, ch], "q2h": cref[5, ch],
    }
    c["q"] = u64.shr((c["q2l"], c["q2h"]), 1)
    q2 = (c["q2l"], c["q2h"])
    lo = x_ref[0, 0, 0]
    hi = x_ref[1, 0, 0]

    if canon:
        # canon_2q(montmul_signed(x, R mod q)): wrapped-negative divided
        # differences -> [0, 2q) so the stages run the unsigned fast path
        # (mirrors ops.canon_2q + mont_enter_scalar(ident, signed=True)).
        # canon=False: Shoup-form extension, already unsigned plain.
        S = (cref[6, ch], cref[7, ch])
        lo, hi = u64.montmul_signed((lo, hi), S, c["ql"], c["qh"],
                                    c["kl"], c["kh"])
        neg = hi.astype(jnp.int32) < 0
        fl, fh = u64.add((lo, hi), q2)
        lo = jnp.where(neg, fl, lo)
        hi = jnp.where(neg, fh, hi)

    lo, hi = _row_stages_fwd(lo, hi, _tw_planes(rowtw_ref), c, logN, False)
    lo, hi = _lane_stages_fwd(lo, hi, _tw_planes(lanetw_ref), c, logN,
                              False, rt=_tw_planes(rowtw_ref))

    k0 = (k0_ref[0, 0, 0], k0_ref[1, 0, 0])
    k1 = (k1_ref[0, 0, 0], k1_ref[1, 0, 0])
    p0 = u64.montmul((lo, hi), k0, c["ql"], c["qh"], c["kl"], c["kh"])
    p1 = u64.montmul((lo, hi), k1, c["ql"], c["qh"], c["kl"], c["kh"])

    @pl.when(p == 0)
    def _init():
        o0_ref[0, 0] = p0[0]
        o0_ref[1, 0] = p0[1]
        o1_ref[0, 0] = p1[0]
        o1_ref[1, 0] = p1[1]

    @pl.when(p != 0)
    def _accum():
        a0 = _cond_sub(u64.add((o0_ref[0, 0], o0_ref[1, 0]), p0), q2)
        o0_ref[0, 0] = a0[0]
        o0_ref[1, 0] = a0[1]
        a1 = _cond_sub(u64.add((o1_ref[0, 0], o1_ref[1, 0]), p1), q2)
        o1_ref[0, 0] = a1[0]
        o1_ref[1, 0] = a1[1]


def supports_fused_accum(plan) -> bool:
    """The single fused switch kernel covers the single-kernel transform
    sizes (R <= SPLIT_ROWS); the phase-split variant covers every size
    (its row chunks are the same kernels the big-logN transforms use).
    Sharded plans use the composed path (the per-part fold stays a psum
    GSPMD can schedule)."""
    from .. import config

    if plan.mesh is not None:
        return False
    if config.use_split_switch:
        return True
    return (1 << plan.logN) // LANES <= SPLIT_ROWS


def _ksk_mulacc_kernel(cref, x_ref, k0_ref, k1_ref, o0_ref, o1_ref):
    """Tail of the key-switch core as its own kernel: multiply the NTT'd
    basis-extension block by both ksk halves and accumulate over the part
    axis (outputs resident in VMEM across the inner part loop)."""
    ch = pl.program_id(0)
    p = pl.program_id(1)
    ql, qh = cref[0, ch], cref[1, ch]
    kl, kh = cref[2, ch], cref[3, ch]
    q2 = (cref[4, ch], cref[5, ch])
    x = (x_ref[0, 0, 0], x_ref[1, 0, 0])
    k0 = (k0_ref[0, 0, 0], k0_ref[1, 0, 0])
    k1 = (k1_ref[0, 0, 0], k1_ref[1, 0, 0])
    p0 = u64.montmul(x, k0, ql, qh, kl, kh)
    p1 = u64.montmul(x, k1, ql, qh, kl, kh)

    @pl.when(p == 0)
    def _init():
        o0_ref[0, 0] = p0[0]
        o0_ref[1, 0] = p0[1]
        o1_ref[0, 0] = p1[0]
        o1_ref[1, 0] = p1[1]

    @pl.when(p != 0)
    def _accum():
        a0 = _cond_sub(u64.add((o0_ref[0, 0], o0_ref[1, 0]), p0), q2)
        o0_ref[0, 0] = a0[0]
        o0_ref[1, 0] = a0[1]
        a1 = _cond_sub(u64.add((o1_ref[0, 0], o1_ref[1, 0]), p1), q2)
        o1_ref[0, 0] = a1[0]
        o1_ref[1, 0] = a1[1]


def _ntt_ksk_accum_split(ext, k0_full, k1_full, plan, ident, level,
                         part_off, interpret=False, canon=True):
    """Phase-split key-switch core (see config.use_split_switch):
    [canon+]row-phase kernel(s) -> lane-phase kernel -> multiply+
    accumulate kernel. Bit-exact with the fused ntt_ksk_accum (identical
    per-element op order); trades one [2, P, C, N] HBM round trip between
    phases for kernels small enough that Mosaic schedules them well.
    canon=False: the extension is already unsigned [0, 2q) plain-domain
    (config.use_shoup_extend) — no pre-stage at all."""
    _, P, C, N = ext.shape
    R = N // LANES
    consts = plan.consts.at[6].set(ident[0]).at[7].set(ident[1])
    n_row = plan.logN - LANE_STAGES

    mid = ext
    for lo_s, hi_s in _row_chunks(n_row, R):
        k1 = functools.partial(_ntt_kernel, logN=plan.logN, signed=False,
                               pre_enter=False, post_reduce=False,
                               do_lanes=False, row_lo=lo_s, row_hi=hi_s,
                               pre_canon=canon)
        mid = _call(k1, mid, consts, plan.row_tw, plan.lane_tw, interpret)
    k2 = functools.partial(_ntt_kernel, logN=plan.logN, signed=False,
                           pre_enter=False, post_reduce=False,
                           do_rows=False)
    mid = _call_lanes(k2, mid, consts, plan.row_tw, plan.lane_tw, interpret)

    xv = mid.reshape(2, P, C, R, LANES)
    k0v = k0_full.reshape(2, k0_full.shape[1], k0_full.shape[2], R, LANES)
    k1v = k1_full.reshape(2, k1_full.shape[1], k1_full.shape[2], R, LANES)
    out_shape = jax.ShapeDtypeStruct((2, C, R, LANES), ext.dtype)
    o0, o1 = pl.pallas_call(
        _ksk_mulacc_kernel,
        grid=(C, P),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 1, 1, R, LANES),
                         lambda ch, p: (0, p, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, 1, R, LANES),
                         lambda ch, p: (0, p + part_off, ch + level, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, 1, R, LANES),
                         lambda ch, p: (0, p + part_off, ch + level, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, 1, R, LANES), lambda ch, p: (0, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, R, LANES), lambda ch, p: (0, ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(consts, xv, k0v, k1v)
    return o0.reshape(2, C, N), o1.reshape(2, C, N)


def ntt_ksk_accum(ext, k0_full, k1_full, plan, ident, level, part_off,
                  interpret=False, canon=True):
    """Fused key-switch core. ext: [2, P, C, N] signed basis-extension
    outputs at the level layout. k0_full/k1_full: [2, P_full, C0, N]
    pre-stacked full-width ksk halves — the level slice (+``level``) and
    the active-part suffix (+``part_off``) are taken via block indexing,
    so no sliced copies are materialized. ident: packed [2, C] Montgomery
    identity (R mod q). Returns (d0, d1): [2, C, N] accumulated over
    parts, in the NTT+Montgomery domain, in [0, 2q).
    """
    from .. import config

    if config.use_split_switch:
        return _ntt_ksk_accum_split(ext, k0_full, k1_full, plan, ident,
                                    level, part_off, interpret=interpret,
                                    canon=canon)
    _, P, C, N = ext.shape
    R = N // LANES
    consts = plan.consts.at[6].set(ident[0]).at[7].set(ident[1])
    n_row = plan.row_tw.shape[2]
    n_lane = plan.lane_tw.shape[2]
    xv = ext.reshape(2, P, C, R, LANES)
    k0v = k0_full.reshape(2, k0_full.shape[1], k0_full.shape[2], R, LANES)
    k1v = k1_full.reshape(2, k1_full.shape[1], k1_full.shape[2], R, LANES)

    kern = functools.partial(_ntt_mulacc_kernel, logN=plan.logN, n_parts=P,
                             canon=canon)
    out_shape = jax.ShapeDtypeStruct((2, C, R, LANES), ext.dtype)
    o0, o1 = pl.pallas_call(
        kern,
        grid=(C, P),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 1, 1, R, LANES),
                         lambda ch, p: (0, p, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.row_tw.shape[0], 1, n_row, 1,
                          plan.row_tw.shape[4]),
                         lambda ch, p: (0, ch, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.lane_tw.shape[0], 1, n_lane, R),
                         lambda ch, p: (0, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, 1, R, LANES),
                         lambda ch, p: (0, p + part_off, ch + level, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, 1, R, LANES),
                         lambda ch, p: (0, p + part_off, ch + level, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, 1, R, LANES), lambda ch, p: (0, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, R, LANES), lambda ch, p: (0, ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(consts, xv, plan.row_tw, plan.lane_tw, k0v, k1v)
    return o0.reshape(2, C, N), o1.reshape(2, C, N)


# ---------------------------------------------------------------------------
# pallas_call wrappers.
# ---------------------------------------------------------------------------


def _call(kernel, a, consts, row_tw, lane_tw, interpret):
    """Launch over (batch, channel). a: [2, C, N] or [2, B, C, N]."""
    batched = a.ndim == 4
    if not batched:
        a = a[:, None]
    _, B, C, N = a.shape
    R = N // LANES
    n_row = row_tw.shape[2]
    n_lane = lane_tw.shape[2]
    av = a.reshape(2, B, C, R, LANES)

    out = pl.pallas_call(
        kernel,
        grid=(B, C),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 1, 1, R, LANES), lambda b, c: (0, b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tw.shape[0], 1, n_row, 1, row_tw.shape[4]),
                         lambda b, c: (0, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lane_tw.shape[0], 1, n_lane, R),
                         lambda b, c: (0, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, 1, R, LANES),
                               lambda b, c: (0, b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(av.shape, av.dtype),
        interpret=interpret,
    )(consts, av, row_tw, lane_tw)

    out = out.reshape(2, B, C, N)
    return out if batched else out[:, 0]


def _call_lanes(kernel, a, consts, row_tw, lane_tw, interpret,
                tile_r=256):
    """Lane-phase launch with the sublane-row axis tiled over the grid.

    The 7 lane stages only couple elements WITHIN each 128-lane row, so the
    R axis is embarrassingly parallel — tiling it keeps the kernel's live
    set at the size Mosaic handles (the fused R>256 kernel crashes its
    register allocator)."""
    batched = a.ndim == 4
    if not batched:
        a = a[:, None]
    _, B, C, N = a.shape
    R = N // LANES
    n_row = row_tw.shape[2]
    n_lane = lane_tw.shape[2]
    av = a.reshape(2, B, C, R, LANES)
    tile_r = min(tile_r, R)   # small-R (test) shapes: one tile
    nt = R // tile_r

    out = pl.pallas_call(
        kernel,
        grid=(B, C, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 1, 1, tile_r, LANES),
                         lambda b, c, r: (0, b, c, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tw.shape[0], 1, n_row, 1, row_tw.shape[4]),
                         lambda b, c, r: (0, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lane_tw.shape[0], 1, n_lane, tile_r),
                         lambda b, c, r: (0, c, 0, r),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, 1, tile_r, LANES),
                               lambda b, c, r: (0, b, c, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(av.shape, av.dtype),
        interpret=interpret,
    )(consts, av, row_tw, lane_tw)

    out = out.reshape(2, B, C, N)
    return out if batched else out[:, 0]


# Above this many sublane rows the full transform is split into row-phase
# and lane-phase kernels: the single fused kernel exceeds what Mosaic can
# register-allocate at logN >= 16 (compiler crash). The lane phase is then
# additionally tiled over the row axis, and the row phase is chunked into
# R//256 stage groups (working-set pressure grows with R).
SPLIT_ROWS = 256

# On the split path, wide channel counts are additionally sliced into
# balanced slabs of at most this many channels, each its own pallas_call
# chain (channels are independent, so this is bit-exact by construction).
# Empirically the TPU compile of the split kernels succeeds at channel
# widths around 20 but crashes the remote compile helper at the platinum
# full width (C=79, logN=17); the crash is not perfectly deterministic,
# which is why the logN=17 Pallas path stays gated off in ntt_context.
CSLAB = 20


def _reduce_external(out, plan):
    """[0,2q) -> [0,q) on a kernel output, outside the kernel.

    Bit-identical to the in-kernel _final_reduce; used on the split path,
    where fusing the reduce into the final row-chunk kernel pushes the
    TPU kernel compile over the edge at wide channel counts."""
    q2 = (plan.consts[4][:, None], plan.consts[5][:, None])  # [C, 1]
    q = u64.shr(q2, 1)
    v = (out[0], out[1])
    ok = u64.lt_signed(v, q)
    red = u64.sub(v, q)
    return jnp.stack([jnp.where(ok, v[0], red[0]),
                      jnp.where(ok, v[1], red[1])])


def _slab_plan(plan, lo, hi):
    """Channel-slice [lo, hi) of every per-channel plan table."""
    return PallasPlan(
        plan.logN,
        plan.consts[:, lo:hi], plan.consts_enter[:, lo:hi],
        plan.consts_ninv[:, lo:hi],
        plan.row_tw[:, lo:hi], plan.lane_tw[:, lo:hi],
        plan.row_itw[:, lo:hi], plan.lane_itw[:, lo:hi])


def _slab_bounds(C):
    nslab = -(-C // CSLAB)
    base, rem = divmod(C, nslab)
    bounds, lo = [], 0
    for i in range(nslab):
        hi = lo + base + (1 if i < rem else 0)
        bounds.append((lo, hi))
        lo = hi
    return bounds


def _row_chunks(n_row, R):
    """Partition row stages [0, n_row) into R//SPLIT_ROWS balanced chunks;
    stages with m >= BIG_M (transposed-data form) each get their own
    kernel — two of them in one kernel exceed Mosaic's allocator."""
    import math

    first_big = max(0, int(math.log2(BIG_M)))
    small_hi = min(n_row, first_big)
    n_chunks = max(1, R // SPLIT_ROWS)
    base = small_hi // n_chunks
    rem = small_hi % n_chunks
    chunks = []
    lo = 0
    for i in range(n_chunks):
        hi = lo + base + (1 if i < rem else 0)
        if hi > lo:
            chunks.append((lo, hi))
        lo = hi
    for sbig in range(small_hi, n_row):
        chunks.append((sbig, sbig + 1))
    return chunks


def _sharded_transform(fn, a, plan, kw):
    """Run ``fn`` (ntt/intt) per-shard under ``jax.shard_map``: the data's
    channel axis (-2) and every plan leaf's channel axis live on
    ``plan.mesh_axis``; each chip runs the fused kernels on its local
    channel block. Plan leaves travel as a plain tuple (a PallasPlan in
    ``in_specs`` would need spec-typed leaves with mismatched aux)."""
    from jax.sharding import PartitionSpec as P

    mesh, ax = plan.mesh, plan.mesh_axis
    leaves, _ = plan.tree_flatten()

    def leaf_spec(x):
        if x.ndim == 2:                      # consts [10, C]
            return P(None, ax)
        return P(None, ax, *([None] * (x.ndim - 2)))

    data_spec = P(*([None] * (a.ndim - 2)), ax, None)

    def body(a_l, leaves_l):
        return fn(a_l, PallasPlan(plan.logN, *leaves_l), **kw)

    # check_vma=False: pallas_call's out_shape carries no vma annotation.
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(data_spec, tuple(leaf_spec(x) for x in leaves)),
        out_specs=data_spec, check_vma=False)(a, leaves)


def ntt(a, plan, signed=False, pre_enter=False, post_reduce=False,
        interpret=False):
    """Forward NTT over packed [2, C, N] or batched [2, B, C, N]."""
    from .. import config

    if signed and plan.row_tw.shape[0] == 4:
        raise ValueError(
            "signed transforms need the Montgomery twiddle planes; this "
            "plan was built with Shoup (plain-w) planes "
            "(config.use_shoup_twiddles)")
    if plan.mesh is not None:
        return _sharded_transform(
            ntt, a, plan, dict(signed=signed, pre_enter=pre_enter,
                               post_reduce=post_reduce, interpret=interpret))
    consts = plan.consts_enter if pre_enter else plan.consts
    R = a.shape[-1] // LANES
    C = a.shape[-2]
    if R > SPLIT_ROWS and C > CSLAB:
        return jnp.concatenate(
            [ntt(a[..., lo:hi, :], _slab_plan(plan, lo, hi), signed=signed,
                 pre_enter=pre_enter, post_reduce=post_reduce,
                 interpret=interpret)
             for lo, hi in _slab_bounds(C)], axis=-2)
    if R <= SPLIT_ROWS and not config.use_split_transform:
        kern = functools.partial(_ntt_kernel, logN=plan.logN, signed=signed,
                                 pre_enter=pre_enter, post_reduce=post_reduce)
        return _call(kern, a, consts, plan.row_tw, plan.lane_tw, interpret)
    n_row = plan.logN - LANE_STAGES
    mid = a
    for lo_s, hi_s in _row_chunks(n_row, R):
        k1 = functools.partial(_ntt_kernel, logN=plan.logN, signed=signed,
                               pre_enter=pre_enter, post_reduce=post_reduce,
                               do_lanes=False, row_lo=lo_s, row_hi=hi_s)
        mid = _call(k1, mid, consts, plan.row_tw, plan.lane_tw, interpret)
    k2 = functools.partial(_ntt_kernel, logN=plan.logN, signed=signed,
                           pre_enter=pre_enter, post_reduce=post_reduce,
                           do_rows=False)
    return _call_lanes(k2, mid, consts, plan.row_tw, plan.lane_tw, interpret)


def _norm_exit_external(out, plan, signed, post_exit, post_reduce):
    """The iNTT tail — N^{-1} normalize (Montgomery multiply), optional
    Montgomery exit, optional [0,2q)->[0,q) reduce — as XLA ops on the
    kernel output.

    Bit-identical to the in-kernel chain (same u64 call sequence); kept
    outside the kernels because Mosaic schedules the trailing scalar
    multiply pathologically inside large fused kernels (0.5-0.9 ms for
    one multiply at logN=15 C=17 on v5e — benchmarks/ntt_probe2.py)."""
    cn = plan.consts_ninv
    shp = (slice(None),) + (None,) * (out.ndim - 3) + (slice(None), None)
    bc = shp[1:]
    v = (out[0], out[1])
    if cn.shape[0] == 14 and not signed:
        # Shoup consts (see make_plan): norm (+ fused Montgomery exit)
        # as one constant multiply.
        r0 = 10 if post_exit else 6
        S = (cn[r0][bc], cn[r0 + 1][bc])
        Sp = (cn[r0 + 2][bc], cn[r0 + 3][bc])
        q = u64.shr((cn[4][bc], cn[5][bc]), 1)
        v = u64.shoup_mul(v, S, Sp, q)
    else:
        ql, qh = cn[0][bc], cn[1][bc]
        kl, kh = cn[2][bc], cn[3][bc]
        S = (cn[6][bc], cn[7][bc])
        if signed:
            v = u64.montmul_signed(v, S, ql, qh, kl, kh)
        else:
            v = u64.montmul(S, v, ql, qh, kl, kh)
        if post_exit:
            f = u64.montredc_signed if signed else u64.montredc
            v = f(v, ql, qh, kl, kh)
    out = jnp.stack([v[0], v[1]])
    if post_reduce:
        out = _reduce_external(out, plan)
    return out


def intt(a, plan, signed=False, post_exit=False, post_reduce=False,
         no_norm=False, interpret=False):
    """Inverse NTT. no_norm skips the trailing N^{-1} multiply (the
    coefficient-sharded path normalizes globally after its cross-shard
    stages — identical op chain to ops.intt_no_norm)."""
    from .. import config

    assert not (no_norm and (post_exit or post_reduce)), \
        "no_norm skips the exit chain entirely"
    if signed and plan.row_itw.shape[0] == 4:
        raise ValueError(
            "signed transforms need the Montgomery twiddle planes; this "
            "plan was built with Shoup (plain-w) planes "
            "(config.use_shoup_twiddles)")
    if plan.mesh is not None:
        return _sharded_transform(
            intt, a, plan, dict(signed=signed, post_exit=post_exit,
                                post_reduce=post_reduce, no_norm=no_norm,
                                interpret=interpret))
    R = a.shape[-1] // LANES
    C = a.shape[-2]
    if R > SPLIT_ROWS and C > CSLAB:
        return jnp.concatenate(
            [intt(a[..., lo:hi, :], _slab_plan(plan, lo, hi), signed=signed,
                  post_exit=post_exit, post_reduce=post_reduce,
                  no_norm=no_norm, interpret=interpret)
             for lo, hi in _slab_bounds(C)], axis=-2)
    if R <= SPLIT_ROWS and not config.use_split_transform:
        kern = functools.partial(_intt_kernel, logN=plan.logN, signed=signed,
                                 post_exit=post_exit,
                                 post_reduce=post_reduce, no_norm=no_norm)
        return _call(kern, a, plan.consts_ninv, plan.row_itw, plan.lane_itw,
                     interpret)
    n_row = plan.logN - LANE_STAGES
    k1 = functools.partial(_intt_kernel, logN=plan.logN, signed=signed,
                           post_exit=False, post_reduce=False,
                           do_rows=False)
    mid = _call_lanes(k1, a, plan.consts_ninv, plan.row_itw, plan.lane_itw,
                      interpret)
    # GS row stages run high-to-low: iterate the chunks in reverse. All
    # kernels run no_norm; the normalize/exit/reduce tail is external.
    for lo_s, hi_s in reversed(_row_chunks(n_row, R)):
        k2 = functools.partial(_intt_kernel, logN=plan.logN, signed=signed,
                               post_exit=False, post_reduce=False,
                               do_lanes=False, row_lo=lo_s, row_hi=hi_s,
                               no_norm=True)
        mid = _call(k2, mid, plan.consts_ninv, plan.row_itw, plan.lane_itw,
                    interpret)
    if not no_norm:
        mid = _norm_exit_external(mid, plan, signed, post_exit, post_reduce)
    elif post_reduce:
        mid = _reduce_external(mid, plan)
    return mid


# ---------------------------------------------------------------------------
# Plan: per-pack precomputed tables.
# ---------------------------------------------------------------------------


class PallasPlan:
    """Precomputed twiddle planes + per-channel constant rows for one
    channel layout. Constant rows (uint32 [10, C]):
    ql qh kl kh q2lo q2hi aux_lo aux_hi pad pad — aux is R^2 for the fused
    forward enter, Ninv for the inverse normalization.

    When ``mesh`` is set the plan is CHANNEL-SHARDED: every leaf's channel
    axis is placed over ``mesh_axis``, and ``ntt``/``intt`` wrap the
    kernels in ``jax.shard_map`` so each chip transforms its local channel
    block with the fused kernels (channels are chip-local under RNS
    sharding — SURVEY 2.4 item 1 — so the kernels need no cross-chip
    logic). GSPMD cannot partition pallas_call automatically; this is the
    explicit-placement answer."""

    def __init__(self, logN, consts, consts_enter, consts_ninv,
                 row_tw, lane_tw, row_itw, lane_itw,
                 mesh=None, mesh_axis="rns"):
        self.logN = logN
        self.consts = consts
        self.consts_enter = consts_enter
        self.consts_ninv = consts_ninv
        self.row_tw = row_tw
        self.lane_tw = lane_tw
        self.row_itw = row_itw
        self.lane_itw = lane_itw
        self.mesh = mesh
        self.mesh_axis = mesh_axis

    def tree_flatten(self):
        leaves = (self.consts, self.consts_enter, self.consts_ninv,
                  self.row_tw, self.lane_tw, self.row_itw, self.lane_itw)
        return leaves, (self.logN, self.mesh, self.mesh_axis)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        if not isinstance(aux, tuple):   # legacy aux = logN
            aux = (aux, None, "rns")
        logN, mesh, mesh_axis = aux
        return cls(logN, *leaves, mesh=mesh, mesh_axis=mesh_axis)


jax.tree_util.register_pytree_node(
    PallasPlan, lambda p: p.tree_flatten(), PallasPlan.tree_unflatten)


def _pack_u64(arr):
    """uint64 [...] -> packed uint32 [2, ...]."""
    arr = np.asarray(arr, dtype=np.uint64)
    return np.stack([(arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                     (arr >> np.uint64(32)).astype(np.uint32)])


def _shoup_bank(bank_plain, q_list):
    """wp = floor(w * 2^64 / q) per channel row; native C++ when present,
    Python ints otherwise (small/test shapes)."""
    from .. import native

    bank_plain = np.asarray(bank_plain, dtype=np.uint64)
    out = np.empty_like(bank_plain)
    for ci, q in enumerate(q_list):
        wp = native.shoup_precompute(bank_plain[ci], int(q))
        if wp is None:
            row = bank_plain[ci].astype(object)
            wp = np.array([(int(w) << 64) // int(q) for w in row],
                          dtype=np.uint64)
        out[ci] = wp
    return out


def make_plan(logN, q, k, Rs, Ninv, psi_bank_mont, ipsi_bank_mont,
              psi_bank_plain=None, ipsi_bank_plain=None):
    """Build a PallasPlan.

    q, k: python-int lists (k = -q^{-1} mod R, R = 2^62). Rs = R^2 mod q.
    Ninv = N^{-1}*R mod q. psi banks: [C, N] Montgomery-form bit-reversed
    twiddles (identical lazy representatives to the XLA path).

    When the PLAIN banks are also given, the twiddle planes carry four
    limb rows [w_lo, w_hi, wp_lo, wp_hi] (wp = floor(w*2^64/q)) and the
    kernels run the Shoup constant-multiply path — ~2.4x faster twiddle
    multiplies on the VPU, same values mod q, different [0, 2q)
    representatives (config.use_shoup_twiddles; benchmarks/ntt_probe6.py).
    """
    C = len(q)
    LB = (1 << 31) - 1

    def u32row(vals):
        return np.asarray(vals, dtype=np.uint64).astype(np.uint32)

    base = np.zeros((10, C), dtype=np.uint32)
    base[0] = u32row([qi & LB for qi in q])
    base[1] = u32row([qi >> 31 for qi in q])
    base[2] = u32row([ki & LB for ki in k])
    base[3] = u32row([ki >> 31 for ki in k])
    base[4] = u32row([(2 * qi) & 0xFFFFFFFF for qi in q])
    base[5] = u32row([(2 * qi) >> 32 for qi in q])

    consts = base.copy()
    consts_enter = base.copy()
    consts_enter[6] = u32row([v & 0xFFFFFFFF for v in Rs])
    consts_enter[7] = u32row([v >> 32 for v in Rs])
    consts_ninv = base.copy()
    consts_ninv[6] = u32row([v & 0xFFFFFFFF for v in Ninv])
    consts_ninv[7] = u32row([v >> 32 for v in Ninv])

    def _u64arr(x):
        x = np.asarray(x)
        return x.view(np.uint64) if x.dtype == np.int64 \
            else x.astype(np.uint64)

    if psi_bank_plain is not None:
        # Shoup planes: rows [w_lo, w_hi, wp_lo, wp_hi], w PLAIN form.
        fwd = _u64arr(psi_bank_plain)
        inv = _u64arr(ipsi_bank_plain)
        fwd_p = _shoup_bank(fwd, q)
        inv_p = _shoup_bank(inv, q)

        # Shoup scalar constants. Enter: x -> x*R via w = R mod q
        # (replaces montmul by R^2). Norm: x -> x*Ninv via w = Ninv
        # plain; norm+exit FUSED: x -> x*Ninv*R^-1 in ONE multiply
        # (replaces montmul(Ninv*R) + montredc). Layout: consts_enter
        # rows 6..9 = (w, wp); consts_ninv rows 6..9 = (Ninv, wp),
        # rows 10..13 = (Ninv*R^-1, wp).
        R64 = 1 << 62

        def wrow(ws, qs_):
            wps = [(int(w) << 64) // int(qq) for w, qq in zip(ws, qs_)]
            return [u32row([int(w) & 0xFFFFFFFF for w in ws]),
                    u32row([int(w) >> 32 for w in ws]),
                    u32row([wp & 0xFFFFFFFF for wp in wps]),
                    u32row([wp >> 32 for wp in wps])]

        w_enter = [R64 % qq for qq in q]
        consts_enter[6:10] = wrow(w_enter, q)
        rinvs = [pow(R64, -1, qq) for qq in q]
        ninv_plain = [(int(n) * ri) % qq
                      for n, ri, qq in zip(Ninv, rinvs, q)]
        ninv_exit = [(n * ri) % qq
                     for n, ri, qq in zip(ninv_plain, rinvs, q)]
        consts_ninv = np.concatenate(
            [consts_ninv[:6], np.stack(wrow(ninv_plain, q)),
             np.stack(wrow(ninv_exit, q))], axis=0)

        def planes(w_bank, wp_bank):
            rw, lw = build_tw_planes(w_bank, logN)
            rp, lp = build_tw_planes(wp_bank, logN)
            return (np.concatenate([_pack_u64(rw), _pack_u64(rp)], axis=0),
                    np.concatenate([_pack_u64(lw), _pack_u64(lp)], axis=0))

        row_tw, lane_tw = planes(fwd, fwd_p)
        row_itw, lane_itw = planes(inv, inv_p)
    else:
        fwd = _u64arr(psi_bank_mont)
        inv = _u64arr(ipsi_bank_mont)
        rw, lw = build_tw_planes(fwd, logN)
        ri, li = build_tw_planes(inv, logN)
        row_tw, lane_tw = _pack_u64(rw), _pack_u64(lw)
        row_itw, lane_itw = _pack_u64(ri), _pack_u64(li)

    return PallasPlan(
        logN,
        jnp.asarray(consts), jnp.asarray(consts_enter),
        jnp.asarray(consts_ninv),
        jnp.asarray(row_tw), jnp.asarray(lane_tw),
        jnp.asarray(row_itw), jnp.asarray(lane_itw),
    )
