"""The CKKS engine: the user-facing FHE API, TPU-native.

Re-implements the full scheme-level logic of the reference engine
(reference: src/liberate/fhe/ckks_engine.py) on top of this framework's
packed uint32-limb polynomial ops (liberate_tpu.ntt.ops). The reference
orchestrates per-device torch tensors with pinned-buffer copies; here every
polynomial is ONE logical jnp array [2, C, N] (limb-major), compositions of
modular ops are jitted per (level, op) so XLA fuses the whole limb dance,
and multi-chip execution is a sharding annotation over the RNS channel axis
(see liberate_tpu.parallel) instead of hand-rolled device loops.

Level/layout convention (reference: ckks_context.py:237-260): the global
prime order is q = [scale_0..scale_{L-1}, base, special_0..special_{k-1}].
A ciphertext at level ``l`` holds the contiguous channel suffix q[l:] minus
the special primes; keys hold the full level-0 with-special layout and are
sliced by ``l`` (always a contiguous suffix slice — this is why the layout
keeps the base prime between scales and specials).
"""

import functools
import math
import pickle
from hashlib import sha256
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..csprng import Csprng
from ..ntt import ops, pallas_ntt, u64
from ..ntt.ntt_context import NttContext, LevelPack
from .context.ckks_context import CkksContext
from .data_struct import DataStruct, data_struct
from .encdec import encdec
from .presets import errors, types


# ---------------------------------------------------------------------------
# Jitted cores. Packs are passed as pytree arguments: jit specializes per
# channel-count (= per level), which is this framework's answer to the
# reference's per-level prepacked argument bundles
# (reference: src/liberate/ntt/ntt_context.py:417-527).
# ---------------------------------------------------------------------------


@jax.jit
def _sk_core(ternary, pack):
    return ops.enter_ntt(ops.tile_unsigned(ternary, pack), pack)


@jax.jit
def _pk_core(e, a, sk, pack):
    """pk0 = e - a*sk (all in NTT+Montgomery domain).

    sk arrives at its stored (full) width, a at the real channel count;
    both are fitted to the pack width inside the trace (see fit_channels).
    """
    W = pack.q2.shape[1]
    sk = ops.fit_channels(sk, W)
    a = ops.fit_channels(a, W)
    e_t = ops.enter_ntt(ops.tile_unsigned(e, pack), pack)
    sa = ops.mont_mult(a, sk, pack)
    return ops.mont_sub(e_t, sa, pack), a


@functools.partial(jax.jit, static_argnums=(7,))
def _encrypt_core(pt, dc, e0, e1, v, pk0, pk1, level, pack):
    """ct = (v*pk0 + pt + e0, v*pk1 + e1) (reference: ckks_engine.py:418-480).

    ``dc`` is the bias-guard DC-coefficient RNS remainder, packed [2, W]
    (zeros when bias_guard is off; reference: ckks_engine.py:1520-1522).
    pk0/pk1 arrive at their stored level-0 width; the level slice + width
    fit happens inside the trace.
    """
    W = pack.q2.shape[1]
    pk0 = ops.fit_channels(pk0[:, level:], W)
    pk1 = ops.fit_channels(pk1[:, level:], W)
    e0_t = ops.tile_unsigned(e0, pack)
    e1_t = ops.tile_unsigned(e1, pack)

    pt_t = ops.tile_unsigned(pt, pack)
    col = u64.add((pt_t[0, :, 0], pt_t[1, :, 0]), (dc[0], dc[1]))
    pt_t = pt_t.at[0, :, 0].set(col[0]).at[1, :, 0].set(col[1])

    # Signed multiply + canon: plaintext coefficients may exceed +-q (the
    # scale^2 representation needs the full RNS range — reference encrypt
    # docstring, ckks_engine.py:419-428); signed semantics reduce any int64
    # correctly mod each channel prime.
    pt_t = ops.mont_enter_scalar(pt_t, pack.Rs_scale, pack, signed=True)
    pt_t = ops.canon_2q(ops.mont_redc_signed(pt_t, pack), pack)
    pte0 = ops.mont_add(pt_t, e0_t, pack)

    v_n = ops.enter_ntt(ops.tile_unsigned(v, pack), pack)
    vpk0 = ops.intt_exit(ops.mont_mult(v_n, pk0, pack), pack)
    vpk1 = ops.intt_exit(ops.mont_mult(v_n, pk1, pack), pack)

    ct0 = ops.reduce_2q(ops.mont_add(vpk0, pte0, pack), pack)
    ct1 = ops.reduce_2q(ops.mont_add(vpk1, e1_t, pack), pack)
    return ct0, ct1


@functools.partial(jax.jit, static_argnums=(3,))
def _decrypt_double_pt(ct0, ct1, sk, level, pack):
    """pt = ct0 + ct1*sk (reference: ckks_engine.py:535-577)."""
    sk = ops.fit_channels(sk[:, level:], pack.q2.shape[1])
    a_n = ops.enter_ntt(ct1, pack)
    sa = ops.intt_exit(ops.mont_mult(a_n, sk, pack), pack)
    return ops.reduce_2q(ops.mont_add(ct0, sa, pack), pack)


@functools.partial(jax.jit, static_argnums=(4,))
def _decrypt_triplet_pt(d0, d1, d2, sk, level, pack):
    """pt = d0 + d1*sk + d2*sk^2 (reference: ckks_engine.py:482-533)."""
    sk = ops.fit_channels(sk[:, level:], pack.q2.shape[1])
    d0_p = ops.intt_exit_reduce(d0, pack)
    d1_s = ops.intt_exit(ops.mont_mult(d1, sk, pack), pack)
    s2 = ops.mont_mult(sk, sk, pack)
    d2_s2 = ops.intt_exit(ops.mont_mult(d2, s2, pack), pack)
    pt = ops.mont_add(d0_p, d1_s, pack)
    pt = ops.mont_add(pt, d2_s2, pack)
    return ops.reduce_2q(pt, pack)


@functools.partial(jax.jit, static_argnums=(4,))
def _final_rescale(pt, base_pack, final_scalar, round_half, base_at):
    """Fused final rescale of decryption (reference: ckks_engine.py:557-576).

    Takes the base-prime channel and the scaler (rescale) channel and forms
    round((base - scaler) / q_l) as a signed base-prime representative.
    round_half: packed [2] — q_l // 2 for the exact-rounding correction.
    """
    base = pt[:, base_at:base_at + 1]
    scaler = pt[:, 0:1]
    scaled = ops.mont_sub(base, scaler, base_pack)
    scaled = ops.mont_enter_scalar(scaled, final_scalar, base_pack)
    scaled = ops.reduce_2q(scaled, base_pack)
    scaled = ops.make_signed(scaled, base_pack)

    rh = (round_half[0].reshape(1, 1), round_half[1].reshape(1, 1))
    rounder = (~u64.lt_unsigned((scaler[0], scaler[1]), rh)
               & ~u64.eq((scaler[0], scaler[1]), rh)).astype(jnp.uint32)
    s = u64.add((scaled[0], scaled[1]), (rounder, jnp.zeros_like(rounder)))
    return u64.pack(*s)


@jax.jit
def _add_core(a0, a1, b0, b1, pack):
    c0 = ops.reduce_2q(ops.mont_add(a0, b0, pack), pack)
    c1 = ops.reduce_2q(ops.mont_add(a1, b1, pack), pack)
    return c0, c1


@jax.jit
def _sub_core(a0, a1, b0, b1, pack):
    c0 = ops.reduce_2q(ops.mont_sub(a0, b0, pack), pack)
    c1 = ops.reduce_2q(ops.mont_sub(a1, b1, pack), pack)
    return c0, c1


@jax.jit
def _neg_core(d, pack):
    return ops.reduce_2q(ops.neg(ops.reduce_2q(d, pack), pack), pack)


@jax.jit
def _rescale_core(d, rs, round_half, pack_next):
    """Drop the rescale channel: (d - s) * q_l^{-1} with exact rounding
    (reference: ckks_engine.py:967-1052). round_half=None disables rounding."""
    s = d[:, 0:1]
    body = ops.fit_channels(d[:, 1:], pack_next.q2.shape[1])
    s_b = (jnp.broadcast_to(s[0], body[0].shape),
           jnp.broadcast_to(s[1], body[1].shape))
    diff = u64.pack(*u64.sub((body[0], body[1]), s_b))
    out = ops.mont_enter_scalar(diff, rs, pack_next, signed=True)
    if round_half is not None:
        rh = (round_half[0].reshape(1, 1), round_half[1].reshape(1, 1))
        gt = (~u64.lt_unsigned((s[0], s[1]), rh)
              & ~u64.eq((s[0], s[1]), rh))
        rounder = jnp.broadcast_to(gt.astype(jnp.uint32), out[0].shape)
        out = u64.pack(*u64.add((out[0], out[1]),
                                (rounder, jnp.zeros_like(rounder))))
    return ops.reduce_2q(out, pack_next)


@jax.jit
def _rescale_core_tiled(d, rs, round_half, pack_next):
    """_rescale_core on the [2, C, N/128, 128] view — identical op order
    (bit-exact), but the dropped-channel broadcast operand carries full
    8-sublane tiles instead of XLA's degenerate T(1,128) tiling for
    [2, 1, N]. Selected at CALL time via config.use_tiled_rescale (a
    separate jitted entry keeps the trace caches of the two paths
    independent)."""
    W = pack_next.q2.shape[1]
    N = d.shape[2]
    R = N // 128
    v = (d[0].reshape(-1, R, 128), d[1].reshape(-1, R, 128))
    s = (v[0][0:1], v[1][0:1])
    body = (v[0][1:], v[1][1:])
    C = body[0].shape[0]
    if W > C:       # fit_channels: repeat the last real channel
        pad = lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (W - C, R, 128))], axis=0)
        body = (pad(body[0]), pad(body[1]))
    s_b = (jnp.broadcast_to(s[0], body[0].shape),
           jnp.broadcast_to(s[1], body[1].shape))
    diff = u64.sub(body, s_b)
    ql = pack_next.ql[:, None, None]
    qh = pack_next.qh[:, None, None]
    kl = pack_next.kl[:, None, None]
    kh = pack_next.kh[:, None, None]
    out = u64.montmul_signed(
        diff, (rs[0][:, None, None], rs[1][:, None, None]),
        ql, qh, kl, kh)
    if round_half is not None:
        rh = (round_half[0].reshape(1, 1, 1), round_half[1].reshape(1, 1, 1))
        gt = ~u64.lt_unsigned(s, rh) & ~u64.eq(s, rh)
        rounder = jnp.broadcast_to(gt.astype(jnp.uint32), out[0].shape)
        out = u64.add(out, (rounder, jnp.zeros_like(rounder)))
    q2 = (pack_next.q2[0][:, None, None], pack_next.q2[1][:, None, None])
    q = u64.shr(q2, 1)
    lt = u64.lt_signed(out, q)
    out = u64.select(lt, out, u64.sub(out, q))
    return u64.pack(out[0].reshape(W, N), out[1].reshape(W, N))


@jax.jit
def _rescale_core_shoup(d, rs_sh, bp, round_half, pack_next):
    """_rescale_core in the plain (Shoup) domain: the dropped-channel
    broadcast is Barrett-reduced per surviving channel and the q_l^{-1}
    multiply is a Shoup constant multiply (config.use_shoup_rescale) —
    same values mod q as the Montgomery chain (the trailing canonical
    reduce makes the outputs bit-identical; tests/test_shoup_chains.py),
    ~25% fewer VPU ops per element."""
    w, wp = rs_sh
    W = pack_next.q2.shape[1]
    N = d.shape[-1]
    R = N // 128
    # Leading batch dims supported ([2, B, C, N]): the fused mult stacks
    # its four input rescales into ONE call (one fusion, no per-array
    # dispatch gaps). Channel axis stays at -3 of the tiled view so the
    # per-channel constants broadcast right-aligned.
    lead = d.shape[1:-2]
    C_in = d.shape[-2]
    v = (d[0].reshape(lead + (C_in, R, 128)),
         d[1].reshape(lead + (C_in, R, 128)))
    s = (v[0][..., 0:1, :, :], v[1][..., 0:1, :, :])
    body = (v[0][..., 1:, :, :], v[1][..., 1:, :, :])
    C = C_in - 1
    if W > C:       # fit_channels: repeat the last real channel
        pad = lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[..., -1:, :, :],
                                 lead + (W - C, R, 128))], axis=-3)
        body = (pad(body[0]), pad(body[1]))

    def col(t):
        return (t[0][:, None, None], t[1][:, None, None])

    q2 = col(pack_next.q2)
    q = u64.shr(q2, 1)
    s_b = (jnp.broadcast_to(s[0], body[0].shape),
           jnp.broadcast_to(s[1], body[1].shape))
    s_red = u64.barrett_2q(s_b, col(bp), q)    # [0, 2q) per target channel
    diff = u64.sub(u64.add(body, q2), s_red)   # body + 2q - s_red in [0, 4q)
    out = u64.shoup_mul(diff, col(w), col(wp), q)
    if round_half is not None:
        rh = (round_half[0].reshape(1, 1, 1), round_half[1].reshape(1, 1, 1))
        gt = ~u64.lt_unsigned(s, rh) & ~u64.eq(s, rh)
        rounder = jnp.broadcast_to(gt.astype(jnp.uint32), out[0].shape)
        out = u64.add(out, (rounder, jnp.zeros_like(rounder)))
    lt = u64.lt_signed(out, q)
    out = u64.select(lt, out, u64.sub(out, q))
    return u64.pack(out[0].reshape(lead + (W, N)),
                    out[1].reshape(lead + (W, N)))


def _mod_down_shoup(d, pack_sp, pack_ord, PiWs, bp, n_sp, C_sp,
                    W_sp, W_ord, tiled=False):
    """Special-prime removal entirely in the plain domain
    (config.use_shoup_moddown): no Montgomery enter, the dropped-channel
    tile is Barrett-reduced per target channel, every P_j^{-1} multiply
    is a Shoup constant multiply, and the final Montgomery exit
    disappears. Same values mod q as the Montgomery chain — the
    trailing canonical reduce makes the output bit-identical
    (tests/test_shoup_chains.py) — at ~half the VPU ops per element.

    d: [2, W_sp, N] plain [0, q) — or [2, W_sp, T, L] already tiled
    (the fold_inverse MXU switch output; element-order-identical view,
    kept 4-D so no layout round trip). Leading batch dims are supported
    on either form (the batched mult: [2, B, W_sp, ...]); the channel
    axis stays at -3 of the tiled view. Returns [2, (B,) W_ord, N]
    plain [0, q).
    """
    if tiled:
        N = d.shape[-2] * d.shape[-1]
        R = N // 128
        if d.shape[-2:] == (R, 128):
            v = (d[0], d[1])
        else:
            v = (d[0].reshape(d[0].shape[:-2] + (R, 128)),
                 d[1].reshape(d[1].shape[:-2] + (R, 128)))
    else:
        N = d.shape[-1]
        R = N // 128
        v = (d[0].reshape(d[0].shape[:-1] + (R, 128)),
             d[1].reshape(d[1].shape[:-1] + (R, 128)))
    lead = v[0].shape[:-3]

    def col(s):
        return (s[0][:, None, None], s[1][:, None, None])

    def crow(t, lo, hi):
        return t[..., lo:hi, :, :]

    q2 = col(pack_sp.q2)
    q = u64.shr(q2, 1)
    bp_c = col(bp)
    for P_ind in range(n_sp):
        v = jax.lax.optimization_barrier(v)
        cur = C_sp - P_ind
        src = (crow(v[0], cur - 1, cur), crow(v[1], cur - 1, cur))
        if P_ind:
            # The dropped channel is subtracted as an INTEGER: it must be
            # the canonical [0, q) representative, but the prior Shoup
            # iteration left [0, 2q) — one conditional subtract of the
            # source row's own modulus. (The Montgomery chain reduces the
            # full array each iteration; only the tile's integer value
            # matters.)
            qr = (q[0][cur - 1:cur], q[1][cur - 1:cur])
            ge = ~u64.lt_unsigned(src, qr)
            src = u64.select(ge, u64.sub(src, qr), src)
        tile = (jnp.broadcast_to(src[0], v[0].shape),
                jnp.broadcast_to(src[1], v[1].shape))
        tile = u64.barrett_2q(tile, bp_c, q)
        s = u64.sub(u64.add(v, q2), tile)      # v + 2q - tile in [0, 4q)
        w, wp = PiWs[P_ind]
        v = u64.shoup_mul(s, col(w), col(wp), q)    # back to [0, 2q)
    v = jax.lax.optimization_barrier(v)
    vo = (crow(v[0], 0, W_ord), crow(v[1], 0, W_ord))
    q2o = (pack_ord.q2[0][:, None, None], pack_ord.q2[1][:, None, None])
    qo = u64.shr(q2o, 1)
    lt = u64.lt_signed(vo, qo)
    r = u64.select(lt, vo, u64.sub(vo, qo))
    return u64.pack(r[0].reshape(lead + (W_ord, N)),
                    r[1].reshape(lead + (W_ord, N)))


def _mod_down_tiled(d, pack_sp, pack_ord, PiRs, enter_ord, n_sp, C_sp,
                    W_sp, W_ord):
    """The composed mod-down chain on a [2, C, N/128, 128] view.

    Identical per-element op order to the flat chain in _switcher_fn's
    mod_down (bit-exact), but the dropped-channel broadcast operand is
    [1, R, 128] — full 8-sublane tiles — instead of [1, N] (which XLA
    tiles T(1,128), wasting 7/8 of every vector op on that operand's
    consumers)."""
    N = d.shape[2]
    R = N // 128
    v = (d[0].reshape(W_sp, R, 128), d[1].reshape(W_sp, R, 128))

    def col(s):                       # packed [2, C] -> pair [C, 1, 1]
        return (s[0][:, None, None], s[1][:, None, None])

    ql = pack_sp.ql[:, None, None]
    qh = pack_sp.qh[:, None, None]
    kl = pack_sp.kl[:, None, None]
    kh = pack_sp.kh[:, None, None]
    q2 = col(pack_sp.q2)
    q = u64.shr(q2, 1)

    def mm_s(a, b):
        return u64.montmul_signed(a, b, ql, qh, kl, kh)

    def cond_sub(a):
        over = ~u64.lt_signed(a, q2)
        return u64.select(over, u64.sub(a, q2), a)

    enter = col(enter_ord)
    v = mm_s(v, enter)
    for P_ind in range(n_sp):
        v = jax.lax.optimization_barrier(v)
        cur = C_sp - P_ind
        tile = (jnp.broadcast_to(v[0][cur - 1:cur], v[0].shape),
                jnp.broadcast_to(v[1][cur - 1:cur], v[1].shape))
        tile = mm_s(tile, enter)
        v = cond_sub(u64.sub(u64.add(v, q2), tile))      # mont_sub
        v = mm_s(v, col(PiRs[P_ind]))
        lt = u64.lt_signed(v, q)                          # reduce_2q
        v = u64.select(lt, v, u64.sub(v, q))
    v = jax.lax.optimization_barrier(v)
    vo = (v[0][:W_ord], v[1][:W_ord])
    qlo, qho = pack_ord.ql[:, None, None], pack_ord.qh[:, None, None]
    klo, kho = pack_ord.kl[:, None, None], pack_ord.kh[:, None, None]
    r = u64.montredc_signed(vo, qlo, qho, klo, kho)
    q2o = (pack_ord.q2[0][:, None, None], pack_ord.q2[1][:, None, None])
    qo = u64.shr(q2o, 1)
    lt = u64.lt_signed(r, qo)
    r = u64.select(lt, r, u64.sub(r, qo))
    return u64.pack(r[0].reshape(W_ord, N), r[1].reshape(W_ord, N))


@jax.jit
def _cc_mult_core(x0, x1, y0, y1, pack):
    """(d0, d1, d2) = (x0y0, x0y1+x1y0, x1y1) in the NTT domain
    (reference: ckks_engine.py:1090-1101). Inputs may carry leading
    batch dims ([2, B, C, N] — the batched mult); the stack collapses
    them into the kernel batch axis."""
    # One batched transform (B=4) instead of four separate chains — same
    # rationale as _relin_pre: one kernel launch, larger grid.
    st = jnp.stack([x0, x1, y0, y1], axis=1)     # [2, 4, ..., C, N]
    shp = st.shape
    r = ops.enter_ntt(st.reshape((2, -1) + shp[-2:]), pack).reshape(shp)
    x0, x1, y0, y1 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    d0 = ops.mont_mult(x0, y0, pack)
    d1 = ops.mont_add(ops.mont_mult(x0, y1, pack),
                      ops.mont_mult(x1, y0, pack), pack)
    d2 = ops.mont_mult(x1, y1, pack)
    return d0, d1, d2


@jax.jit
def _square_core(x0, x1, pack):
    r = ops.enter_ntt(jnp.stack([x0, x1], axis=1), pack)
    x0, x1 = r[:, 0], r[:, 1]
    d0 = ops.mont_mult(x0, x0, pack)
    x0x1 = ops.mont_mult(x0, x1, pack)
    d1 = ops.mont_add(x0x1, x0x1, pack)
    d2 = ops.mont_mult(x1, x1, pack)
    return d0, d1, d2


@jax.jit
def _relin_pre(d0, d1, d2, pack):
    # One batched transform (B=3) instead of three separate chains: fewer
    # kernel programs per compile (the TPU compile helper chokes on
    # many-kernel programs at platinum width) and a larger grid per
    # launch. Leading batch dims collapse into the kernel batch axis.
    st = jnp.stack([d0, d1, d2], axis=1)         # [2, 3, ..., C, N]
    shp = st.shape
    r = ops.intt_exit_reduce(st.reshape((2, -1) + shp[-2:]),
                             pack).reshape(shp)
    return r[:, 0], r[:, 1], r[:, 2]


@jax.jit
def _relin_post(d0, d1, s0, s1, pack):
    c0 = ops.reduce_2q(
        u64.pack(*u64.add((d0[0], d0[1]), (s0[0], s0[1]))), pack)
    c1 = ops.reduce_2q(
        u64.pack(*u64.add((d1[0], d1[1]), (s1[0], s1[1]))), pack)
    return c0, c1


@functools.partial(jax.jit, static_argnums=(3,))
def _scalar_mult_core(d, mont, pack, drop=0):
    """Per-channel scalar multiply; ``drop`` channels are sliced off the
    front first (the level_up channel drop), with the width fitted to the
    pack inside the trace."""
    if drop:
        d = d[:, drop:]
    d = ops.fit_channels(d, pack.q2.shape[1])
    return ops.reduce_2q(ops.mont_enter_scalar(d, mont, pack), pack)


@jax.jit
def _add_dc_core(d, vals, pack):
    col = u64.add((d[0, :, 0], d[1, :, 0]), (vals[0], vals[1]))
    d = d.at[0, :, 0].set(col[0]).at[1, :, 0].set(col[1])
    return ops.reduce_2q(d, pack)


@jax.jit
def _mc_mult_core(pt, d0, d1, pack):
    pt_t = ops.enter_ntt(ops.tile_unsigned(pt, pack), pack)
    x0 = ops.enter_ntt(d0, pack)
    x1 = ops.enter_ntt(d1, pack)
    n0 = ops.intt_exit_reduce(ops.mont_mult(pt_t, x0, pack), pack)
    n1 = ops.intt_exit_reduce(ops.mont_mult(pt_t, x1, pack), pack)
    return n0, n1


@jax.jit
def _mc_add_core(pt, d0, pack):
    pt_t = ops.mont_enter_scale(ops.tile_unsigned(pt, pack), pack)
    x0 = ops.mont_enter(d0, pack)
    n0 = ops.mont_redc(ops.mont_add(pt_t, x0, pack), pack)
    return ops.reduce_2q(n0, pack)


@jax.jit
def _rotate_sk_core(sk, gather, neg, pack):
    """Coefficient-domain signed permutation of the secret key (Montgomery
    form commutes with permutation; reference: ckks_engine.py:1161-1164).
    Negatives are canonicalized back to [0, 2q) so the resulting key stays
    on the fast unsigned Montgomery path."""
    sk = ops.fit_channels(sk, pack.q2.shape[1])
    c = ops.intt(sk, pack)
    r = ops.apply_signed_perm(c, gather, neg)
    r = ops.canon_2q(r, pack)
    return ops.ntt(r, pack)


@jax.jit
def _rotate_ct_core(d, gather, neg, pack):
    r = ops.apply_signed_perm(d, gather, neg)
    r = ops.make_unsigned(r, pack)
    return ops.reduce_2q(r, pack)


@functools.partial(jax.jit, static_argnums=(3,))
def _mp_decrypt_head(ct0, ct1, sk, level, pack):
    sk = ops.fit_channels(sk[:, level:], pack.q2.shape[1])
    a_n = ops.enter_ntt(ct1, pack)
    sa = ops.intt_exit(ops.mont_mult(a_n, sk, pack), pack)
    return ops.mont_add(ct0, sa, pack)


@functools.partial(jax.jit, static_argnums=(2,))
def _mp_decrypt_partial(ct1, sk, level, pack):
    sk = ops.fit_channels(sk[:, level:], pack.q2.shape[1])
    a_n = ops.enter_ntt(ct1, pack)
    return ops.intt_exit(ops.mont_mult(a_n, sk, pack), pack)


_COMPILE_CACHE_SET = False


def _enable_compile_cache():
    """Persist XLA executables across processes: the per-level jit
    specializations are expensive to build (especially the key switcher) and
    fully deterministic, so cache them next to the parameter cache."""
    global _COMPILE_CACHE_SET
    if _COMPILE_CACHE_SET:
        return
    _COMPILE_CACHE_SET = True
    try:
        # CPU AOT cache entries are machine-feature-sensitive (reloading
        # across hosts risks SIGILL); only persist accelerator executables.
        if all(d.platform == "cpu" for d in jax.devices()):
            return
        from .cache.cache import ensure_cache
        cache_dir = str(Path(ensure_cache()) / "xla")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


@errors.log_error
class CkksEngine:
    """The user-facing CKKS engine (reference: ckks_engine.py:22-2726).

    All public methods mirror the reference API; DataStructs carry packed
    uint32-limb jnp arrays instead of per-device torch tensors. The class
    decorator wraps every public method with exception logging, like the
    reference's per-method @errors.log_error
    (reference: ckks_engine.py throughout).
    """

    def __init__(self, devices=None, verbose: bool = False,
                 bias_guard: bool = True, norm: str = "forward",
                 seed=None, mesh_shape=None, mesh=None, **ctx_params):
        _enable_compile_cache()
        # mesh / mesh_shape are the TPU analogue of the reference's
        # ``devices`` list: how many chips the RNS channel axis spans.
        # With a mesh, every channel axis (data and pack constants) is
        # padded to a multiple of the mesh size and placed channel-sharded;
        # GSPMD then turns the jitted pipelines into per-chip programs with
        # ICI collectives where the reference does manual peer copies
        # (see liberate_tpu.parallel).
        if mesh is None and mesh_shape is not None:
            from ..parallel import make_mesh
            n = (int(np.prod(mesh_shape))
                 if isinstance(mesh_shape, (tuple, list)) else int(mesh_shape))
            mesh = make_mesh(n)
        self.mesh = mesh
        self.mesh_axis = "rns"
        # 2-D ('rns', 'coef') meshes (parallel.make_mesh2d) shard channels
        # over 'rns' and coefficients over 'coef' — the channel padding
        # quantum is the rns extent only.
        self.coef_axis = ("coef" if mesh is not None
                          and "coef" in mesh.axis_names
                          and mesh.shape["coef"] > 1 else None)
        if mesh is None:
            self.channel_quantum = 1
        elif self.coef_axis is not None:
            self.channel_quantum = (int(mesh.shape["rns"])
                                    if "rns" in mesh.axis_names else 1)
        else:
            self.channel_quantum = int(np.prod(mesh.devices.shape))
        self.mesh_shape = mesh_shape
        self.devices = devices
        self.bias_guard = bias_guard
        self.norm = norm

        from ..version import VERSION
        self.version = VERSION

        self.ctx = CkksContext(**ctx_params)
        self.ntt = NttContext(self.ctx, verbose=verbose,
                              channel_quantum=self.channel_quantum,
                              mesh=mesh, mesh_axis=self.mesh_axis)

        # The deepest usable level (reference: ckks_engine.py:52).
        self.num_levels = self.ntt.num_levels - 1
        self.num_slots = self.ctx.N // 2
        self.num_ordinary = self.ntt.num_ordinary_primes
        self.num_special = self.ntt.num_special_primes

        rng_repeats = max(self.num_special, 2)
        self.rng = Csprng(self.ctx.N, self.num_ordinary, rng_repeats,
                          sigma=self.ctx.sigma, seed=seed)

        self.int_scale = 2 ** self.ctx.scale_bits
        self.scale = np.float64(self.int_scale)

        self.hash = self.ctx.engine_hash()

        self._make_adjustments_and_corrections()
        self._make_mont_PR()
        self._create_ksk_rescales()
        self._create_rescale_scales()

        self.galois_deltas = [2 ** i for i in range(self.ctx.logN - 1)]
        self._switcher_cache = {}
        self._perm_device_cache = {}
        import collections
        self._ksk_stacked_cache = collections.OrderedDict()

        self.mult_dispatch = {
            (DataStruct, DataStruct): self.auto_cc_mult,
            (list, DataStruct): self.mc_mult,
            (np.ndarray, DataStruct): self.mc_mult,
            (DataStruct, np.ndarray): self.cm_mult,
            (DataStruct, list): self.cm_mult,
            (float, DataStruct): self.scalar_mult,
            (DataStruct, float): self.mult_scalar,
            (int, DataStruct): self.int_scalar_mult,
            (DataStruct, int): self.mult_int_scalar,
        }
        self.add_dispatch = {
            (DataStruct, DataStruct): self.auto_cc_add,
            (list, DataStruct): self.mc_add,
            (np.ndarray, DataStruct): self.mc_add,
            (DataStruct, np.ndarray): self.cm_add,
            (DataStruct, list): self.cm_add,
            (float, DataStruct): self.scalar_add,
            (DataStruct, float): self.add_scalar,
            (int, DataStruct): self.scalar_add,
            (DataStruct, int): self.add_scalar,
        }
        self.sub_dispatch = {
            (DataStruct, DataStruct): self.auto_cc_sub,
            (list, DataStruct): self.mc_sub,
            (np.ndarray, DataStruct): self.mc_sub,
            (DataStruct, np.ndarray): self.cm_sub,
            (DataStruct, list): self.cm_sub,
            (float, DataStruct): self.scalar_sub,
            (DataStruct, float): self.sub_scalar,
            (int, DataStruct): self.scalar_sub,
            (DataStruct, int): self.sub_scalar,
        }

    # -- precomputation -------------------------------------------------------

    def _make_adjustments_and_corrections(self):
        """Per-level deviation/correction factors and the final decryption
        scalar q_l^{-1}*R mod base_prime (reference: ckks_engine.py:243-263)."""
        ctx = self.ctx
        self.alpha = [(self.scale / np.float64(q)) ** 2
                      for q in ctx.q[:ctx.num_scales]]
        self.deviations = [1.0]
        for al in self.alpha:
            self.deviations.append(self.deviations[-1] ** 2 * al)

        # At level l the rescale channel is q[l] (single logical device).
        self.final_q = [ctx.q[l] for l in range(self.num_levels)]
        self.final_alpha = [(self.scale / np.float64(q)) for q in self.final_q]
        self.corrections = [1 / (d * fa) for d, fa
                            in zip(self.deviations, self.final_alpha)]

        self.base_prime = ctx.q[self.num_ordinary - 1]
        self.base_idx = self.num_ordinary - 1

        self.final_scalar = []
        self.round_halves = []
        for q in self.final_q:
            scalar = (pow(q, -1, self.base_prime) * ctx.R) % self.base_prime
            self.final_scalar.append(jnp.asarray(_pack_scalar(scalar)))
            self.round_halves.append(jnp.asarray(_pack_scalar(q // 2)[:, 0]))

        # Single-channel pack of the base prime (the "-1 level" of the
        # reference's wrappers).
        self.base_pack = self.ntt._make_pack(np.array([self.base_idx]),
                                             with_psi=False)

    def _make_mont_PR(self):
        """P*R mod q_i over the ordinary primes, for ksk generation
        (reference: ckks_engine.py:229-241)."""
        P = math.prod(self.ctx.q[-self.num_special:])
        PR = P * self.ctx.R
        vals = [PR % q for q in self.ctx.q[:self.num_ordinary]]
        self.mont_PR = jnp.asarray(
            _pack_list(vals, pad_to=self.ntt.padded_channels(0, -1)))

    def _create_ksk_rescales(self):
        """P_j^{-1}*R mod q_i tables for the special-prime mod-down
        (reference: ckks_engine.py:183-216).

        TPU layout decision: the mod-down keeps the FULL with-special channel
        width through every iteration (static shapes, no slice/concat chains
        — those trigger pathological XLA fusion duplication). Dead channels
        are multiplied by the Montgomery identity scalar R (montmul(x, R) =
        x), so PiRs[level][P_ind] is padded to full width with R.
        """
        ctx = self.ctx
        R = ctx.R
        P = ctx.q[-self.num_special:][::-1]
        self.PiRs = []
        self.enter_ord = []
        # Shoup-form (plain-domain) mod-down tables: per special prime a
        # (P_j^{-1} mod q_i, Shoup quotient) pair, plus the Barrett
        # reciprocals floor(2^64/q_i) for tile reduction
        # (config.use_shoup_moddown; same values mod q as PiRs).
        self.PiWs = []
        self.bp_sp = []
        for level in range(self.num_levels):
            q_lvl = ctx.q[level:]
            C_sp = len(q_lvl)
            W_sp = self.ntt.padded_channels(level, -2)
            n_ord = C_sp - self.num_special
            per_level = []
            per_level_sh = []
            q_pad = list(q_lvl) + [q_lvl[-1]] * (W_sp - C_sp)
            for P_ind, Pj in enumerate(P):
                live = C_sp - P_ind - 1
                vals = [(pow(Pj, -1, mi) * R) % mi for mi in q_lvl[:live]]
                vals += [R % mi for mi in q_lvl[live:]]
                # Padded rows ride the identity of the repeated last prime.
                vals += [R % q_lvl[-1]] * (W_sp - C_sp)
                per_level.append(jnp.asarray(_pack_list(vals)))
                ws = [pow(Pj, -1, mi) for mi in q_lvl[:live]]
                ws += [1] * (W_sp - live)
                per_level_sh.append(_shoup_pack(ws, q_pad))
            self.PiRs.append(per_level)
            self.PiWs.append(tuple(per_level_sh))
            # (bp, off0): Barrett reciprocal + the offset correction
            # 2q - (2^63 mod q) for reducing wrapped-signed u64 values
            # (extend_shoup's first term; see config.use_shoup_extend).
            self.bp_sp.append((
                _barrett_pack(q_pad),
                jnp.asarray(_pack_list(
                    [2 * q - ((1 << 63) % q) for q in q_pad]))))
            # "Enter Montgomery on ordinary rows only": x R^2 on ordinary,
            # identity (x R) on special rows.
            vals = [Rs for Rs in ctx.R_square[level:level + n_ord]]
            vals += [R % mi for mi in q_lvl[n_ord:]]
            vals += [R % q_lvl[-1]] * (W_sp - C_sp)
            self.enter_ord.append(jnp.asarray(_pack_list(vals)))

        # Montgomery identity scalars (R mod q): montmul(x, R) == x mod q.
        # Used to canonicalize wrapped-negative basis-extension outputs into
        # [0, 2q) so the hot NTT/mult kernels run the unsigned fast path.
        self.mont_identity = []
        for level in range(self.num_levels):
            q_lvl = ctx.q[level:]
            W_sp = self.ntt.padded_channels(level, -2)
            vals = [ctx.R % mi for mi in q_lvl]
            vals += [ctx.R % q_lvl[-1]] * (W_sp - len(q_lvl))
            self.mont_identity.append(jnp.asarray(_pack_list(vals)))

    def _create_rescale_scales(self):
        """q_l^{-1}*R mod q_i for the channels that survive the rescale at
        each level (reference: ckks_engine.py:123-146)."""
        ctx = self.ctx
        self.rescale_scales = []
        # Shoup-form tables (config.use_shoup_rescale): plain q_l^{-1}
        # with Shoup quotients, plus Barrett reciprocals of the surviving
        # channels for reducing the dropped-channel broadcast.
        self.rescale_sh = []
        self.bp_ord = []
        for level in range(self.num_levels):
            m0 = ctx.q[level]
            m = ctx.q[level + 1:self.num_ordinary]
            vals = [(pow(m0, -1, mi) * ctx.R) % mi for mi in m]
            pad = (self.ntt.padded_channels(level + 1, -1)
                   if level + 1 < self.num_levels else None)
            self.rescale_scales.append(jnp.asarray(_pack_list(
                vals, pad_to=pad)))
            if m:
                W = pad if pad is not None else len(m)
                m_pad = list(m) + [m[-1]] * (W - len(m))
                self.rescale_sh.append(_shoup_pack(
                    [pow(m0, -1, mi) for mi in m_pad], m_pad))
                self.bp_ord.append(_barrett_pack(m_pad))
            else:
                self.rescale_sh.append(None)
                self.bp_ord.append(None)

    # -- pack helpers ----------------------------------------------------------

    def pack(self, level: int, mult_type: int = -1) -> LevelPack:
        return self.ntt.level_pack(level, mult_type)

    def _rns_sharding(self, ndim: int):
        from jax.sharding import NamedSharding, PartitionSpec as P
        ax = (self.mesh_axis
              if self.mesh_axis in self.mesh.axis_names else None)
        spec = P(*([None] * (ndim - 2)), ax, self.coef_axis)
        return NamedSharding(self.mesh, spec)

    def _shard_ds(self, ds):
        """Constrain a DataStruct's polys to the channel-sharded layout.

        A no-op without a mesh, and a no-copy when GSPMD already produced
        the right sharding; used at DataStruct creation points so data at
        rest is always evenly channel-sharded (padded widths guarantee
        divisibility)."""
        if self.mesh is None:
            return ds
        return jax.tree_util.tree_map(
            lambda x: (jax.device_put(x, self._rns_sharding(x.ndim))
                       if hasattr(x, "ndim") and x.ndim >= 3 else x), ds)

    # -- example generation (reference: ckks_engine.py:269-296) -----------------

    def absmax_error(self, x, y):
        x = np.asarray(x)
        y = np.asarray(y)
        if np.iscomplexobj(x) and np.iscomplexobj(y):
            return (np.abs(x.real - y.real).max()
                    + np.abs(x.imag - y.imag).max() * 1j)
        return np.abs(x - y).max()

    def integral_bits_available(self):
        max_bits = math.floor(math.log2(self.base_prime))
        return max_bits - self.ctx.scale_bits

    def example(self, amin=None, amax=None, decimal_places: int = 10):
        if amin is None:
            amin = -(2 ** self.integral_bits_available())
        if amax is None:
            amax = 2 ** self.integral_bits_available()
        base = 10 ** decimal_places
        a = np.random.randint(amin * base, amax * base, self.num_slots) / base
        b = np.random.randint(amin * base, amax * base, self.num_slots) / base
        return a + b * 1j

    # -- encode / decode --------------------------------------------------------

    def padding(self, m):
        m = np.atleast_1d(np.asarray(m))
        return np.pad(m, (0, self.num_slots - len(m)))

    def encode(self, m, level: int = 0, padding=True) -> jnp.ndarray:
        """Complex message -> packed plaintext polynomial [2, 1, N]."""
        if padding:
            m = self.padding(m)
        encoded = encdec.encode(m, rng=self.rng, scale=self.scale,
                                deviation=self.deviations[level],
                                norm=self.norm)
        return jnp.asarray(u64.from_int64_np(encoded[None, :]))

    def decode(self, m, level=0, is_real: bool = False):
        """Packed signed plaintext [2, 1, N] -> complex message (N/2 slots)."""
        poly = u64.to_int64_np(np.asarray(m))[0]
        decoded = encdec.decode(poly, scale=self.scale,
                                correction=self.corrections[level],
                                norm=self.norm)[:self.num_slots]
        return decoded.real if is_real else decoded

    # -- key generation ----------------------------------------------------------

    def create_secret_key(self, include_special: bool = True) -> DataStruct:
        """Uniform ternary secret in the NTT+Montgomery domain
        (reference: ckks_engine.py:351-367)."""
        ternary = self.rng.randint(amax=3, shift=-1, repeats=1)
        mult_type = -2 if include_special else -1
        sk = _sk_core(ternary, self.pack(0, mult_type))
        return self._shard_ds(DataStruct(sk, include_special, True, True,
                                         types.origins["sk"], 0, self.hash))

    def create_public_key(self, sk: DataStruct, include_special: bool = False,
                          a=None, crs=None) -> DataStruct:
        """pk = (e - a*s, a) (reference: ckks_engine.py:370-411)."""
        if sk.origin != types.origins["sk"]:
            raise errors.NotMatchType(origin=sk.origin, to=types.origins["sk"])
        if include_special and not sk.include_special:
            raise errors.SecretKeyNotIncludeSpecialPrime()
        mult_type = -2 if include_special else -1
        pack = self.pack(0, mult_type)

        e = self.rng.discrete_gaussian(repeats=1)
        if a is None:
            a = crs
        if a is None:
            repeats = self.num_special if include_special else 0
            q = self.ntt.q_ints(0, mult_type)
            a = self.rng.randint(amax=q, repeats=repeats)

        pk0, a_fit = _pk_core(e, a, sk.data, pack)
        return self._shard_ds(
            DataStruct((pk0, a_fit), include_special, True, True,
                       types.origins["pk"], 0, self.hash))

    # -- encrypt / decrypt --------------------------------------------------------

    def encrypt(self, pt, pk: DataStruct, level: int = 0) -> DataStruct:
        if pk.origin != types.origins["pk"]:
            raise errors.NotMatchType(origin=pk.origin, to=types.origins["pk"])
        mult_type = -2 if pk.include_special else -1
        pack = self.pack(level, mult_type)
        W = self.ntt.padded_channels(level, mult_type)

        e0e1 = self.rng.discrete_gaussian(repeats=2)
        e0, e1 = e0e1[:, 0:1], e0e1[:, 1:2]
        v = self.rng.randint(amax=2, shift=0, repeats=1)

        dc = jnp.zeros((2, W), dtype=jnp.uint32)
        ct0, ct1 = _encrypt_core(pt, dc, e0, e1, v, pk.data[0], pk.data[1],
                                 level, pack)
        return self._shard_ds(
            DataStruct((ct0, ct1), mult_type == -2, False, False,
                       types.origins["ct"], level, self.hash))

    def _decrypt_pt(self, ct: DataStruct, sk: DataStruct):
        """Raw decryption to the plaintext RNS poly (no final rescale)."""
        level = ct.level
        pack = self.pack(level, -1)
        if ct.origin == types.origins["ct"]:
            if ct.ntt_state or ct.montgomery_state:
                raise errors.NotMatchDataStructState(origin=ct.origin)
            return _decrypt_double_pt(ct.data[0], ct.data[1], sk.data,
                                      level, pack)
        if ct.origin == types.origins["ctt"]:
            if not ct.ntt_state or not ct.montgomery_state:
                raise errors.NotMatchDataStructState(origin=ct.origin)
            return _decrypt_triplet_pt(ct.data[0], ct.data[1], ct.data[2],
                                       sk.data, level, pack)
        raise errors.NotMatchType(origin=ct.origin, to="ct or ctt")

    def _final_rescale_signed(self, pt, level, final_round=True):
        base_at = self.num_ordinary - 1 - level
        scaled = _final_rescale(pt, self.base_pack, self.final_scalar[level],
                                self.round_halves[level] if final_round
                                else jnp.asarray(
                                    _pack_scalar((1 << 63) - 1)[:, 0]),
                                base_at)
        return scaled

    def decrypt_double(self, ct: DataStruct, sk: DataStruct, final_round=True):
        """Reference-compatible alias (reference: ckks_engine.py:535)."""
        if ct.origin != types.origins["ct"]:
            raise errors.NotMatchType(origin=ct.origin, to=types.origins["ct"])
        return self.decrypt(ct, sk, final_round=final_round)

    def decrypt_triplet(self, ct_mult: DataStruct, sk: DataStruct,
                        final_round=True):
        """Reference-compatible alias (reference: ckks_engine.py:482)."""
        if ct_mult.origin != types.origins["ctt"]:
            raise errors.NotMatchType(origin=ct_mult.origin,
                                      to=types.origins["ctt"])
        return self.decrypt(ct_mult, sk, final_round=final_round)

    def decrypt(self, ct: DataStruct, sk: DataStruct, final_round=True):
        """Decrypt to the signed base-prime plaintext poly [2, 1, N]
        (reference: ckks_engine.py:579-595)."""
        if sk.origin != types.origins["sk"]:
            raise errors.NotMatchType(origin=sk.origin, to=types.origins["sk"])
        if not sk.ntt_state or not sk.montgomery_state:
            raise errors.NotMatchDataStructState(origin=sk.origin)
        pt = self._decrypt_pt(ct, sk)
        return self._final_rescale_signed(pt, ct.level, final_round)

    # -- fused encode+encrypt / decrypt+decode (reference: :1472-1688) -----------

    def encodecrypt(self, m, pk: DataStruct, level: int = 0,
                    padding=True) -> DataStruct:
        if pk.origin != types.origins["pk"]:
            raise errors.NotMatchType(origin=pk.origin, to=types.origins["pk"])
        if padding:
            m = self.padding(m)
        mult_type = -2 if pk.include_special else -1
        pack = self.pack(level, mult_type)
        W = self.ntt.padded_channels(level, mult_type)
        q_lvl = self.ntt.q_ints(level, mult_type)

        pt = encdec.encode(m, rng=self.rng, scale=self.scale,
                           deviation=self.deviations[level], norm=self.norm,
                           return_without_scaling=self.bias_guard)
        dc = jnp.zeros((2, W), dtype=jnp.uint32)
        if self.bias_guard:
            # Split the integral DC part into RNS to dodge single-channel
            # overflow (reference: ckks_engine.py:1485-1499).
            dc_integral = float(np.floor(pt[0]))
            pt = pt.copy()
            pt[0] -= dc_integral
            dc_scale = int(dc_integral) * self.int_scale
            dc = jnp.asarray(_pack_list([dc_scale % qi for qi in q_lvl],
                                        pad_to=W, pad_value=0))
            pt = self.rng.randround(pt * self.scale)
        pt = jnp.asarray(u64.from_int64_np(pt[None, :]))

        e0e1 = self.rng.discrete_gaussian(repeats=2)
        e0, e1 = e0e1[:, 0:1], e0e1[:, 1:2]
        v = self.rng.randint(amax=2, shift=0, repeats=1)

        ct0, ct1 = _encrypt_core(pt, dc, e0, e1, v, pk.data[0], pk.data[1],
                                 level, pack)
        return self._shard_ds(
            DataStruct((ct0, ct1), mult_type == -2, False, False,
                       types.origins["ct"], level, self.hash))

    def decryptcode(self, ct: DataStruct, sk: DataStruct, is_real=False,
                    final_round=True):
        if not sk.ntt_state or not sk.montgomery_state:
            raise errors.NotMatchDataStructState(origin=sk.origin)
        level = ct.level
        pt = self._decrypt_pt(ct, sk)
        C = self.ntt.num_channels(level, -1)
        base_at = self.num_ordinary - 1 - level

        dc = 0
        if (C >= 3) and self.bias_guard:
            # 3-prime CRT reconstruction of the DC coefficient
            # (reference: ckks_engine.py:1616-1646).
            pt_np = u64.to_int64_np(np.asarray(pt))
            dc0 = int(pt_np[base_at, 0])
            dc1 = int(pt_np[0, 0])
            dc2 = int(pt_np[1, 0])
            pt = pt.at[:, base_at, 0].set(0).at[:, 0, 0].set(0)

            q_lvl = self.ntt.q_ints(level, -1)
            q0, q1, q2 = q_lvl[base_at], q_lvl[0], q_lvl[1]
            Q = q0 * q1 * q2
            Q0, Q1, Q2 = q1 * q2, q0 * q2, q0 * q1
            dc_crt = (dc0 * pow(Q0, -1, q0) * Q0
                      + dc1 * pow(Q1, -1, q1) * Q1
                      + dc2 * pow(Q2, -1, q2) * Q2) % Q
            if dc_crt > Q // 2:
                dc_crt -= Q
            dc = (dc_crt + (q1 - 1)) // q1

        scaled = self._final_rescale_signed(pt, level, final_round)

        correction = self.corrections[level]
        poly = u64.to_int64_np(np.asarray(scaled))[0]
        decoded = encdec.decode(poly, scale=self.scale, correction=correction,
                                norm=self.norm,
                                return_without_scaling=self.bias_guard)
        decoded = decoded[:self.num_slots]
        if self.bias_guard:
            decoded = decoded / self.scale * correction
            decoded = decoded + dc / self.scale * correction
        return decoded.real if is_real else decoded

    # Shortcuts (reference: ckks_engine.py:1684-1688).
    def encorypt(self, m, pk, level: int = 0, padding=True):
        return self.encodecrypt(m, pk, level=level, padding=padding)

    def decrode(self, ct, sk, is_real=False, final_round=True):
        return self.decryptcode(ct, sk, is_real=is_real,
                                final_round=final_round)

    # -- add / sub (reference: ckks_engine.py:1268-1405) -------------------------

    def cc_add_double(self, a: DataStruct, b: DataStruct) -> DataStruct:
        if a.ntt_state or a.montgomery_state:
            raise errors.NotMatchDataStructState(origin=a.origin)
        if b.ntt_state or b.montgomery_state:
            raise errors.NotMatchDataStructState(origin=b.origin)
        if a.level != b.level:
            raise errors.NotSameLevelError(a=a.level, b=b.level)
        pack = self.pack(a.level, -1)
        c0, c1 = _add_core(a.data[0], a.data[1], b.data[0], b.data[1], pack)
        return DataStruct((c0, c1), False, False, False,
                          types.origins["ct"], a.level, self.hash)

    def cc_add_triplet(self, a: DataStruct, b: DataStruct) -> DataStruct:
        if a.level != b.level:
            raise errors.NotSameLevelError(a=a.level, b=b.level)
        pack = self.pack(a.level, -1)
        c0, c1 = _add_core(a.data[0], a.data[1], b.data[0], b.data[1], pack)
        c2 = ops.reduce_2q(ops.mont_add(a.data[2], b.data[2], pack), pack)
        return DataStruct((c0, c1, c2), False, True, True,
                          types.origins["ctt"], a.level, self.hash)

    def cc_add(self, a: DataStruct, b: DataStruct) -> DataStruct:
        if a.origin == types.origins["ct"] and b.origin == types.origins["ct"]:
            return self.cc_add_double(a, b)
        if (a.origin == types.origins["ctt"]
                and b.origin == types.origins["ctt"]):
            return self.cc_add_triplet(a, b)
        raise errors.DifferentTypeError(a=a.origin, b=b.origin)

    def cc_sub_double(self, a: DataStruct, b: DataStruct) -> DataStruct:
        if a.ntt_state or a.montgomery_state:
            raise errors.NotMatchDataStructState(origin=a.origin)
        if b.ntt_state or b.montgomery_state:
            raise errors.NotMatchDataStructState(origin=b.origin)
        if a.level != b.level:
            raise errors.NotSameLevelError(a=a.level, b=b.level)
        pack = self.pack(a.level, -1)
        c0, c1 = _sub_core(a.data[0], a.data[1], b.data[0], b.data[1], pack)
        return DataStruct((c0, c1), False, False, False,
                          types.origins["ct"], a.level, self.hash)

    def cc_sub_triplet(self, a: DataStruct, b: DataStruct) -> DataStruct:
        if a.level != b.level:
            raise errors.NotSameLevelError(a=a.level, b=b.level)
        pack = self.pack(a.level, -1)
        c0, c1 = _sub_core(a.data[0], a.data[1], b.data[0], b.data[1], pack)
        c2 = ops.reduce_2q(ops.mont_sub(a.data[2], b.data[2], pack), pack)
        return DataStruct((c0, c1, c2), False, True, True,
                          types.origins["ctt"], a.level, self.hash)

    def cc_sub(self, a: DataStruct, b: DataStruct) -> DataStruct:
        if a.origin != b.origin:
            raise errors.DifferentTypeError(a=a.origin, b=b.origin)
        if a.origin == types.origins["ct"]:
            return self.cc_sub_double(a, b)
        if a.origin == types.origins["ctt"]:
            return self.cc_sub_triplet(a, b)
        raise errors.NotMatchType(origin=a.origin, to="ct or ctt")

    cc_subtract = cc_sub

    # -- key switching (reference: ckks_engine.py:601-961) ------------------------

    def create_key_switching_key(self, sk_from: DataStruct, sk_to: DataStruct,
                                 a=None) -> DataStruct:
        """Hybrid gadget-decomposed ksk: one public-key pair per partition,
        with P*sk_from added on that partition's channel block
        (reference: ckks_engine.py:601-652)."""
        if (sk_from.origin != types.origins["sk"]
                or sk_to.origin != types.origins["sk"]):
            raise errors.NotMatchType(origin="not a secret key",
                                      to=types.origins["sk"])
        if not sk_from.ntt_state or not sk_from.montgomery_state:
            raise errors.NotMatchDataStructState(origin=sk_from.origin)

        pack_ord = self.pack(0, -1)
        W_ord = self.ntt.padded_channels(0, -1)
        # Signed: a rotated sk_from may hold wrapped-negative coefficients.
        Psk = ops.mont_enter_scalar(ops.fit_channels(sk_from.data, W_ord),
                                    self.mont_PR, pack_ord, signed=True)

        parts = self.ntt.parts(0)
        ksk = []
        for part in parts:
            crs = a[part.part_id] if a is not None else None
            pk = self.create_public_key(sk_to, include_special=True, a=crs)
            lo, hi = part.prime_idx[0], part.prime_idx[-1] + 1
            upd = ops.mont_add(pk.data[0][:, lo:hi], Psk[:, lo:hi], part.pack)
            pk0 = pk.data[0].at[:, lo:hi].set(upd)
            pk = pk._replace(
                data=(pk0, pk.data[1]),
                origin=f"key switch key part index {part.part_id}")
            ksk.append(pk)

        return self._shard_ds(DataStruct(ksk, True, True, True,
                                         types.origins["ksk"], 0, self.hash))

    def _mxu_fused_switch(self) -> bool:
        """Whether _switcher_fn will take the fused MXU switch branch
        (must mirror its trace-time ``mxu_fused`` condition exactly:
        the ksk stack shape depends on it)."""
        return (self.mesh is None and config.use_shoup_extend
                and config.use_mxu_pallas and config.pallas_enabled()
                and self.pack(0, -2).mxu is not None)

    def _ksk_stacked(self, ksk: DataStruct):
        """Pre-stacked full-width key halves [2, P_full, C0_sp, N] x 2.

        Stacking once per key (instead of per switch inside the trace)
        removes the largest per-switch HBM copy (~2x the ksk size). Small
        LRU keyed by DataStruct identity: entries are device copies, so
        the cache is bounded (16 keys) rather than per-(key, level)
        unbounded like the round-1 slice cache."""
        if ksk in self._ksk_stacked_cache:
            self._ksk_stacked_cache.move_to_end(ksk)
            return self._ksk_stacked_cache[ksk]
        k0 = jnp.stack([part.data[0] for part in ksk.data], axis=1)
        k1 = jnp.stack([part.data[1] for part in ksk.data], axis=1)
        if self.mesh is not None:
            k0 = jax.device_put(k0, self._rns_sharding(k0.ndim))
            k1 = jax.device_put(k1, self._rns_sharding(k1.ndim))
        elif self._mxu_fused_switch():
            # Materialize ONCE in the fused MXU switch kernel's 5-D
            # [2, P, C0, R, S] block view: the in-trace reshape from the
            # flat stack re-laid the ksk out on EVERY switch
            # (round-5 profile: 2 x ~0.58 ms reshape + copies per 6
            # mults). The kernel consumes this form directly.
            S = 1 << ((self.ctx.logN + 1) // 2)
            R = self.ctx.N // S

            def tile5(t):
                return t.reshape(2, t.shape[1], t.shape[2], R, S)

            if config.use_shoup_ksk:
                # Shoup form: plain values + precomputed quotients, so
                # the kernel's two ksk products skip the Montgomery
                # REDC (config.use_shoup_ksk). One-time device long
                # division per key (u64.shoup_quotient).
                pack0 = self.pack(0, -2)
                qp = u64.shr((pack0.q2[0][:, None],
                              pack0.q2[1][:, None]), 1)

                @jax.jit
                def shoup(k):
                    w = ops.reduce_2q(ops.mont_redc(k, pack0), pack0)
                    wp = u64.shoup_quotient((w[0], w[1]), qp)
                    return (tile5(w), tile5(u64.pack(*wp)))

                k0 = shoup(k0)
                k1 = shoup(k1)
            else:
                k0 = jnp.asarray(tile5(k0))
                k1 = jnp.asarray(tile5(k1))
        self._ksk_stacked_cache[ksk] = (k0, k1)
        if len(self._ksk_stacked_cache) > 16:
            self._ksk_stacked_cache.popitem(last=False)
        return self._ksk_stacked_cache[ksk]

    def _switcher_fn(self, level: int, exit_ntt: bool):
        """Build (and cache) the jitted key-switch core for one level.

        Fuses the reference's 7-step multi-device orchestration
        (reference: ckks_engine.py:746-904) into one jitted program: basis
        extension per gadget part, NTT, ksk multiply, cross-part
        accumulation, and the special-prime mod-down. On a sharded mesh the
        per-part accumulation becomes a psum (see liberate_tpu.parallel).
        """
        key = (level, exit_ntt)
        if key in self._switcher_cache:
            return self._switcher_cache[key]

        parts_meta = tuple((p.local_start, p.alpha)
                           for p in self.ntt.parts(level))
        n_sp = self.num_special
        n_ord = self.ntt.num_channels(level, -1)
        C_sp = self.ntt.num_channels(level, -2)
        # Padded widths (multi-chip layout; == real counts on one chip).
        W_sp = self.ntt.padded_channels(level, -2)
        W_ord = self.ntt.padded_channels(level, -1)
        lvl = level

        def pre_extend(a, start, alpha, part_pack, plan):
            """Divided-difference state (reference: ckks_engine.py:654-705)."""
            a_part = a[:, start:start + alpha]
            if exit_ntt:
                a_part = ops.intt_exit_reduce(a_part, part_pack)
            Y_scalar, L_scalar, _ = plan
            state = [a_part[:, 0:1]] * alpha
            for i in range(alpha - 1):
                row = a_part[:, i + 1:i + 2]
                diff = u64.sub((row[0], row[1]),
                               (state[i + 1][0], state[i + 1][1]))
                Y = u64.pack(*diff)
                ch_pack = ops.pack_slice(part_pack, i + 1, i + 2)
                Y = ops.mont_enter_scalar(Y, Y_scalar[:, i:i + 1], ch_pack,
                                          signed=True)
                state[i + 1] = Y
                if i + 2 < alpha:
                    tail_pack = ops.pack_slice(part_pack, i + 2, alpha)
                    Yt = jnp.broadcast_to(Y, (2, alpha - i - 2, Y.shape[2]))
                    new = ops.mont_enter_scalar(Yt, L_scalar[i], tail_pack,
                                                signed=True)
                    for j in range(i + 2, alpha):
                        srow = new[:, j - i - 2:j - i - 1]
                        s = u64.add((state[j][0], state[j][1]),
                                    (srow[0], srow[1]))
                        state[j] = u64.pack(*s)
            return state

        def extend(state, plan, pack_sp):
            """Basis-extend a part's state onto the full with-special layout
            (reference: ckks_engine.py:707-743)."""
            _, _, L_enter = plan
            N = state[0].shape[2]
            ext = jnp.broadcast_to(state[0], (2, W_sp, N))
            ext = ops.mont_enter(ext, pack_sp, signed=True)
            for i in range(len(state) - 1):
                Y = jnp.broadcast_to(state[i + 1], (2, W_sp, N))
                le = L_enter[i][:, lvl:lvl + W_sp]
                Y = ops.mont_enter_scalar(Y, le, pack_sp, signed=True)
                ext = ops.mont_add(ext, Y, pack_sp)
            return ext

        def pre_extend_tiled(a, start, alpha, part_pack, plan):
            """pre_extend on the [C, N/128, 128] pair view — identical op
            chain (bit-exact); the single-channel rows get full 8-sublane
            tiles instead of T(1,128) (see config.use_tiled_extend).
            Leading batch dims supported (a [2, B, C, N] — the batched
            mult): the channel axis stays at -3 of the tiled view."""
            a_part = a[..., start:start + alpha, :]
            if exit_ntt:
                a_part = ops.intt_exit_reduce(a_part, part_pack)
            N = a_part.shape[-1]
            R = N // 128
            lead = a_part.shape[1:-2]
            v = (a_part[0].reshape(lead + (alpha, R, 128)),
                 a_part[1].reshape(lead + (alpha, R, 128)))
            Y_scalar, L_scalar, _ = plan

            def row_of(t, lo, hi):
                return t[..., lo:hi, :, :]

            def cons(lo, hi):
                return (part_pack.ql[lo:hi, None, None],
                        part_pack.qh[lo:hi, None, None],
                        part_pack.kl[lo:hi, None, None],
                        part_pack.kh[lo:hi, None, None])

            def scal(s):            # packed [2, k] -> pair [k, 1, 1]
                return (s[0][:, None, None], s[1][:, None, None])

            state = [(row_of(v[0], 0, 1), row_of(v[1], 0, 1))] * alpha
            for i in range(alpha - 1):
                row = (row_of(v[0], i + 1, i + 2),
                       row_of(v[1], i + 1, i + 2))
                diff = u64.sub(row, state[i + 1])
                Y = u64.montmul_signed(diff, scal(Y_scalar[:, i:i + 1]),
                                       *cons(i + 1, i + 2))
                state[i + 1] = Y
                if i + 2 < alpha:
                    tshape = lead + (alpha - i - 2, R, 128)
                    Yt = (jnp.broadcast_to(Y[0], tshape),
                          jnp.broadcast_to(Y[1], tshape))
                    new = u64.montmul_signed(Yt, scal(L_scalar[i]),
                                             *cons(i + 2, alpha))
                    for j in range(i + 2, alpha):
                        srow = (row_of(new[0], j - i - 2, j - i - 1),
                                row_of(new[1], j - i - 2, j - i - 1))
                        state[j] = u64.add(state[j], srow)
            return state, R

        def extend_tiled(state, plan, pack_sp, R):
            """extend on the [W_sp, N/128, 128] pair view (bit-exact with
            extend; returns a packed [2, W_sp, N] array)."""
            _, _, L_enter = plan
            ql = pack_sp.ql[:, None, None]
            qh = pack_sp.qh[:, None, None]
            kl = pack_sp.kl[:, None, None]
            kh = pack_sp.kh[:, None, None]
            q2 = (pack_sp.q2[0][:, None, None],
                  pack_sp.q2[1][:, None, None])
            Rs = (pack_sp.Rs[0][:, None, None],
                  pack_sp.Rs[1][:, None, None])
            ext = (jnp.broadcast_to(state[0][0], (W_sp, R, 128)),
                   jnp.broadcast_to(state[0][1], (W_sp, R, 128)))
            ext = u64.montmul_signed(ext, Rs, ql, qh, kl, kh)
            for i in range(len(state) - 1):
                Y = (jnp.broadcast_to(state[i + 1][0], (W_sp, R, 128)),
                     jnp.broadcast_to(state[i + 1][1], (W_sp, R, 128)))
                le = L_enter[i][:, lvl:lvl + W_sp]
                Y = u64.montmul_signed(
                    Y, (le[0][:, None, None], le[1][:, None, None]),
                    ql, qh, kl, kh)
                s = u64.add(ext, Y)                      # mont_add
                over = ~u64.lt_signed(s, q2)
                ext = u64.select(over, u64.sub(s, q2), s)
            return u64.pack(ext[0].reshape(W_sp, -1),
                            ext[1].reshape(W_sp, -1))

        def extend_shoup(state, le_sh, pack_sp, R, bp_off, flat=True):
            """Basis extension in the plain domain
            (config.use_shoup_extend): emits unsigned [0, 2q), so the
            switch NTT kernels skip the canon + identity-multiply
            pre-stage and the post-accumulation iNTT exits to a plain
            reduce. EVERY term may be wrapped-signed (a rotated ct's
            permutation negates coefficients), so each is offset by
            +2^63 before the Barrett/Shoup reduction and corrected with
            a per-channel constant (2q - (2^63 [* L_i] mod q)); the
            offset keeps the operand a valid u64 for any |state| < 2^63.
            Same values mod q as ``extend`` (tests/test_shoup_chains.py).
            """
            bp, off0 = bp_off

            def col(s):
                return (s[0][:, None, None], s[1][:, None, None])

            q2 = col(pack_sp.q2)
            q = u64.shr(q2, 1)

            def csub(x):             # [0, 4q) -> [0, 2q)
                over = ~u64.lt_unsigned(x, q2)
                return u64.select(over, u64.sub(x, q2), x)

            HI = np.uint32(0x80000000)
            t = (jnp.broadcast_to(state[0][0], (W_sp, R, 128)),
                 jnp.broadcast_to(state[0][1] + HI, (W_sp, R, 128)))
            acc = csub(u64.add(u64.barrett_2q(t, col(bp), q), col(off0)))
            for i in range(len(state) - 1):
                w, wp, cadj = le_sh[i]
                w = w[:, lvl:lvl + W_sp]
                wp = wp[:, lvl:lvl + W_sp]
                cadj = cadj[:, lvl:lvl + W_sp]
                u = (jnp.broadcast_to(state[i + 1][0], (W_sp, R, 128)),
                     jnp.broadcast_to(state[i + 1][1] + HI,
                                      (W_sp, R, 128)))
                e = u64.shoup_mul(u, col(w), col(wp), q)
                e = csub(u64.add(e, col(cadj)))
                acc = csub(u64.add(acc, e))
            if not flat:
                # Keep the [W_sp, N/128, 128] tiled view: the fused MXU
                # switch consumes exactly this element order (its [S, R]
                # block view), and flattening to [W_sp, N] between
                # producer and kernel makes XLA emit the whole extension
                # in degenerate T(1,128) layout + a fix-up copy (round-5
                # profile: ~1.9 ms/mult of 7.4 across the 7 extension
                # fusions).
                return u64.pack(acc[0], acc[1])
            return u64.pack(acc[0].reshape(W_sp, -1),
                            acc[1].reshape(W_sp, -1))

        def mod_down(d, pack_sp, pack_ord, PiRs, enter_ord,
                     PiWs=None, bp=None):
            if config.use_shoup_moddown and PiWs is not None:
                # >=4-D inputs are the fused MXU switch's tiled outputs
                # ([2, (B,) W_sp, S, R]); flat inputs are 3-D.
                return _mod_down_shoup(d, pack_sp, pack_ord, tuple(PiWs),
                                       bp[0], n_sp, C_sp, W_sp, W_ord,
                                       tiled=d.ndim >= 4)
            return mod_down_mont(d, pack_sp, pack_ord, PiRs, enter_ord)

        def mod_down_mont(d, pack_sp, pack_ord, PiRs, enter_ord):
            """Divide by P = prod(special primes), one special prime at a
            time (reference: ckks_engine.py:846-901). Invariant: ordinary
            rows ride in Montgomery form, special rows in plain form, so the
            single PiR multiply advances both. Full channel width is kept
            throughout (dead rows multiply by the Montgomery identity) —
            static shapes, no slice/concat chains.

            The optimization_barrier between iterations is load-bearing:
            each iteration consumes ``d`` twice (the dropped channel's tile
            AND the full array), and XLA's fusion otherwise duplicates the
            whole upstream chain into both consumers — exponential compile
            time in the number of special primes."""
            if config.use_tiled_moddown:
                return _mod_down_tiled(d, pack_sp, pack_ord, tuple(PiRs),
                                       enter_ord, n_sp, C_sp, W_sp, W_ord)
            d = ops.mont_enter_scalar(d, enter_ord, pack_sp, signed=True)
            for P_ind in range(n_sp):
                d = jax.lax.optimization_barrier(d)
                cur = C_sp - P_ind
                tile = jnp.broadcast_to(d[:, cur - 1:cur],
                                        (2, W_sp, d.shape[2]))
                tile = ops.mont_enter_scalar(tile, enter_ord, pack_sp,
                                             signed=True)
                d = ops.mont_sub(d, tile, pack_sp)
                d = ops.mont_enter_scalar(d, PiRs[P_ind], pack_sp,
                                          signed=True)
                d = ops.reduce_2q(d, pack_sp)
            d = jax.lax.optimization_barrier(d)
            d = ops.mont_redc_signed(d[:, :W_ord], pack_ord)
            return ops.reduce_2q(d, pack_ord)

        part_off = self.ntt.parts(level)[0].part_id
        single_chip = self.mesh is None

        def fn(a, k0st, k1st, plans, part_packs, pack_sp, pack_ord, PiRs,
               enter_ord, ident_sp, PiWs, bp_sp, plans_sh):
            # Batch every gadget part through ONE NTT and one pair of ksk
            # multiplies on a [2, P, C_sp, N] array — the TPU-native answer
            # to the reference's per-(device, part) kernel launches
            # (reference: ckks_engine.py:788-829): bigger fused ops, and a
            # single psum over the part axis when sharded.
            # k0st/k1st are the PRE-STACKED full-width key halves
            # [2, P_full, C0_sp, N] (see _ksk_stacked); the active-part
            # suffix + level slice happen in-trace (or, on the fused
            # Pallas path, via block indexing with zero copies).
            # With config.use_shoup_extend the basis extension emits
            # PLAIN-domain unsigned [0, 2q) values: the kernels skip the
            # canon + identity-multiply pre-stage, and the accumulated
            # products exit via a plain reduce instead of a Montgomery
            # exit (the ksk halves carry one R factor, the extension
            # none — the product is plain after the NTT-domain multiply).
            # The MXU backend additionally REQUIRES plain unsigned inputs
            # for its fused switch (digits read the u64 bits).
            shoup_ext = (config.use_shoup_extend
                         and pack_sp.coef is None)
            mxu_fused = (shoup_ext and pack_sp.mxu is not None
                         and single_chip and config.use_mxu_pallas
                         and config.pallas_enabled())
            exts = []
            states = []
            for idx, (start, alpha) in enumerate(parts_meta):
                if mxu_fused:
                    # Raw divided-difference state only: the extension
                    # itself runs inside the switch kernel.
                    state, R = pre_extend_tiled(a, start, alpha,
                                                part_packs[idx], plans[idx])
                    states.append(state)
                elif shoup_ext:
                    state, R = pre_extend_tiled(a, start, alpha,
                                                part_packs[idx], plans[idx])
                    exts.append(extend_shoup(state, plans_sh[idx],
                                             pack_sp, R, bp_sp))
                elif config.use_tiled_extend:
                    state, R = pre_extend_tiled(a, start, alpha,
                                                part_packs[idx], plans[idx])
                    exts.append(extend_tiled(state, plans[idx], pack_sp, R))
                else:
                    state = pre_extend(a, start, alpha, part_packs[idx],
                                       plans[idx])
                    exts.append(extend(state, plans[idx], pack_sp))
            if not mxu_fused:
                ext = jnp.stack(exts, axis=1)      # [2, P, C_sp, N]

            plan = pack_sp.pallas
            if mxu_fused:
                # Fused MXU switch kernel with the EXTENSION folded in:
                # Shoup basis extension + transform + ksk multiplies +
                # part accumulation + the post-accumulation INVERSE
                # transform, all VMEM-resident (mxu_pallas), one kernel
                # per channel-width group. Inputs are the raw per-part
                # state rows ([2, P, A, N/128, 128], shared across
                # channels) plus tiny scalar tables; outputs are
                # [2, C, S, R] tiled plain coefficient-domain [0, q) —
                # fed straight into the tiled Shoup mod-down. No ext
                # materialization in HBM, no intt_reduce pair, no
                # layout round trips.
                from ..ntt import mxu_pallas

                A = max(alpha for _, alpha in parts_meta)
                batched = a.ndim == 4         # [2, B, C, N] ct-batch
                st_planes = []
                for plane in (0, 1):
                    rows = []
                    for s in states:
                        pad = [jnp.zeros_like(s[0][plane])] * (A - len(s))
                        rows.append(jnp.concatenate(
                            [t[plane] for t in s] + pad, axis=-3))
                    st_planes.append(jnp.stack(rows, axis=-4))
                st = jnp.stack(st_planes)
                # [2, P, A, N/128, 128]; batched: [2, B, P, A, ., .] ->
                # [2, B*P, A, ., .] (b-major, part-fastest segments).
                if batched:
                    st = st.reshape((2, -1) + st.shape[3:])
                nterms = max(A - 1, 1)
                trows = []
                for idx2 in range(len(parts_meta)):
                    sh = plans_sh[idx2]
                    irows = []
                    for i in range(nterms):
                        if i < len(sh):
                            w, wp, cadj = sh[i]
                            irows.append(jnp.stack([
                                w[0, lvl:lvl + W_sp],
                                w[1, lvl:lvl + W_sp],
                                wp[0, lvl:lvl + W_sp],
                                wp[1, lvl:lvl + W_sp],
                                cadj[0, lvl:lvl + W_sp],
                                cadj[1, lvl:lvl + W_sp]]))
                        else:
                            irows.append(jnp.zeros((6, W_sp), jnp.uint32))
                    trows.append(jnp.stack(irows))
                terms = jnp.stack(trows)      # [P, nterms, 6, W_sp]
                # logN <= 15: at gold (S = R = 256) the md kernel's
                # scratch + src blocks push the live set 232 KB past the
                # 64 MiB scoped-VMEM cap; gold runs the separate Shoup
                # mod-down instead.
                md_ok = (config.use_shoup_moddown
                         and isinstance(k0st, tuple) and n_sp > 0
                         and self.ctx.logN <= 15)
                if md_ok:
                    # Fold the Shoup special-prime removal into the
                    # kernels too: the special-holding width group runs
                    # first, iterates + exports the dropped-channel
                    # rows, and every ordinary channel leaves its kernel
                    # FULLY mod-downed — no XLA mod-down fusions, no
                    # full-width d0/d1 round trip.
                    piw = jnp.stack(
                        [jnp.concatenate([w, wp], axis=0)
                         for (w, wp) in PiWs], axis=0)  # [n_sp, 4, W_sp]
                    d0, d1 = mxu_pallas.dispatch_ksk_from_state(
                        st, terms, bp_sp[1], k0st, k1st, pack_sp.mxu,
                        lvl, part_off, W_sp,
                        interpret=config.pallas_interpret,
                        parts=len(parts_meta) if batched else None,
                        moddown_piw=piw, n_sp=n_sp)
                    d0 = d0[:, :, :W_ord]
                    d1 = d1[:, :, :W_ord]
                    if not batched:
                        d0, d1 = d0[:, 0], d1[:, 0]
                    return (d0.reshape(d0.shape[:-2] + (-1,)),
                            d1.reshape(d1.shape[:-2] + (-1,)))
                d0, d1 = mxu_pallas.dispatch_ksk_from_state(
                    st, terms, bp_sp[1], k0st, k1st, pack_sp.mxu, lvl,
                    part_off, W_sp, interpret=config.pallas_interpret,
                    parts=len(parts_meta) if batched else None)
                if not config.use_shoup_moddown:
                    # the Montgomery mod-down takes flat arrays
                    d0 = d0.reshape(d0.shape[:-2] + (-1,))
                    d1 = d1.reshape(d1.shape[:-2] + (-1,))
            elif (config.use_fused_switch and plan is not None
                    and pallas_ntt.supports_fused_accum(plan)):
                # Fused kernel: [ident-canon +] NTT + both ksk multiplies
                # + part accumulation, outputs resident in VMEM across
                # the part loop.
                d0, d1 = pallas_ntt.ntt_ksk_accum(
                    ext, k0st, k1st, plan, ident_sp, lvl, part_off,
                    interpret=config.pallas_interpret,
                    canon=not shoup_ext)
            else:
                if not shoup_ext:
                    # Canonicalize the wrapped-negative divided-difference
                    # sums to [0, 2q) (one montmul by the identity R): the
                    # heavy NTT / pointwise ops below then run the
                    # unsigned fast path.
                    ext = ops.canon_2q(
                        ops.mont_enter_scalar(ext, ident_sp, pack_sp,
                                              signed=True),
                        pack_sp)
                ext = ops.ntt(ext, pack_sp)
                k0 = ops.fit_channels(k0st[:, part_off:, lvl:, :], W_sp)
                k1 = ops.fit_channels(k1st[:, part_off:, lvl:, :], W_sp)
                t0 = ops.mont_mult(ext, k0, pack_sp)
                t1 = ops.mont_mult(ext, k1, pack_sp)
                d0 = t0[:, 0]
                d1 = t1[:, 0]
                for p in range(1, len(parts_meta)):
                    d0 = ops.mont_add(d0, t0[:, p], pack_sp)
                    d1 = ops.mont_add(d1, t1[:, p], pack_sp)
            if mxu_fused:
                pass          # inverse + reduce folded into the kernel
            elif shoup_ext:
                d0 = ops.intt_reduce(d0, pack_sp)
                d1 = ops.intt_reduce(d1, pack_sp)
            else:
                d0 = ops.intt_exit_reduce(d0, pack_sp)
                d1 = ops.intt_exit_reduce(d1, pack_sp)
            return (mod_down(d0, pack_sp, pack_ord, PiRs, enter_ord,
                             PiWs, bp_sp),
                    mod_down(d1, pack_sp, pack_ord, PiRs, enter_ord,
                             PiWs, bp_sp))

        jitted = jax.jit(fn)
        self._switcher_cache[key] = jitted
        return jitted

    def create_switcher(self, a, ksk: DataStruct, level: int,
                        exit_ntt: bool = False):
        """Key-switch the polynomial ``a`` [2, C_ord, N]: returns (d0, d1)
        over the ordinary channels, in plain [0, q)."""
        parts = self.ntt.parts(level)
        plans = tuple((p.Y_scalar, p.L_scalar, p.L_enter) for p in parts)
        plans_sh = tuple(p.L_enter_sh for p in parts)
        part_packs = tuple(p.pack for p in parts)
        k0st, k1st = self._ksk_stacked(ksk)
        fn = self._switcher_fn(level, exit_ntt)
        return fn(a, k0st, k1st, plans, part_packs,
                  self.pack(level, -2), self.pack(level, -1),
                  tuple(self.PiRs[level]), self.enter_ord[level],
                  self.mont_identity[level], tuple(self.PiWs[level]),
                  self.bp_sp[level], plans_sh)

    def switch_key(self, ct: DataStruct, ksk: DataStruct) -> DataStruct:
        if ct.origin != types.origins["ct"]:
            raise errors.NotMatchType(origin=ct.origin, to=types.origins["ct"])
        level = ct.level
        d0, d1 = self.create_switcher(ct.data[1], ksk, level,
                                      exit_ntt=ct.ntt_state)
        pack = self.pack(level, -1)
        new_ct0 = ops.reduce_2q(ops.mont_add(ct.data[0], d0, pack), pack)
        return DataStruct((new_ct0, d1), ct.include_special, ct.ntt_state,
                          ct.montgomery_state, types.origins["ct"], level,
                          self.hash)

    # -- rescale / mult (reference: ckks_engine.py:967-1151) ----------------------

    def rescale(self, ct: DataStruct, exact_rounding=True) -> DataStruct:
        if ct.origin != types.origins["ct"]:
            raise errors.NotMatchType(origin=ct.origin, to=types.origins["ct"])
        level = ct.level
        next_level = level + 1
        if next_level >= self.num_levels:
            raise errors.MaximumLevelError(level=level,
                                           level_max=self.num_levels)
        pack_next = self.pack(next_level, -1)
        rh = self.round_halves[level] if exact_rounding else None
        core = self._rescale_core()
        rs = self._rescale_args(level)
        c0 = core(ct.data[0], rs, rh, pack_next)
        c1 = core(ct.data[1], rs, rh, pack_next)
        return DataStruct((c0, c1), False, False, False,
                          types.origins["ct"], next_level, self.hash)

    def create_evk(self, sk: DataStruct) -> DataStruct:
        if sk.origin != types.origins["sk"]:
            raise errors.NotMatchType(origin=sk.origin, to=types.origins["sk"])
        pack = self.pack(0, -2)
        sk2_data = ops.mont_mult(sk.data, sk.data, pack)
        sk2 = sk._replace(data=sk2_data)
        return self.create_key_switching_key(sk2, sk)

    def _mult_fused_fn(self, level: int):
        """One jitted program for the whole ct-ct multiply: rescale x4 +
        cc_mult + relin + key switch + rescale-add (reference's cc_mult ->
        relinearize chain, ckks_engine.py:1072-1151). Collapsing the ~6
        dispatches of the composed path into one program removes the
        per-dispatch tunnel latency that dominates the v5e hot loop, and
        gives XLA the whole dataflow to schedule."""
        key = ("mult_fused", level)
        if key in self._switcher_cache:
            return self._switcher_cache[key]
        switch = self._switcher_fn(level + 1, False)
        rescale_core = self._rescale_core()

        def fn(a0, a1, b0, b1, k0st, k1st, rs, rh, pack_next, plans,
               part_packs, pack_sp, PiRs, enter_ord, ident,
               PiWs, bp_sp, plans_sh):
            # (A round-5 A/B stacked the four rescales into one call —
            # 4.56 -> 5.49 ms/mult REGRESSION from the extra
            # stack/unstack copies; per-array rescales stay.)
            x0 = rescale_core(a0, rs, rh, pack_next)
            x1 = rescale_core(a1, rs, rh, pack_next)
            y0 = rescale_core(b0, rs, rh, pack_next)
            y1 = rescale_core(b1, rs, rh, pack_next)
            d0, d1, d2 = _cc_mult_core(x0, x1, y0, y1, pack_next)
            d0, d1, d2 = _relin_pre(d0, d1, d2, pack_next)
            s0, s1 = switch(d2, k0st, k1st, plans, part_packs,
                            pack_sp, pack_next, PiRs, enter_ord, ident,
                            PiWs, bp_sp, plans_sh)
            return _relin_post(d0, d1, s0, s1, pack_next)

        jitted = jax.jit(fn)
        self._switcher_cache[key] = jitted
        return jitted

    def _rescale_core(self):
        """Rescale-core variant selected by the config flags. The Shoup
        core takes ``rs`` as ((w, wp), bp) — see _rescale_args."""
        if config.use_shoup_rescale:
            def core(d, rs, rh, pack_next):
                return _rescale_core_shoup(d, rs[0], rs[1], rh, pack_next)
            return core
        core = (_rescale_core_tiled if config.use_tiled_rescale
                else _rescale_core)
        return lambda d, rs, rh, pack_next: core(d, rs, rh, pack_next)

    def _rescale_args(self, level: int):
        """The per-level constants matching _rescale_core()."""
        if config.use_shoup_rescale:
            return (self.rescale_sh[level], self.bp_ord[level])
        return self.rescale_scales[level]

    def _use_fused_mult(self) -> bool:
        # One big program is a compile-size liability at platinum width
        # (see pallas_ntt.CSLAB notes); the composed path serves there.
        return self.ctx.logN <= 16

    def cc_mult(self, a: DataStruct, b: DataStruct, evk: DataStruct,
                relin=True) -> DataStruct:
        if relin and self._use_fused_mult():
            level = a.level
            nxt = level + 1
            if nxt >= self.num_levels:
                raise errors.MaximumLevelError(level=level,
                                               level_max=self.num_levels)
            parts = self.ntt.parts(nxt)
            plans = tuple((p.Y_scalar, p.L_scalar, p.L_enter) for p in parts)
            plans_sh = tuple(p.L_enter_sh for p in parts)
            part_packs = tuple(p.pack for p in parts)
            k0st, k1st = self._ksk_stacked(evk)
            fn = self._mult_fused_fn(level)
            c0, c1 = fn(a.data[0], a.data[1], b.data[0], b.data[1],
                        k0st, k1st, self._rescale_args(level),
                        self.round_halves[level], self.pack(nxt, -1),
                        plans, part_packs, self.pack(nxt, -2),
                        tuple(self.PiRs[nxt]), self.enter_ord[nxt],
                        self.mont_identity[nxt], tuple(self.PiWs[nxt]),
                        self.bp_sp[nxt], plans_sh)
            return DataStruct((c0, c1), False, False, False,
                              types.origins["ct"], nxt, self.hash)
        x = self.rescale(a)
        y = self.rescale(b)
        level = x.level
        pack = self.pack(level, -1)
        d0, d1, d2 = _cc_mult_core(x.data[0], x.data[1],
                                   y.data[0], y.data[1], pack)
        ct_mult = DataStruct((d0, d1, d2), False, True, True,
                             types.origins["ctt"], level, self.hash)
        if relin:
            ct_mult = self.relinearize(ct_mult, evk)
        return ct_mult

    def mult_batched(self, cts_a, cts_b, evk: DataStruct):
        """Batched ct-ct multiply + relinearize + rescale: B independent
        pairs through ONE fused program whose every stage is natively
        ct-batched — the kernels see B× the grid per launch (the switch
        runs grid (C, B*P) with segmented part accumulation), the
        pointwise chains process [2, B, C, N] stacks, and the MXU tables
        stream once per channel for the whole batch. All inputs must sit
        at one common level. Returns a list of B ciphertexts.

        Reference has no batched API (it loops host-side,
        ckks_engine.py:1072-1151); this is the throughput-mode entry for
        TPU serving.

        (A round-5 jax.vmap formulation lost 0.59x to sequential mults —
        vmap prepends the batch as the OUTERMOST kernel grid axis, so
        every batch element re-streams the MXU tables; the native batch
        axes here keep them VMEM-resident.)"""
        if len(cts_a) != len(cts_b) or not cts_a:
            raise errors.DifferentTypeError(a=len(cts_a), b=len(cts_b))
        if not (self._use_fused_mult() and self._mxu_fused_switch()
                and config.use_shoup_moddown and config.use_shoup_rescale):
            # Paths without batch-generic stages (platinum-width composed
            # path, non-MXU backends, Montgomery chains): loop.
            return [self.cc_mult(a, b, evk)
                    for a, b in zip(cts_a, cts_b)]
        level = cts_a[0].level
        for ct in (*cts_a, *cts_b):
            if ct.level != level:
                raise errors.NotMatchType(origin=f"level {ct.level}",
                                          to=f"level {level}")
        nxt = level + 1
        if nxt >= self.num_levels:
            raise errors.MaximumLevelError(level=level,
                                           level_max=self.num_levels)
        out = self.mult_stacked(self.stack_cts(cts_a),
                                self.stack_cts(cts_b), evk)
        return self.unstack_ct(out)

    def stack_cts(self, cts) -> DataStruct:
        """Stack B same-level double ciphertexts into ONE batched
        DataStruct with [2, B, C, N] data — the zero-dispatch-overhead
        form for the batched APIs (stack once, then every wave of
        mult_stacked / add / sub is a single program dispatch)."""
        level = cts[0].level
        c0 = jnp.stack([c.data[0] for c in cts], axis=1)
        c1 = jnp.stack([c.data[1] for c in cts], axis=1)
        return DataStruct((c0, c1), cts[0].include_special,
                          cts[0].ntt_state, cts[0].montgomery_state,
                          cts[0].origin, level, self.hash)

    def unstack_ct(self, ct: DataStruct):
        """Split a batched DataStruct back into B ciphertexts."""
        B = ct.data[0].shape[1]
        return [DataStruct(tuple(d[:, i] for d in ct.data),
                           ct.include_special, ct.ntt_state,
                           ct.montgomery_state, ct.origin, ct.level,
                           self.hash)
                for i in range(B)]

    def mult_stacked(self, ct_a: DataStruct, ct_b: DataStruct,
                     evk: DataStruct) -> DataStruct:
        """Batched mult on STACKED ciphertexts (see stack_cts): one
        program dispatch for B mult+relin+rescales. The engine's
        pointwise ops (add/sub/decrypt cores) are batch-generic, so the
        result composes with them directly."""
        level = ct_a.level
        nxt = level + 1
        if nxt >= self.num_levels:
            raise errors.MaximumLevelError(level=level,
                                           level_max=self.num_levels)
        parts = self.ntt.parts(nxt)
        plans = tuple((p.Y_scalar, p.L_scalar, p.L_enter) for p in parts)
        plans_sh = tuple(p.L_enter_sh for p in parts)
        part_packs = tuple(p.pack for p in parts)
        k0st, k1st = self._ksk_stacked(evk)
        # The same jitted program as the single mult — every stage is
        # batch-generic, so jit just re-specializes on the [2, B, C, N]
        # shapes.
        fn = self._mult_fused_fn(level)
        c0, c1 = fn(ct_a.data[0], ct_a.data[1], ct_b.data[0], ct_b.data[1],
                    k0st, k1st, self._rescale_args(level),
                    self.round_halves[level], self.pack(nxt, -1),
                    plans, part_packs, self.pack(nxt, -2),
                    tuple(self.PiRs[nxt]), self.enter_ord[nxt],
                    self.mont_identity[nxt], tuple(self.PiWs[nxt]),
                    self.bp_sp[nxt], plans_sh)
        return DataStruct((c0, c1), False, False, False,
                          types.origins["ct"], nxt, self.hash)

    def square(self, ct: DataStruct, evk: DataStruct, relin=True) -> DataStruct:
        x = self.rescale(ct)
        level = x.level
        pack = self.pack(level, -1)
        d0, d1, d2 = _square_core(x.data[0], x.data[1], pack)
        ct_mult = DataStruct((d0, d1, d2), False, True, True,
                             types.origins["ctt"], level, self.hash)
        if relin:
            ct_mult = self.relinearize(ct_mult, evk)
        return ct_mult

    def relinearize(self, ct_triplet: DataStruct, evk: DataStruct) -> DataStruct:
        if ct_triplet.origin != types.origins["ctt"]:
            raise errors.NotMatchType(origin=ct_triplet.origin,
                                      to=types.origins["ctt"])
        level = ct_triplet.level
        pack = self.pack(level, -1)
        d0, d1, d2 = _relin_pre(ct_triplet.data[0], ct_triplet.data[1],
                                ct_triplet.data[2], pack)
        d2_0, d2_1 = self.create_switcher(d2, evk, level)
        c0, c1 = _relin_post(d0, d1, d2_0, d2_1, pack)
        return DataStruct((c0, c1), False, False, False,
                          types.origins["ct"], level, self.hash)

    # -- level up (reference: ckks_engine.py:1410-1467) ----------------------------

    def level_up(self, ct: DataStruct, dst_level: int) -> DataStruct:
        if ct.origin != types.origins["ct"]:
            raise errors.NotMatchType(origin=ct.origin, to=types.origins["ct"])
        new_ct = self.rescale(ct)
        src_level = ct.level + 1
        if dst_level < src_level:
            raise errors.MaximumLevelError(level=dst_level,
                                           level_max=src_level)

        diff_deviation = (self.deviations[dst_level]
                          / np.sqrt(self.deviations[src_level]))
        deviated_delta = round(self.scale * diff_deviation)

        drop = dst_level - src_level
        q_dst = self.ntt.q_ints(dst_level, -1)
        mult = jnp.asarray(_pack_list(
            [(deviated_delta * self.ctx.R) % qi for qi in q_dst],
            pad_to=self.ntt.padded_channels(dst_level, -1)))
        pack_dst = self.pack(dst_level, -1)
        d0 = _scalar_mult_core(new_ct.data[0], mult, pack_dst, drop)
        d1 = _scalar_mult_core(new_ct.data[1], mult, pack_dst, drop)
        return DataStruct((d0, d1), False, False, False,
                          types.origins["ct"], dst_level, self.hash)

    # -- auto ops (reference: ckks_engine.py:2225-2246) ----------------------------

    def auto_level(self, ct0: DataStruct, ct1: DataStruct):
        if ct0.level < ct1.level:
            return self.level_up(ct0, ct1.level), ct1
        if ct0.level > ct1.level:
            return ct0, self.level_up(ct1, ct0.level)
        return ct0, ct1

    def auto_cc_mult(self, ct0, ct1, evk, relin=True):
        a, b = self.auto_level(ct0, ct1)
        return self.cc_mult(a, b, evk, relin=relin)

    def auto_cc_add(self, ct0, ct1):
        a, b = self.auto_level(ct0, ct1)
        return self.cc_add(a, b)

    def auto_cc_sub(self, ct0, ct1):
        a, b = self.auto_level(ct0, ct1)
        return self.cc_sub(a, b)

    # -- scalar ops (reference: ckks_engine.py:2052-2159) --------------------------

    def _scalar_to_mont(self, value: int, level: int):
        q_lvl = self.ntt.q_ints(level, -1)
        return jnp.asarray(_pack_list(
            [(value * self.ctx.R) % qi for qi in q_lvl],
            pad_to=self.ntt.padded_channels(level, -1)))

    def mult_int_scalar(self, ct: DataStruct, scalar, evk=None, relin=True):
        if ct.origin != types.origins["ct"]:
            raise errors.NotMatchType(origin=ct.origin, to=types.origins["ct"])
        mont = self._scalar_to_mont(int(scalar), ct.level)
        pack = self.pack(ct.level, -1)
        new_data = tuple(_scalar_mult_core(d, mont, pack) for d in ct.data)
        return ct._replace(data=new_data)

    def mult_scalar(self, ct: DataStruct, scalar, evk=None, relin=True):
        scaled_scalar = int(
            scalar * self.scale * np.sqrt(self.deviations[ct.level + 1]) + 0.5)
        mont = self._scalar_to_mont(scaled_scalar, ct.level)
        pack = self.pack(ct.level, -1)
        new_data = tuple(_scalar_mult_core(d, mont, pack) for d in ct.data)
        return self.rescale(ct._replace(data=new_data))

    def add_scalar(self, ct: DataStruct, scalar):
        scaled_scalar = int(
            scalar * self.scale * self.deviations[ct.level] + 0.5)
        if self.norm == "backward":
            scaled_scalar *= self.ctx.N
        scaled_scalar *= self.int_scale
        q_lvl = self.ntt.q_ints(ct.level, -1)
        vals = jnp.asarray(_pack_list(
            [scaled_scalar % qi for qi in q_lvl],
            pad_to=self.ntt.padded_channels(ct.level, -1), pad_value=0))
        pack = self.pack(ct.level, -1)
        d0 = _add_dc_core(ct.data[0], vals, pack)
        return ct._replace(data=(d0,) + tuple(ct.data[1:]))

    def sub_scalar(self, ct: DataStruct, scalar):
        return self.add_scalar(ct, -scalar)

    def int_scalar_mult(self, scalar, ct, evk=None, relin=True):
        return self.mult_int_scalar(ct, scalar)

    def scalar_mult(self, scalar, ct, evk=None, relin=True):
        return self.mult_scalar(ct, scalar)

    def scalar_add(self, scalar, ct):
        return self.add_scalar(ct, scalar)

    def scalar_sub(self, scalar, ct):
        return self.add_scalar(self.negate(ct), scalar)

    # -- message ops (reference: ckks_engine.py:2165-2219) -------------------------

    def mc_mult(self, m, ct: DataStruct, evk=None, relin=True):
        m = np.array(m) * np.sqrt(self.deviations[ct.level + 1])
        pt = self.encode(m, 0)
        pack = self.pack(ct.level, -1)
        d0, d1 = _mc_mult_core(pt, ct.data[0], ct.data[1], pack)
        new_ct = ct._replace(data=(d0, d1))
        return self.rescale(new_ct)

    def mc_add(self, m, ct: DataStruct):
        pt = self.encode(m, ct.level)
        pack = self.pack(ct.level, -1)
        d0 = _mc_add_core(pt, ct.data[0], pack)
        return ct._replace(data=(d0,) + tuple(ct.data[1:]))

    def mc_sub(self, m, ct: DataStruct):
        return self.mc_add(m, self.negate(ct))

    def cm_mult(self, ct, m, evk=None, relin=True):
        return self.mc_mult(m, ct)

    def cm_add(self, ct, m):
        return self.mc_add(m, ct)

    def cm_sub(self, ct, m):
        return self.mc_add(-np.array(m), ct)

    # -- rotations & conjugation (reference: ckks_engine.py:1157-1263, 1694-1734) --

    def _rotated_sk(self, sk: DataStruct, perm_data) -> DataStruct:
        """Apply a signed coefficient permutation to sk (coefficient domain
        round-trip; Montgomery form commutes with permutation)."""
        pack = self.pack(0, -1)
        gather = jnp.asarray(perm_data[0])
        neg = jnp.asarray(perm_data[1])
        rotated = _rotate_sk_core(sk.data, gather, neg, pack)
        return DataStruct(rotated, False, True, True,
                          types.origins["sk"], 0, self.hash)

    def create_rotation_key(self, sk: DataStruct, delta: int,
                            a=None) -> DataStruct:
        if sk.origin != types.origins["sk"]:
            raise errors.NotMatchType(origin=sk.origin, to=types.origins["sk"])
        perm = encdec.rotate_perm_data(self.ctx.N, delta)
        sk_rotated = self._rotated_sk(sk, perm)
        rotk = self.create_key_switching_key(sk_rotated, sk, a=a)
        return rotk._replace(origin=types.origins["rotk"] + f"{delta}")

    def create_conjugation_key(self, sk: DataStruct) -> DataStruct:
        if sk.origin != types.origins["sk"]:
            raise errors.NotMatchType(origin=sk.origin, to=types.origins["sk"])
        perm = encdec.conjugate_perm_data(self.ctx.N)
        sk_conj = self._rotated_sk(sk, perm)
        conjk = self.create_key_switching_key(sk_conj, sk)
        return conjk._replace(origin=types.origins["conjk"])

    def create_galois_key(self, sk: DataStruct) -> DataStruct:
        parts = [self.create_rotation_key(sk, delta)
                 for delta in self.galois_deltas]
        return DataStruct(parts, True, True, True,
                          types.origins["galk"], 0, self.hash)

    def _perm_on_device(self, key, perm_data):
        """Device-resident permutation tables, cached: re-uploading the
        [N] gather index per rotation dominates the hop cost otherwise."""
        if key not in self._perm_device_cache:
            self._perm_device_cache[key] = (jnp.asarray(perm_data[0]),
                                            jnp.asarray(perm_data[1]))
        return self._perm_device_cache[key]

    def _permute_ct(self, ct: DataStruct, perm_key, perm_data) -> DataStruct:
        pack = self.pack(ct.level, -1)
        gather, neg = self._perm_on_device(perm_key, perm_data)
        new_data = tuple(_rotate_ct_core(d, gather, neg, pack)
                         for d in ct.data)
        return ct._replace(data=new_data)

    def _rotate_fused_fn(self, level: int):
        """One jitted program for the whole rotation hop: signed
        coefficient permutation of both ct halves + key switch + the
        final add (reference: rotate_single -> switch_key,
        ckks_engine.py:1180-1232). The permutation tables are runtime
        arguments, so one program per level serves every delta and the
        conjugation."""
        key = ("rot_fused", level)
        if key in self._switcher_cache:
            return self._switcher_cache[key]
        switch = self._switcher_fn(level, False)

        def fn(d0, d1, gather, neg, k0st, k1st, plans, part_packs, pack_sp,
               pack_ord, PiRs, enter_ord, ident, PiWs, bp_sp, plans_sh):
            r0 = _rotate_ct_core(d0, gather, neg, pack_ord)
            r1 = _rotate_ct_core(d1, gather, neg, pack_ord)
            s0, s1 = switch(r1, k0st, k1st, plans, part_packs,
                            pack_sp, pack_ord, PiRs, enter_ord, ident,
                            PiWs, bp_sp, plans_sh)
            c0 = ops.reduce_2q(ops.mont_add(r0, s0, pack_ord), pack_ord)
            return c0, s1

        jitted = jax.jit(fn)
        self._switcher_cache[key] = jitted
        return jitted

    def _rotate_switch(self, ct: DataStruct, rotk: DataStruct,
                       perm_key, perm_data) -> DataStruct:
        level = ct.level
        parts = self.ntt.parts(level)
        plans = tuple((p.Y_scalar, p.L_scalar, p.L_enter) for p in parts)
        plans_sh = tuple(p.L_enter_sh for p in parts)
        part_packs = tuple(p.pack for p in parts)
        k0st, k1st = self._ksk_stacked(rotk)
        gather, neg = self._perm_on_device(perm_key, perm_data)
        fn = self._rotate_fused_fn(level)
        c0, c1 = fn(ct.data[0], ct.data[1], gather, neg, k0st, k1st,
                    plans, part_packs, self.pack(level, -2),
                    self.pack(level, -1), tuple(self.PiRs[level]),
                    self.enter_ord[level], self.mont_identity[level],
                    tuple(self.PiWs[level]), self.bp_sp[level], plans_sh)
        return DataStruct((c0, c1), ct.include_special, ct.ntt_state,
                          ct.montgomery_state, types.origins["ct"], level,
                          self.hash)

    def rotate_single(self, ct: DataStruct, rotk: DataStruct) -> DataStruct:
        if types.origins["rotk"] not in rotk.origin:
            raise errors.NotMatchType(origin=rotk.origin,
                                      to=types.origins["rotk"])
        delta = int(rotk.origin.split(":")[-1])
        perm = encdec.rotate_perm_data(self.ctx.N, delta)
        if ct.ntt_state or ct.montgomery_state:
            rotated = self._permute_ct(ct, ("rot", delta), perm)
            return self.switch_key(rotated, rotk)
        return self._rotate_switch(ct, rotk, ("rot", delta), perm)

    def rotate_galois(self, ct: DataStruct, gk: DataStruct, delta: int,
                      return_circuit=False):
        if gk.origin != types.origins["galk"]:
            raise errors.NotMatchType(origin=gk.origin,
                                      to=types.origins["galk"])
        current_delta = delta % self.num_slots
        circuit = []
        while current_delta:
            ind = int(math.log2(current_delta))
            circuit.append(ind)
            current_delta -= self.galois_deltas[ind]
        rotated = ct
        for ind in circuit:
            rotated = self.rotate_single(rotated, gk.data[ind])
        return (rotated, circuit) if return_circuit else rotated

    def conjugate(self, ct: DataStruct, conjk: DataStruct) -> DataStruct:
        perm = encdec.conjugate_perm_data(self.ctx.N)
        if ct.ntt_state or ct.montgomery_state:
            conj = self._permute_ct(ct, ("conj",), perm)
            return self.switch_key(conj, conjk)
        return self._rotate_switch(ct, conjk, ("conj",), perm)

    # -- high-level math (reference: ckks_engine.py:2301-2351, 2693-2724) ----------

    def sum(self, ct: DataStruct, gk: DataStruct) -> DataStruct:
        new_ct = ct
        for roti in range(self.ctx.logN - 1):
            rot_ct = self.rotate_single(new_ct, gk.data[roti])
            new_ct = self.add(rot_ct, new_ct)
        return new_ct

    def mean(self, ct: DataStruct, gk: DataStruct, alpha=1) -> DataStruct:
        new_ct = self.mult(1 / self.num_slots / alpha, ct)
        for roti in range(self.ctx.logN - 1):
            rot_ct = self.rotate_single(new_ct, gk.data[roti])
            new_ct = self.add(rot_ct, new_ct)
        return new_ct

    def cov(self, ct_a: DataStruct, ct_b: DataStruct,
            evk: DataStruct, gk: DataStruct) -> DataStruct:
        cta_mean = self.mean(ct_a, gk)
        ctb_mean = self.mean(ct_b, gk)
        cta_dev = self.sub(ct_a, cta_mean)
        ctb_dev = self.sub(ct_b, ctb_mean)
        return self.mult(self.mult(cta_dev, ctb_dev, evk),
                         1 / (self.num_slots - 1))

    def pow(self, ct: DataStruct, power: int, evk: DataStruct) -> DataStruct:
        current_exponent = 2
        pow_list = [ct]
        while current_exponent <= power:
            pow_list.append(self.cc_mult(pow_list[-1], pow_list[-1], evk))
            current_exponent *= 2
        remaining = power - current_exponent // 2
        new_ct = pow_list[-1]
        while remaining > 0:
            ind = math.floor(math.log2(remaining))
            new_ct = self.auto_cc_mult(new_ct, pow_list[ind], evk)
            remaining -= 2 ** ind
        return new_ct

    def sqrt(self, ct: DataStruct, evk: DataStruct, e=0.0001,
             alpha=0.0001) -> DataStruct:
        """Wilkes-style iteration (reference: ckks_engine.py:2693-2710)."""
        a = ct
        b = ct
        while e <= 1 - alpha:
            k = float(np.roots([1 - e ** 3, -6 + 6 * e ** 2, 9 - 9 * e])[1])
            t = self.mult_scalar(a, k)
            b0 = self.sub_scalar(t, 3)
            b1 = self.mult_scalar(b, (k ** 0.5) / 2)
            b = self.cc_mult(b0, b1, evk)

            a0 = self.mult_scalar(a, (k ** 3) / 4)
            t = self.sub_scalar(a, 3 / k)
            a1 = self.square(t, evk)
            a = self.cc_mult(a0, a1, evk)
            e = k * (3 - k) ** 2 / 4
        return b

    def var(self, ct: DataStruct, evk: DataStruct, gk: DataStruct,
            relin=False) -> DataStruct:
        ct_mean = self.mean(ct, gk)
        dev = self.sub(ct, ct_mean)
        dev = self.square(dev, evk, relin=relin)
        if not relin:
            dev = self.relinearize(dev, evk)
        return self.mean(dev, gk)

    def std(self, ct: DataStruct, evk: DataStruct, gk: DataStruct,
            relin=False) -> DataStruct:
        return self.sqrt(self.var(ct, evk, gk, relin=relin), evk)

    # -- multiparty (threshold) FHE (reference: ckks_engine.py:2388-2687) ----------

    def multiparty_public_crs(self, pk: DataStruct):
        return pk.data[1]

    def multiparty_create_public_key(self, sk: DataStruct, a=None,
                                     include_special=False) -> DataStruct:
        return self.create_public_key(sk, include_special=include_special,
                                      a=a)

    def multiparty_create_collective_public_key(
            self, pks: list) -> DataStruct:
        mult_type = -2 if pks[0].include_special else -1
        pack = self.pack(0, mult_type)
        b = pks[0].data[0]
        for pk in pks[1:]:
            b = ops.mont_add(b, pk.data[0], pack)
        return pks[0]._replace(data=(b, pks[0].data[1]),
                               origin=types.origins["pk"])

    def multiparty_decrypt_head(self, ct: DataStruct, sk: DataStruct):
        """ct0 + a*sk_0 (party 0; reference: ckks_engine.py:2447-2470)."""
        level = ct.level
        pack = self.pack(level, -1)
        return _mp_decrypt_head(ct.data[0], ct.data[1], sk.data, level, pack)

    def multiparty_decrypt_partial(self, ct: DataStruct, sk: DataStruct):
        """a*sk_i (party i; reference: ckks_engine.py:2472-2493)."""
        level = ct.level
        pack = self.pack(level, -1)
        return _mp_decrypt_partial(ct.data[1], sk.data, level, pack)

    def multiparty_decrypt_fusion(self, pcts: list, level=0,
                                  include_special=False):
        pack = self.pack(level, -1)
        pt = pcts[0]
        for pct in pcts[1:]:
            pt = ops.mont_add(pt, pct, pack)
        pt = ops.reduce_2q(pt, pack)
        scaled = self._final_rescale_signed(pt, level, final_round=True)
        return self.decode(scaled, level=level)

    def multiparty_create_key_switching_key(self, sk_src: DataStruct,
                                            sk_dst: DataStruct,
                                            a=None) -> DataStruct:
        """Identical to create_key_switching_key but with a caller-provided
        CRS so every party uses the same `a` (reference: :2521-2568)."""
        return self.create_key_switching_key(sk_src, sk_dst, a=a)

    def multiparty_create_rotation_key(self, sk: DataStruct, delta: int,
                                       a=None) -> DataStruct:
        return self.create_rotation_key(sk, delta, a=a)

    def _sum_ksk_pk0(self, ksks: list) -> DataStruct:
        """Sum the pk0 components of key-switching-key shares."""
        pack = self.pack(0, -2)
        out_parts = []
        for part_idx in range(len(ksks[0].data)):
            pk0 = ksks[0].data[part_idx].data[0]
            for other in ksks[1:]:
                pk0 = ops.mont_add(pk0, other.data[part_idx].data[0], pack)
            out_parts.append(ksks[0].data[part_idx]._replace(
                data=(pk0, ksks[0].data[part_idx].data[1])))
        return ksks[0]._replace(data=out_parts)

    def multiparty_generate_rotation_key(self, rotks: list) -> DataStruct:
        return self._sum_ksk_pk0(rotks)

    def generate_rotation_crs(self, rotk: DataStruct):
        if (types.origins["rotk"] not in rotk.origin
                and types.origins["ksk"] != rotk.origin):
            raise errors.NotMatchType(origin=rotk.origin,
                                      to=types.origins["ksk"])
        return [ksk.data[1] for ksk in rotk.data]

    def generate_galois_crs(self, galk: DataStruct):
        if galk.origin != types.origins["galk"]:
            raise errors.NotMatchType(origin=galk.origin,
                                      to=types.origins["galk"])
        return [[ksk.data[1] for ksk in rotk.data] for rotk in galk.data]

    def multiparty_create_galois_key(self, sk: DataStruct, a: list) -> DataStruct:
        if sk.origin != types.origins["sk"]:
            raise errors.NotMatchType(origin=sk.origin, to=types.origins["sk"])
        parts = [self.multiparty_create_rotation_key(
                     sk, self.galois_deltas[idx], a=a[idx])
                 for idx in range(len(self.galois_deltas))]
        return DataStruct(parts, True, True, True,
                          types.origins["galk"], 0, self.hash)

    def multiparty_generate_galois_key(self, galks: list) -> DataStruct:
        rotks = [self._sum_ksk_pk0([g.data[i] for g in galks])
                 for i in range(len(galks[0].data))]
        return galks[0]._replace(data=rotks)

    def multiparty_sum_evk_share(self, evks_share: list) -> DataStruct:
        return self._sum_ksk_pk0(evks_share)

    def multiparty_mult_evk_share_sum(self, evk_sum: DataStruct,
                                      sk: DataStruct) -> DataStruct:
        """Each party multiplies both ksk halves by its secret share
        (reference: ckks_engine.py:2664-2676)."""
        if sk.origin != types.origins["sk"]:
            raise errors.NotMatchType(origin=sk.origin, to=types.origins["sk"])
        pack = self.pack(0, -2)
        out_parts = []
        for part in evk_sum.data:
            b = ops.mont_mult(part.data[0], sk.data, pack)
            a = ops.mont_mult(part.data[1], sk.data, pack)
            out_parts.append(part._replace(data=(b, a)))
        return evk_sum._replace(data=out_parts)

    def multiparty_sum_evk_share_mult(self, evk_sum_mult: list) -> DataStruct:
        pack = self.pack(0, -2)
        out_parts = []
        for part_idx in range(len(evk_sum_mult[0].data)):
            b = evk_sum_mult[0].data[part_idx].data[0]
            a = evk_sum_mult[0].data[part_idx].data[1]
            for other in evk_sum_mult[1:]:
                b = ops.mont_add(b, other.data[part_idx].data[0], pack)
                a = ops.mont_add(a, other.data[part_idx].data[1], pack)
            out_parts.append(evk_sum_mult[0].data[part_idx]._replace(
                data=(b, a)))
        return evk_sum_mult[0]._replace(data=out_parts)

    # -- negate (reference: ckks_engine.py:2035-2046) ----------------------------

    def negate(self, ct: DataStruct) -> DataStruct:
        pack = self.pack(ct.level, -1)
        new_data = tuple(_neg_core(d, pack) for d in ct.data)
        return ct._replace(data=new_data)

    # -- data management ----------------------------------------------------------

    def clone(self, text: DataStruct) -> DataStruct:
        """jnp arrays are immutable; cloning copies structure only."""
        if isinstance(text.data, DataStruct):
            return text._replace(data=self.clone(text.data))
        if (isinstance(text.data, (list, tuple))
                and len(text.data) > 0 and isinstance(text.data[0], DataStruct)):
            return text._replace(
                data=type(text.data)(self.clone(d) for d in text.data))
        return text._replace(data=text.data)

    def cpu(self, text: DataStruct) -> DataStruct:
        """Fetch to host (numpy) recursively."""
        return jax.tree_util.tree_map(lambda x: np.asarray(x), text)

    def cuda(self, text: DataStruct) -> DataStruct:  # reference-compatible name
        return self.device_put(text)

    def device_put(self, text: DataStruct) -> DataStruct:
        return jax.tree_util.tree_map(jnp.asarray, text)

    def move_to(self, text: DataStruct, direction="gpu2cpu") -> DataStruct:
        """Reference-compatible data movement (reference: ckks_engine.py:1872).
        'gpu2cpu' fetches to host numpy; 'cpu2gpu' places on device."""
        if direction == "gpu2cpu":
            return self.cpu(text)
        if direction == "cpu2gpu":
            return self.device_put(text)
        raise ValueError(f"unknown direction {direction!r}")

    def device(self, text: DataStruct) -> str:
        leaves = jax.tree_util.tree_leaves(text)
        x = leaves[0]
        if isinstance(x, np.ndarray):
            return "cpu"
        return str(next(iter(x.devices()))).split(":")[0]

    def save(self, text: DataStruct, filename=None):
        if filename is None:
            import datetime
            filename = datetime.datetime.now().strftime("%Y%m%d%H%M%S%f") + ".pkl"
        cpu_text = self.cpu(text)
        with Path(filename).open("wb") as f:
            pickle.dump(cpu_text, f)
        return filename

    def load(self, filename, move_to_device=True):
        with Path(filename).open("rb") as f:
            text = pickle.load(f)
        if text.hash and text.hash != self.hash:
            raise errors.HashMismatchError()
        return self.device_put(text) if move_to_device else text

    def print_data_structure(self, text, level=0):
        indent = "  " * level
        if isinstance(text, DataStruct):
            print(f"{indent}{text.origin} (level={text.level})")
            data = text.data
            if isinstance(data, DataStruct):
                self.print_data_structure(data, level + 1)
            elif (isinstance(data, (list, tuple)) and data
                    and isinstance(data[0], DataStruct)):
                for d in data:
                    self.print_data_structure(d, level + 1)
            else:
                for d in (data if isinstance(data, (list, tuple)) else [data]):
                    print(f"{indent}  array {tuple(d.shape)}")

    # -- misc ----------------------------------------------------------------------

    def refresh(self, seed=None):
        self.rng.refresh(seed)

    def profile(self, log_dir: str):
        """Context manager tracing device execution with the JAX profiler
        (view with TensorBoard / xprof). The reference has no profiling
        hooks (SURVEY 5); on TPU this captures per-kernel timelines.

        with engine.profile("/tmp/fhe-trace"):
            engine.mult(ct1, ct2, evk)
        """
        return jax.profiler.trace(log_dir)

    def reduce_error(self, ct):
        return self.mult_scalar(ct, 1.0)

    # -- dispatchers (reference: ckks_engine.py:2252-2283) -----------------------

    def mult(self, a, b, evk=None, relin=True):
        func = self.mult_dispatch.get((type(a), type(b)))
        if func is None:
            raise errors.DifferentTypeError(a=type(a).__name__, b=type(b).__name__)
        return func(a, b, evk, relin)

    def add(self, a, b):
        func = self.add_dispatch.get((type(a), type(b)))
        if func is None:
            raise errors.DifferentTypeError(a=type(a).__name__, b=type(b).__name__)
        return func(a, b)

    def sub(self, a, b):
        func = self.sub_dispatch.get((type(a), type(b)))
        if func is None:
            raise errors.DifferentTypeError(a=type(a).__name__, b=type(b).__name__)
        return func(a, b)


def _pack_scalar(v: int) -> np.ndarray:
    return _pack_list([v])


def _shoup_pack(ws, qs, pad_to=None):
    """Plain constants + Shoup quotients as jnp arrays: for each channel,
    (w mod q, floor(w * 2^64 / q)). Returns (w [2, C], wp [2, C])."""
    ws = [int(w) % int(q) for w, q in zip(ws, qs)]
    wps = [(w << 64) // int(q) for w, q in zip(ws, qs)]
    return (jnp.asarray(_pack_list(ws, pad_to=pad_to)),
            jnp.asarray(_pack_list(wps, pad_to=pad_to)))


def _barrett_pack(qs, pad_to=None):
    """floor(2^64 / q) per channel, packed [2, C] (see u64.barrett_2q)."""
    return jnp.asarray(_pack_list([(1 << 64) // int(q) for q in qs],
                                  pad_to=pad_to))


def _pack_list(vals, pad_to=None, pad_value=None) -> np.ndarray:
    vals = list(vals)
    if pad_to is not None and pad_to > len(vals):
        fill = vals[-1] if pad_value is None else pad_value
        vals = vals + [fill] * (pad_to - len(vals))
    arr = np.array([int(v) & 0xFFFFFFFFFFFFFFFF for v in vals],
                   dtype=np.uint64)
    lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=0)


# Reference-compatible alias.
ckks_engine = CkksEngine
