"""Coefficient-axis sharded NTT/iNTT (prototype).

The reference never shards the coefficient axis — each GPU runs whole
per-channel NTTs (SURVEY 5 "long-context analogue": scaling N is handled
by more stage launches per device, reference: ntt_cuda_kernel.cu:318-322).
On TPU, sharding coefficients over the mesh is the design dimension that
lets one transform outgrow a chip: with S shards, the first k = log2(S)
Cooley-Tukey stages pair elements in DIFFERENT shards, and all remaining
stages are shard-local.

Key observations that make this cheap on ICI:

1. A cross-shard stage s (< k) pairs shard i with shard i XOR 2^(k-1-s) —
   a single jax.lax.ppermute exchange per stage.
2. Within such a stage every element of a shard shares ONE twiddle:
   shard i's block lies wholly inside one butterfly half-block, so the
   twiddle is bank[2^s + (i >> (k-s))] — a per-(channel, shard) scalar.
3. The remaining logN-k stages on a shard of length L = N/S are exactly a
   length-L stage schedule whose twiddle indices are an affine function
   of the shard index: global index 2^(k+sl) + i*2^sl + bl relabels to
   local index 2^sl + bl in a per-shard REARRANGED bank. So the existing
   XLA butterfly (ops.ntt/ops.intt_no_norm) runs unchanged inside
   shard_map, fed a per-shard bank.

Communication: k ppermutes of the local block each way — O(N/S * k)
bytes over ICI; no all-to-all, no gather. Bit-exact vs the single-chip
path (tests/test_coef_shard.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ntt import ops, u64

__all__ = ["CoefShardPlan", "make_coef_plan", "ntt_coef_sharded",
           "intt_coef_sharded"]


class CoefShardPlan:
    """Precomputed per-shard banks and cross-stage scalars for one mesh.

    Arrays (packed uint32 [2, ...]):
    - psi_l / ipsi_l: [2, C, N] per-shard-rearranged banks; shard i's
      slice [..., i*L:(i+1)*L] is its local length-L bank.
    - cross_f / cross_i: [2, k, C, S] per-stage per-shard twiddle scalars
      (forward / inverse).

    rns_axis: optional second mesh axis sharding the CHANNEL dimension —
    the 2-D ('rns', 'coef') layout. Channels are independent transforms,
    so the rns axis adds no communication; every per-channel constant is
    simply passed into shard_map with a channel-sharded spec instead of
    being captured (closure capture would replicate it).
    """

    def __init__(self, mesh, axis, S, logN, pack, psi_l, ipsi_l,
                 cross_f, cross_i, pl_logL=None, pl_consts=None,
                 pl_row_tw=None, pl_lane_tw=None, pl_row_itw=None,
                 pl_lane_itw=None, rns_axis=None):
        self.mesh = mesh
        self.axis = axis
        self.S = S
        self.logN = logN
        self.pack = pack          # channel constants (psi dropped)
        self.psi_l = psi_l
        self.ipsi_l = ipsi_l
        self.cross_f = cross_f
        self.cross_i = cross_i
        self.rns_axis = rns_axis
        # Optional per-shard Pallas twiddle planes (local transforms run
        # the fused kernels instead of the XLA butterfly): stacked
        # [2, S, ...] arrays sharded over the coef axis.
        self.pl_logL = pl_logL
        self.pl_consts = pl_consts
        self.pl_row_tw = pl_row_tw
        self.pl_lane_tw = pl_lane_tw
        self.pl_row_itw = pl_row_itw
        self.pl_lane_itw = pl_lane_itw

    # Registered as a pytree (like PallasPlan) so plans ride inside
    # LevelPacks through jit boundaries; mesh/axis names and shape
    # parameters are static aux.
    _CHILDREN = ("pack", "psi_l", "ipsi_l", "cross_f", "cross_i",
                 "pl_consts", "pl_row_tw", "pl_lane_tw",
                 "pl_row_itw", "pl_lane_itw")

    def tree_flatten(self):
        return (tuple(getattr(self, f) for f in self._CHILDREN),
                (self.mesh, self.axis, self.S, self.logN,
                 self.rns_axis, self.pl_logL))

    @classmethod
    def tree_unflatten(cls, aux, children):
        mesh, axis, S, logN, rns_axis, pl_logL = aux
        (pack, psi_l, ipsi_l, cross_f, cross_i,
         pl_consts, pl_row_tw, pl_lane_tw, pl_row_itw, pl_lane_itw) = children
        return cls(mesh, axis, S, logN, pack, psi_l, ipsi_l, cross_f,
                   cross_i, pl_logL=pl_logL, pl_consts=pl_consts,
                   pl_row_tw=pl_row_tw, pl_lane_tw=pl_lane_tw,
                   pl_row_itw=pl_row_itw, pl_lane_itw=pl_lane_itw,
                   rns_axis=rns_axis)


jax.tree_util.register_pytree_node(
    CoefShardPlan, lambda p: p.tree_flatten(), CoefShardPlan.tree_unflatten)


def _rearranged_bank(bank: np.ndarray, S: int) -> np.ndarray:
    """[2, C, N] global bank -> [2, C, S, L] per-shard local banks.

    local[i][2^sl + bl] = global[2^sl * (2^k + i) + bl], bl in [0, 2^sl).
    Entry 0 is unused by the stage schedule (stages address [2^s, 2^{s+1})).
    """
    _, C, N = bank.shape
    L = N // S
    k = S.bit_length() - 1
    out = np.zeros((2, C, S, L), dtype=bank.dtype)
    logL = L.bit_length() - 1
    for i in range(S):
        for sl in range(logL):
            m = 1 << sl
            bl = np.arange(m)
            out[:, :, i, m + bl] = bank[:, :, m * ((1 << k) + i) + bl]
    return out


def _cross_scalars(bank: np.ndarray, S: int) -> np.ndarray:
    """[2, C, N] bank -> [2, k, C, S]: stage-s scalar of shard i is
    bank[2^s + (i >> (k - s))]."""
    _, C, _ = bank.shape
    k = S.bit_length() - 1
    out = np.zeros((2, k, C, S), dtype=bank.dtype)
    for s in range(k):
        for i in range(S):
            idx = (1 << s) + (i >> (k - s))
            out[:, s, :, i] = bank[:, :, idx]
    return out


def make_coef_plan(ntt_ctx, mesh: Mesh, axis: str = "coef",
                   level: int = 0, mult_type: int = -2,
                   rns_axis: str = None, idx=None) -> CoefShardPlan:
    """Build a coefficient-sharding plan from an NttContext's master banks.

    rns_axis: name of a second mesh axis to shard the channel dimension
    over (2-D layout); the channel count must divide evenly (engine-level
    packs pad channels to mesh multiples — liberate_tpu.parallel.sharding).
    idx: explicit channel index list (e.g. a padded level layout or a
    key-switching part's primes); defaults to the (level, mult_type) range.
    """
    S = int(mesh.shape[axis])
    if idx is None:
        start, stop = ntt_ctx.channel_range(level, mult_type)
        idx = np.arange(start, stop)
    idx = np.asarray(idx)
    pack = ntt_ctx._make_pack(idx, with_psi=False)
    if rns_axis is not None and idx.size % mesh.shape[rns_axis]:
        raise ValueError(
            f"channel count {idx.size} not divisible by mesh axis "
            f"'{rns_axis}' ({mesh.shape[rns_axis]}); pad channels first")
    psi = ntt_ctx._psi_mont[:, idx]           # numpy [2, C, N]
    ipsi = ntt_ctx._ipsi_mont[:, idx]
    logN = ntt_ctx.logN

    psi_sh = _rearranged_bank(psi, S)            # [2, C, S, L]
    ipsi_sh = _rearranged_bank(ipsi, S)
    psi_l = psi_sh.reshape(2, idx.size, -1)
    ipsi_l = ipsi_sh.reshape(2, idx.size, -1)

    # Per-shard Pallas twiddle planes: the local length-L transforms run
    # the fused kernels (bit-exact — same butterfly network on the
    # rearranged bank) when the local size supports them.
    from .. import config
    L = (1 << logN) // S
    logL = L.bit_length() - 1
    pl = dict(pl_logL=None, pl_consts=None, pl_row_tw=None,
              pl_lane_tw=None, pl_row_itw=None, pl_lane_itw=None)
    if config.pallas_enabled() and logL >= 8:
        from ..ntt import pallas_ntt

        def u64v(b):      # packed u32 [2, C, S, L] -> u64 [S, C, L]
            v = (b[0].astype(np.uint64)
                 | (b[1].astype(np.uint64) << np.uint64(32)))
            return np.moveaxis(v, 1, 0)

        def planes(bank_u64):
            rows, lanes = [], []
            for i in range(S):
                r, l = pallas_ntt.build_tw_planes(bank_u64[i], logL)
                rows.append(r)
                lanes.append(l)
            return (np.stack(rows, axis=0), np.stack(lanes, axis=0))

        rf, lf = planes(u64v(psi_sh))
        ri, li = planes(u64v(ipsi_sh))

        def pack_u64(arr):   # u64 [S, ...] -> packed u32 [2, S, ...]
            return np.stack([(arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                             (arr >> np.uint64(32)).astype(np.uint32)])

        def put(x):
            # [2, S, C, ...]: S over the coef axis, channels over rns.
            spec = P(None, axis, rns_axis, *([None] * (x.ndim - 3)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        q = [ntt_ctx.ctx.q[i] for i in idx]
        kk = [ntt_ctx.ctx.k[i] for i in idx]
        LB = (1 << 31) - 1
        consts = np.zeros((10, idx.size), dtype=np.uint32)
        consts[0] = np.array([qi & LB for qi in q], dtype=np.uint64)
        consts[1] = np.array([qi >> 31 for qi in q], dtype=np.uint64)
        consts[2] = np.array([ki & LB for ki in kk], dtype=np.uint64)
        consts[3] = np.array([ki >> 31 for ki in kk], dtype=np.uint64)
        consts[4] = np.array([(2 * qi) & 0xFFFFFFFF for qi in q],
                             dtype=np.uint64)
        consts[5] = np.array([(2 * qi) >> 32 for qi in q], dtype=np.uint64)
        pl = dict(pl_logL=logL,
                  pl_consts=jax.device_put(
                      consts, NamedSharding(mesh, P(None, rns_axis))),
                  pl_row_tw=put(pack_u64(rf)), pl_lane_tw=put(pack_u64(lf)),
                  pl_row_itw=put(pack_u64(ri)), pl_lane_itw=put(pack_u64(li)))

    sh_coef = NamedSharding(mesh, P(None, rns_axis, axis))
    cpack = pack._replace(psi=None, ipsi=None, pallas=None, mxu=None,
                          coef=None)
    if rns_axis is not None:
        cpack = jax.tree.map(
            lambda x: jax.device_put(
                np.asarray(x),
                NamedSharding(mesh, P(*([None] * (x.ndim - 1)), rns_axis))),
            cpack)
    return CoefShardPlan(
        mesh, axis, S, logN, cpack,
        jax.device_put(psi_l, sh_coef),
        jax.device_put(ipsi_l, sh_coef),
        jax.device_put(_cross_scalars(psi, S),
                       NamedSharding(mesh, P(None, None, rns_axis, axis))),
        jax.device_put(_cross_scalars(ipsi, S),
                       NamedSharding(mesh, P(None, None, rns_axis, axis))),
        rns_axis=rns_axis,
        **pl,
    )


def _xor_perm(S, d):
    return [(j, j ^ d) for j in range(S)]


def _q2_bc(pack, x):
    """pack.q2 broadcast against [2, .., C, N]-shaped data pairs."""
    sh = (1,) * (x.ndim - 3) + (-1, 1)
    return (pack.q2[0].reshape(sh), pack.q2[1].reshape(sh))


def _cross_fwd(x, scal, pack, axis, S, s, k):
    """One cross-shard Cooley-Tukey stage inside shard_map.

    x: [2, .., C, L] (any batch dims between); scal: [2, C]."""
    d = 1 << (k - 1 - s)
    i = jax.lax.axis_index(axis)
    is_U = ((i & d) == 0)
    other = jax.lax.ppermute(x, axis, _xor_perm(S, d))
    U = jnp.where(is_U, x, other)
    O = jnp.where(is_U, other, x)
    V = ops.mont_enter_scalar(O, scal, pack)
    q2 = _q2_bc(pack, x)
    even = _cs(u64.add((U[0], U[1]), (V[0], V[1])), q2)
    odd = _cs(u64.sub(u64.add((U[0], U[1]), q2), (V[0], V[1])), q2)
    lo = jnp.where(is_U, even[0], odd[0])
    hi = jnp.where(is_U, even[1], odd[1])
    return u64.pack(lo, hi)


def _cross_inv(x, scal, pack, axis, S, s, k):
    """One cross-shard Gentleman-Sande stage inside shard_map."""
    d = 1 << (k - 1 - s)
    i = jax.lax.axis_index(axis)
    is_U = ((i & d) == 0)
    other = jax.lax.ppermute(x, axis, _xor_perm(S, d))
    U = jnp.where(is_U, x, other)
    V = jnp.where(is_U, other, x)
    q2 = _q2_bc(pack, x)
    s_add = _cs(u64.add((U[0], U[1]), (V[0], V[1])), q2)
    diff = _cs(u64.sub(u64.add((U[0], U[1]), q2), (V[0], V[1])), q2)
    W = ops.mont_enter_scalar(u64.pack(*diff), scal, pack)
    lo = jnp.where(is_U, s_add[0], W[0])
    hi = jnp.where(is_U, s_add[1], W[1])
    return u64.pack(lo, hi)


def _cs(v, q2):
    over = ~u64.lt_signed(v, q2)
    return u64.select(over, u64.sub(v, q2), v)


def _local_pallas_plan(logL, consts, row_tw, lane_tw):
    """Rebuild a local PallasPlan inside shard_map from this shard's
    stacked-plane slices (the inverse kernel runs no_norm, so the aux
    rows of consts are unused — base consts serve all three slots)."""
    from ..ntt import pallas_ntt

    return pallas_ntt.PallasPlan(logL, consts, consts, consts,
                                 row_tw[:, 0], lane_tw[:, 0],
                                 row_tw[:, 0], lane_tw[:, 0])


def _pack_specs(cpack, rns):
    """PartitionSpec tree for a channel-constants LevelPack: the channel
    dimension is always the LAST axis of every leaf."""
    return jax.tree.map(
        lambda x: P(*([None] * (x.ndim - 1)), rns), cpack)


def _dspec(a, rns, axis):
    """PartitionSpec of packed data [2, .., C, N]: channels over rns (if
    2-D), coefficients over the coef axis, batch dims replicated."""
    return P(None, *([None] * (a.ndim - 3)), rns, axis)


def ntt_coef_sharded(a, plan: CoefShardPlan, pre_enter=False):
    """Forward negacyclic NTT of [2, .., C, N] with N sharded over the mesh.

    Bit-exact vs ops.ntt / ops.enter_ntt (natural order in, bit-reversed
    out); batch dims (e.g. the key switcher's [2, P, C, N] part stacks)
    pass through. The local length-L stages run the fused Pallas kernels
    when the plan carries per-shard twiddle planes (make_coef_plan on a
    TPU backend). With plan.rns_axis set, channels are additionally
    sharded (2-D layout). pre_enter fuses the Montgomery entry
    (ops.enter_ntt) into the sharded program."""
    S, k, axis = plan.S, plan.S.bit_length() - 1, plan.axis
    rns = plan.rns_axis
    cpack = plan.pack
    dspec = _dspec(a, rns, axis)

    if plan.pl_row_tw is not None:
        from .. import config
        from ..ntt import pallas_ntt

        def fnp(x, pack, consts, cross_f, row_tw, lane_tw):
            if pre_enter:
                x = ops.mont_enter(x, pack)
            for s in range(k):
                x = _cross_fwd(x, cross_f[:, s, :, 0], pack, axis, S, s, k)
            lp = _local_pallas_plan(plan.pl_logL, consts, row_tw, lane_tw)
            return pallas_ntt.ntt(x, lp,
                                  interpret=config.pallas_interpret)

        return jax.shard_map(
            fnp, mesh=plan.mesh,
            in_specs=(dspec, _pack_specs(cpack, rns),
                      P(None, rns),
                      P(None, None, rns, axis),
                      P(None, axis, rns, None, None),
                      P(None, axis, rns, None)),
            # check_vma=False: the varying-manual-axes checker rejects
            # these bodies because the ppermute stages inside _cross_fwd/
            # _cross_inv mix per-shard ("varying") data with replicated
            # constant planes in ways the static analysis cannot prove
            # consistent; correctness is pinned instead by the bit-exact
            # sharded-vs-single-chip tests (tests/test_coef_shard.py).
            out_specs=dspec, check_vma=False,
        )(a, cpack, plan.pl_consts, plan.cross_f,
          plan.pl_row_tw, plan.pl_lane_tw)

    def fn(x, pack, psi_l, cross_f):
        if pre_enter:
            x = ops.mont_enter(x, pack)
        for s in range(k):
            scal = cross_f[:, s, :, 0]                   # [2, C] local block
            x = _cross_fwd(x, scal, pack, axis, S, s, k)
        local_pack = pack._replace(psi=psi_l, ipsi=psi_l)
        return ops.ntt(x, local_pack)

    shard = jax.shard_map(
        fn, mesh=plan.mesh,
        in_specs=(dspec, _pack_specs(cpack, rns),
                  P(None, rns, axis), P(None, None, rns, axis)),
        out_specs=dspec)
    return shard(a, cpack, plan.psi_l, plan.cross_f)


def intt_coef_sharded(a, plan: CoefShardPlan, post_exit=False,
                      post_reduce=False):
    """Inverse NTT with N^{-1} normalization, coefficient-sharded.

    post_exit / post_reduce fuse the Montgomery exit (REDC) and the
    [0,2q)->[0,q) reduction into the sharded program — the op chain of
    ops.intt_exit / ops.intt_exit_reduce, bit-exactly."""
    S, k, axis = plan.S, plan.S.bit_length() - 1, plan.axis
    rns = plan.rns_axis
    cpack = plan.pack
    dspec = _dspec(a, rns, axis)

    def _post(x, pack):
        x = ops.mont_enter_scalar(x, pack.Ninv, pack)
        if post_exit:
            x = ops.mont_redc(x, pack)
        if post_reduce:
            x = ops.reduce_2q(x, pack)
        return x

    if plan.pl_row_itw is not None:
        from .. import config
        from ..ntt import pallas_ntt

        def fnp(x, pack, consts, cross_i, row_itw, lane_itw):
            lp = _local_pallas_plan(plan.pl_logL, consts, row_itw, lane_itw)
            x = pallas_ntt.intt(x, lp, no_norm=True,
                                interpret=config.pallas_interpret)
            for s in reversed(range(k)):
                x = _cross_inv(x, cross_i[:, s, :, 0], pack, axis, S, s, k)
            return _post(x, pack)

        return jax.shard_map(
            fnp, mesh=plan.mesh,
            in_specs=(dspec, _pack_specs(cpack, rns),
                      P(None, rns),
                      P(None, None, rns, axis),
                      P(None, axis, rns, None, None),
                      P(None, axis, rns, None)),
            # check_vma=False: the varying-manual-axes checker rejects
            # these bodies because the ppermute stages inside _cross_fwd/
            # _cross_inv mix per-shard ("varying") data with replicated
            # constant planes in ways the static analysis cannot prove
            # consistent; correctness is pinned instead by the bit-exact
            # sharded-vs-single-chip tests (tests/test_coef_shard.py).
            out_specs=dspec, check_vma=False,
        )(a, cpack, plan.pl_consts, plan.cross_i,
          plan.pl_row_itw, plan.pl_lane_itw)

    def fn(x, pack, ipsi_l, cross_i):
        local_pack = pack._replace(psi=ipsi_l, ipsi=ipsi_l)
        x = ops.intt_no_norm(x, local_pack)
        for s in reversed(range(k)):
            scal = cross_i[:, s, :, 0]
            x = _cross_inv(x, scal, pack, axis, S, s, k)
        return _post(x, pack)

    shard = jax.shard_map(
        fn, mesh=plan.mesh,
        in_specs=(dspec, _pack_specs(cpack, rns),
                  P(None, rns, axis), P(None, None, rns, axis)),
        out_specs=dspec)
    return shard(a, cpack, plan.ipsi_l, plan.cross_i)
