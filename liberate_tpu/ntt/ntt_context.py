"""NTT context: per-level packed modular constants for the TPU ops.

The reference pre-packages per-(device, level, part) argument bundles so the
hot path never recomputes constants (reference: src/liberate/ntt/
ntt_context.py:138-527). Here the same role is played by ``LevelPack``
pytrees of packed uint32-limb jnp arrays, built lazily per
(level, mult_type) and per key-switching part. The packs are passed as
arguments into jitted pipelines (not closed over), so XLA treats them as
runtime inputs, and they shard along the channel axis like the data.

Channel layout: the global prime order is q = [scales..., base, specials...]
(reference: ckks_context.py:237-260). At level l the alive channels are the
contiguous suffix q[l:]; mult_type -1 excludes the trailing special primes,
-2 includes them. Montgomery-form constants that the reference materializes
with device kernels (e.g. the psi banks, entered into Montgomery form at
init — reference: ntt_context.py:115-130) are reproduced here with the
golden model so the representatives are bit-identical.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from . import golden, u64
from .rns_partition import RnsPartition


class LevelPack(NamedTuple):
    """Per-channel modular constants for one (level, mult_type) layout."""
    ql: jnp.ndarray          # [C] uint32, low 31 bits of q
    qh: jnp.ndarray          # [C] uint32, bits 31.. of q
    kl: jnp.ndarray          # [C] uint32, low 31 bits of k = -q^{-1} mod R
    kh: jnp.ndarray          # [C] uint32
    q2: jnp.ndarray          # [2, C] packed 2q
    Rs: jnp.ndarray          # [2, C] packed R^2 mod q
    Rs_scale: jnp.ndarray    # [2, C] packed R^2 * scale mod q
    Ninv: jnp.ndarray        # [2, C] packed N^{-1} R mod q
    psi: Optional[jnp.ndarray]   # fwd twiddle bank [2, C, N], bit-reversed
    ipsi: Optional[jnp.ndarray]  # inv twiddle bank [2, C, N]
    # Fused TPU kernel plan (pallas_ntt.PallasPlan) or None -> XLA path.
    # Presence/absence is part of the pytree structure, so jit dispatch
    # between the two backends is a trace-time decision.
    pallas: Optional[object] = None
    # MXU (matmul) NTT backend: a channel-restricted view of the ONE
    # master MxuPlan (see config.use_mxu_ntt); None -> pallas/XLA path.
    mxu: Optional[object] = None
    # Coefficient-sharded transform plan (parallel.coef_shard.CoefShardPlan)
    # for meshes with a 'coef' axis: ops.ntt/intt dispatch the transform
    # into shard_map with cross-shard ppermute stages. None -> local N.
    coef: Optional[object] = None


class PartPlan(NamedTuple):
    """Precomputed tables for one gadget part of the hybrid key switch.

    Mirrors the Y/L/L_enter divided-difference tables of the reference
    (reference: ntt_context.py:315-412).
    """
    part_id: int
    prime_idx: tuple         # global prime indices of the (alive) part
    local_start: int         # channel offset within the level's layout
    alpha: int
    pack: LevelPack          # pack restricted to the part channels
    # Basis conversion scalars. Y_scalar[i] applies on channel prime_idx[i+1];
    # L_scalar[i] applies on channels prime_idx[i+2:]; L_enter[i] covers the
    # full level-0 with-special layout (slice by level offset at use).
    Y_scalar: Optional[jnp.ndarray]       # [2, alpha-1]
    L_scalar: tuple                       # tuple of [2, len] packed
    L_enter: Optional[tuple]              # tuple of [2, C0_sp] packed
    # Shoup-form basis-extension tables (config.use_shoup_extend): per
    # divided-difference term a (w, wp, cadj) triple over the full
    # level-0 with-special layout — w = L_i mod q (plain),
    # wp = floor(w*2^64/q), cadj = 2q - (2^63 * w mod q) (the offset
    # correction for wrapped-signed operands). Empty tuple for alpha=1.
    L_enter_sh: tuple = ()


def _pack_ints(vals) -> np.ndarray:
    """List of Python ints -> packed uint32 [2, len] (numpy)."""
    return u64.from_int64_np(np.array([v & ((1 << 64) - 1) for v in vals],
                                      dtype=np.uint64).astype(np.int64))


class NttContext:
    def __init__(self, ctx, num_devices: int = 1, verbose: bool = False,
                 channel_quantum: int = 1, mesh=None, mesh_axis: str = "rns"):
        """channel_quantum: pad every channel axis to a multiple of this (the
        mesh size), so channel-sharded placement never hits GSPMD's
        divisibility restriction — the TPU answer to the reference's uneven
        round-robin channel deal (reference: rns_partition.py:29-37).
        Padding repeats the last real channel's constants; real channels are
        always the contiguous prefix. mesh: when given, full-width pack
        arrays are placed channel-sharded over its ``mesh_axis`` so sharding
        propagates from the packs through every jitted pipeline."""
        self.ctx = ctx
        self.num_devices = num_devices
        self.channel_quantum = int(channel_quantum)
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # 2-D ('rns', 'coef') layout: a mesh axis named 'coef' shards the
        # COEFFICIENT axis; packs then carry CoefShardPlans and ops.ntt
        # dispatches into shard_map (parallel.coef_shard). The rns axis
        # (if present and >1) shards channels as in the 1-D layout.
        self.coef_axis = None
        if mesh is not None and "coef" in mesh.axis_names \
                and mesh.shape["coef"] > 1:
            self.coef_axis = "coef"

        self.num_ordinary_primes = ctx.num_scales + 1
        self.num_special_primes = ctx.num_special_primes
        self.num_levels = ctx.num_scales + 1
        self.total_channels = len(ctx.q)

        self.p = RnsPartition(self.num_ordinary_primes,
                              self.num_special_primes, num_devices)

        self._build_master_tables()
        self._level_packs = {}
        self._part_plans = {}
        self._mxu_master = None
        self._mxu_groups = None

        # Per-level channel-slice starts (into level-0 key layout).
        self.starts = list(range(self.num_levels))

    # -- master numpy tables ---------------------------------------------------

    def _build_master_tables(self):
        ctx = self.ctx
        C = self.total_channels
        N = ctx.N

        self.q_list = list(ctx.q)
        self._ql = np.array(ctx.q_lower_bits, dtype=np.uint32)
        self._qh = np.array(ctx.q_higher_bits, dtype=np.uint32)
        self._kl = np.array(ctx.k_lower_bits, dtype=np.uint32)
        self._kh = np.array(ctx.k_higher_bits, dtype=np.uint32)
        self._q2 = _pack_ints(ctx.q_double)
        self._Rs = _pack_ints(ctx.R_square)

        scale = 2 ** ctx.scale_bits
        self._Rs_scale = _pack_ints(
            [(Rs * scale) % q for Rs, q in zip(ctx.R_square, ctx.q)]
        )
        self._Ninv = _pack_ints(
            [(ninv * ctx.R) % q for ninv, q in zip(ctx.N_inv, ctx.q)]
        )

        # psi banks in Montgomery form with the reference's exact lazy
        # representatives: produced by the golden REDC, like the reference's
        # device-side mont_enter at init (reference: ntt_context.py:115-130).
        psi = np.array(ctx.psi, dtype=np.int64)       # [C, N]
        ipsi = np.array(ctx.psi_inv, dtype=np.int64)  # [C, N]
        Rs_col = np.array(ctx.R_square, dtype=np.int64)[:, None]
        qlc = self._ql.astype(np.int64)[:, None]
        qhc = self._qh.astype(np.int64)[:, None]
        klc = self._kl.astype(np.int64)[:, None]
        khc = self._kh.astype(np.int64)[:, None]
        psi_m = golden.mont_mult(psi, Rs_col, qlc, qhc, klc, khc)
        ipsi_m = golden.mont_mult(ipsi, Rs_col, qlc, qhc, klc, khc)
        self._psi_mont = u64.from_int64_np(psi_m)     # [2, C, N] uint32
        self._ipsi_mont = u64.from_int64_np(ipsi_m)
        self.logN = ctx.logN

    # -- channel ranges ----------------------------------------------------------

    def channel_range(self, level: int, mult_type: int):
        """(start, stop) slice of the global prime order for this layout."""
        start = level
        stop = (self.total_channels if mult_type == -2
                else self.num_ordinary_primes)
        return start, stop

    def num_channels(self, level: int, mult_type: int) -> int:
        start, stop = self.channel_range(level, mult_type)
        return stop - start

    def padded_channels(self, level: int, mult_type: int) -> int:
        """Channel-axis width after padding to the channel quantum."""
        C = self.num_channels(level, mult_type)
        Q = self.channel_quantum
        return -(-C // Q) * Q

    def q_ints(self, level: int, mult_type: int):
        start, stop = self.channel_range(level, mult_type)
        return self.q_list[start:stop]

    # -- pack construction ---------------------------------------------------------

    def _place(self, x):
        """Materialize a pack constant; channel-sharded when a mesh is set.

        Pack layouts put the channel axis at position -1 ([C]), or at
        position 1 of [2, C] / [2, C, N]."""
        if self.mesh is None:
            return jnp.asarray(x)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = self.mesh_axis if self.mesh_axis in self.mesh.axis_names \
            else None
        spec = (P(ax) if x.ndim == 1
                else P(None, ax)
                if x.ndim == 2 else P(None, ax, self.coef_axis))
        return jax.device_put(np.asarray(x), NamedSharding(self.mesh, spec))

    def _make_pack(self, idx, with_psi=True, pad_to=None,
                   sharded=False) -> LevelPack:
        """Build a LevelPack over an arbitrary channel index list/slice.

        pad_to: extend the channel set to this width by repeating the last
        index (the multi-chip padding convention — see fit_channels).
        """
        idx = np.asarray(idx)
        if pad_to is not None and pad_to > idx.size:
            idx = np.concatenate(
                [idx, np.full(pad_to - idx.size, idx[-1], dtype=idx.dtype)])
        place = self._place if sharded else jnp.asarray
        psi = ipsi = None
        pallas_plan = None
        mxu_ref = None
        coef_plan = None
        if with_psi:
            # Full bit-reverse-ordered banks [2, C, N]; stage s addresses
            # entries [2^s : 2^{s+1}) via the shared index banks in ops.
            psi = place(self._psi_mont[:, idx, :])
            ipsi = place(self._ipsi_mont[:, idx, :])
            if self.coef_axis is not None:
                coef_plan = self._maybe_coef_plan(idx, sharded=sharded)
            if coef_plan is None:
                mxu_ref = self._maybe_mxu_ref(idx, sharded=sharded)
            if coef_plan is None and mxu_ref is None:
                pallas_plan = self._maybe_pallas_plan(idx, sharded=sharded)
        return LevelPack(
            pallas=pallas_plan,
            mxu=mxu_ref,
            coef=coef_plan,
            ql=place(self._ql[idx]),
            qh=place(self._qh[idx]),
            kl=place(self._kl[idx]),
            kh=place(self._kh[idx]),
            q2=place(self._q2[:, idx]),
            Rs=place(self._Rs[:, idx]),
            Rs_scale=place(self._Rs_scale[:, idx]),
            Ninv=place(self._Ninv[:, idx]),
            psi=psi,
            ipsi=ipsi,
        )

    def level_pack(self, level: int = 0, mult_type: int = -1) -> LevelPack:
        key = (level, mult_type)
        if key not in self._level_packs:
            start, stop = self.channel_range(level, mult_type)
            self._level_packs[key] = self._make_pack(
                np.arange(start, stop),
                pad_to=self.padded_channels(level, mult_type),
                sharded=True)
        return self._level_packs[key]

    def _maybe_coef_plan(self, idx, sharded=False):
        """A CoefShardPlan for this channel set on a mesh with a 'coef'
        axis. Level packs (sharded) also shard channels over the rns axis
        when it exists and divides; part packs get coef-only plans (their
        channel slices cross rns shard boundaries, like the Pallas case)."""
        from ..parallel.coef_shard import make_coef_plan

        idx = np.asarray(idx)
        rns_ax = None
        if (sharded and self.mesh_axis in self.mesh.axis_names
                and self.mesh.shape[self.mesh_axis] > 1
                and idx.size % self.mesh.shape[self.mesh_axis] == 0):
            rns_ax = self.mesh_axis
        return make_coef_plan(self, self.mesh, axis=self.coef_axis,
                              rns_axis=rns_ax, idx=idx)

    def _maybe_mxu_ref(self, idx, sharded=False):
        """A channel-restricted view of the master MXU plan, when the
        matmul backend is selected (config.use_mxu_ntt).

        The MXU transform's natural-order domain replaces the bit-reversed
        one engine-wide: EVERY with_psi pack (level packs and key-switching
        part packs) must route through it, so the engine never mixes
        domains (see liberate_tpu.config.use_mxu_ntt).

        Single chip: packs carry MxuRef views (static index tuples) of the
        ONE master plan, so device storage is shared and the channel
        gathers trace inside jit. On a 1-D rns mesh the tables are sliced
        EAGERLY instead — a traced gather along the sharded channel axis
        would all-gather ~10 MB/channel of tables per op — and placed
        channel-sharded for level packs / replicated for part packs
        (whose channel slices cross shard boundaries)."""
        from .. import config

        if not config.mxu_enabled():
            return None
        if config.use_mxu_ntt is None and self.logN >= 17:
            # Auto mode skips platinum: the logN=17 kernels' per-channel
            # stage-1 tables are 16 MB (dA*S x dB*S s8 at S=512) — the
            # enter-transform kernel's live set exceeds the 64 MiB
            # scoped-VMEM cap and the full master set costs multiple GB
            # of HBM. The VPU butterfly kernels serve platinum;
            # explicitly setting use_mxu_ntt=True overrides.
            return None
        if self.coef_axis is not None:
            return None   # 2-D meshes: the coef plans own the transform
        from . import mxu_ntt

        idx = np.asarray(idx)
        if self.mesh is None:
            if self._mxu_master is None:
                d = self._mxu_master_tables()
                d = {k: (v if isinstance(v, int) else jnp.asarray(v))
                     for k, v in d.items()}
                self._mxu_master = mxu_ntt.plan_from_dict(
                    d, jnp.asarray(self._ql), jnp.asarray(self._qh),
                    jnp.asarray(self._kl), jnp.asarray(self._kh),
                    jnp.asarray(self._q2))
            return mxu_ntt.MxuRef(self._mxu_master,
                                  tuple(int(i) for i in idx),
                                  groups=self._mxu_group_plans())

        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = sharded and idx.size % self.mesh.devices.size == 0
        d = self._mxu_master_tables()

        def place(x, caxis):
            x = np.take(np.asarray(x), idx, axis=caxis)
            if not shard:
                return jnp.asarray(x)
            spec = P(*([None] * caxis), self.mesh_axis,
                     *([None] * (x.ndim - caxis - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        kw = {k: (v if isinstance(v, int)
                  else place(v, 1 if k in mxu_ntt._C_AXIS1 else 0))
              for k, v in d.items()}
        plan = mxu_ntt.plan_from_dict(
            kw, place(self._ql, 0), place(self._qh, 0),
            place(self._kl, 0), place(self._kh, 0), place(self._q2, 1))
        return mxu_ntt.MxuRef(
            plan, tuple(range(idx.size)),
            mesh=self.mesh if shard else None,
            mesh_axis=self.mesh_axis, on_mesh=True)

    def _mxu_master_tables(self, ch_lo=None, ch_hi=None, dA=None, dB=None,
                           tag="u"):
        """Host-side MXU table build, disk-cached per parameter set (the
        object-int digit decomposition costs ~2 s/channel at logN=15
        without the native runtime). ch_lo/ch_hi restrict to a channel
        run; dA/dB override the digit parameters (width groups)."""
        import hashlib

        from ..fhe.cache.cache import ensure_cache
        from ..fhe.context.ckks_context import primitive_root_2N
        from . import mxu_ntt

        ctx = self.ctx
        lo = 0 if ch_lo is None else ch_lo
        hi = len(ctx.q) if ch_hi is None else ch_hi
        key = hashlib.sha256(
            f"mxu3_{tag}_{lo}_{hi}_{dA}_{dB}_"
            f"{ctx.logN}_{ctx.buffer_bit_length}_"
            f"{'_'.join(str(q) for q in ctx.q)}".encode()).hexdigest()[:24]
        path = None
        try:
            import os

            path = os.path.join(ensure_cache(), f"mxu_{key}.npz")
            if os.path.exists(path):
                z = np.load(path)
                return {k: (int(z[k]) if z[k].ndim == 0 else z[k])
                        for k in z.files}
        except Exception:
            path = None
        qs = list(ctx.q)[lo:hi]
        psis = [primitive_root_2N(q, ctx.N) for q in qs]
        ipsis = [pow(p, -1, q) for p, q in zip(psis, qs)]
        Rms = [ctx.R % q for q in qs]
        Ninvs = [pow(ctx.N, -1, q) for q in qs]
        d = mxu_ntt.make_plan(ctx.logN, qs, Rms, psis, ipsis, Ninvs,
                              word_bits=ctx.buffer_bit_length,
                              dA=dA, dB=dB)
        d = {k: (v if isinstance(v, int) else np.asarray(v))
             for k, v in d.items()}
        if path is not None:
            try:
                np.savez(path, **{k: np.asarray(v) for k, v in d.items()})
            except Exception:
                pass
        return d

    def _mxu_group_plans(self):
        """Width-grouped master plans ((gstart, gstop, MxuPlan), ...) for
        the fused Pallas MXU kernels (mxu_pallas.dispatch): each
        contiguous run of equal-width moduli gets tables at its own digit
        parameters — the 40-bit scale primes run dA=dB=6 (36 MACs, ~56%
        of the table bytes) vs the uniform 62-bit (8, 8)."""
        from .. import config
        from . import mxu_ntt

        if not config.use_mxu_pallas:
            return ()
        if self._mxu_groups is None:
            groups = []
            for gi, (s, e, (dA, dB)) in enumerate(
                    mxu_ntt.width_groups(self.ctx.q)):
                d = self._mxu_master_tables(s, e, dA, dB, tag=f"g{gi}")
                d = {k: (v if isinstance(v, int) else jnp.asarray(v))
                     for k, v in d.items()}
                sl = slice(s, e)
                plan = mxu_ntt.plan_from_dict(
                    d, jnp.asarray(self._ql[sl]), jnp.asarray(self._qh[sl]),
                    jnp.asarray(self._kl[sl]), jnp.asarray(self._kh[sl]),
                    jnp.asarray(self._q2[:, sl]))
                groups.append((s, e, plan))
            self._mxu_groups = tuple(groups)
        return self._mxu_groups

    def _maybe_pallas_plan(self, idx, sharded=False):
        """A pallas_ntt plan for this channel set, when the Pallas backend
        is enabled (TPU) and the transform is large enough (logN >= 8).
        ``sharded``: this is a mesh-wide level pack — build a
        channel-sharded plan that runs under shard_map."""
        from .. import config

        # logN >= 16 uses the split (row-chunk/lane-tiled) kernels, with
        # large-m row stages executed in the transposed domain and the
        # engine hot path all-unsigned (basis-extension outputs are
        # canonicalized). Platinum (logN=17, R=1024) additionally needs
        # the raised Mosaic scoped-VMEM cap that liberate_tpu.config sets
        # via LIBTPU_INIT_ARGS: the round-1 "non-deterministic compile
        # crash" was the row-stage kernels' ~17 MiB live set against the
        # default 16 MiB scoped-vmem limit.
        if self.mesh is not None and not sharded:
            # Part packs and other unsharded channel subsets keep the XLA
            # path on a mesh (their data slices cross shard boundaries).
            return None
        if self.channel_quantum > 1 and self.mesh is None:
            return None
        if not config.pallas_enabled() or not (8 <= self.logN <= 17):
            return None
        from . import pallas_ntt

        ctx = self.ctx
        psi_u64 = (self._psi_mont[0, idx].astype(np.uint64)
                   | (self._psi_mont[1, idx].astype(np.uint64) << 32))
        ipsi_u64 = (self._ipsi_mont[0, idx].astype(np.uint64)
                    | (self._ipsi_mont[1, idx].astype(np.uint64) << 32))
        q = [ctx.q[i] for i in idx]
        psi_plain = ipsi_plain = None
        if config.use_shoup_twiddles:
            # Plain-form banks for the Shoup constant-multiply path
            # (ctx.psi/psi_inv are the reference's bit-reversed banks).
            psi_plain = np.array(ctx.psi, dtype=np.int64)[idx]
            ipsi_plain = np.array(ctx.psi_inv, dtype=np.int64)[idx]
        plan = pallas_ntt.make_plan(
            self.logN,
            q,
            [ctx.k[i] for i in idx],
            [ctx.R_square[i] for i in idx],
            [(ctx.N_inv[i] * ctx.R) % ctx.q[i] for i in idx],
            psi_u64, ipsi_u64,
            psi_bank_plain=psi_plain, ipsi_bank_plain=ipsi_plain,
        )
        if self.mesh is not None:
            # Channel-sharded plan: the kernels run per-shard under
            # jax.shard_map (pallas_ntt._sharded_transform); idx is already
            # padded to the channel quantum (= mesh size multiple), so
            # every shard gets an equal local block.
            if idx.size % self.mesh.devices.size != 0:
                return None
            plan = self._shard_plan(plan)
        return plan

    def _shard_plan(self, plan):
        """Place every plan leaf channel-sharded over the mesh."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from . import pallas_ntt

        ax = self.mesh_axis

        def place(x):
            spec = (P(None, ax) if x.ndim == 2
                    else P(None, ax, *([None] * (x.ndim - 2))))
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        leaves, _ = plan.tree_flatten()
        return pallas_ntt.PallasPlan(
            plan.logN, *[place(x) for x in leaves],
            mesh=self.mesh, mesh_axis=ax)

    def pallas_plan(self, level: int = 0, mult_type: int = -1):
        """The Pallas plan of a level pack (None on the XLA backend)."""
        return self.level_pack(level, mult_type).pallas

    # -- key-switching part plans -----------------------------------------------

    def parts(self, level: int):
        """Gadget parts at this level (ordinary primes only; the single-device
        partition view of the plan — placement over a mesh happens in
        liberate_tpu.parallel)."""
        if level not in self._part_plans:
            self._part_plans[level] = self._build_parts(level)
        return self._part_plans[level]

    def _build_parts(self, level: int):
        ctx = self.ctx
        R = ctx.R
        plans = []
        # Parts partition the alive ordinary primes [level, num_ordinary).
        # Global partition j covers primes [j*alpha, (j+1)*alpha) plus the
        # base-prime partition; at a level the lowest partition may be
        # partial (reference: rns_partition.py:93-117).
        alpha0 = self.num_special_primes
        nscale = self.num_ordinary_primes - 1
        num_partitions = -(-nscale // alpha0)
        bounds = [0] + [min((j + 1) * alpha0, nscale)
                        for j in range(num_partitions)] + [nscale + 1]
        local = 0
        for j in range(len(bounds) - 1):
            # part_id = j is the GLOBAL partition index: a level-l part must
            # address the ksk component generated for the same partition at
            # level 0 (reference: parts_alloc mapping, ckks_engine.py:923).
            part_id = j
            lo, hi = max(bounds[j], level), bounds[j + 1]
            if hi <= lo:
                continue
            prime_idx = tuple(range(lo, hi))
            alpha = len(prime_idx)
            m = [ctx.q[i] for i in prime_idx]

            # Divided-difference tables (reference: ntt_context.py:328-347).
            L = [m[0]]
            for i in range(1, alpha - 1):
                L.append(L[-1] * m[i])
            Y_scalar, L_scalar, L_enter = None, (), None
            if alpha > 1:
                ys = []
                for i in range(alpha - 1):
                    L_inv = pow(L[i], -1, m[i + 1])
                    ys.append((L_inv * R) % m[i + 1])
                Y_scalar = jnp.asarray(_pack_ints(ys))
                ls = []
                for i in range(alpha - 2):
                    ls.append(jnp.asarray(_pack_ints(
                        [(L[i] * R) % m[jj] for jj in range(i + 2, alpha)]
                    )))
                L_scalar = tuple(ls)
                # L_enter over the full level-0 with-special layout
                # (reference: ntt_context.py:349-363), extended by the
                # channel quantum so a level's padded-width slice
                # [level : level + W_sp] never runs past the end.
                q_ext = list(ctx.q) + [ctx.q[-1]] * self.channel_quantum
                Rs_ext = (list(ctx.R_square)
                          + [ctx.R_square[-1]] * self.channel_quantum)
                le = []
                le_sh = []
                for i in range(alpha - 1):
                    le.append(jnp.asarray(_pack_ints(
                        [(L[i] * Rs) % q
                         for q, Rs in zip(q_ext, Rs_ext)]
                    )))
                    ws = [L[i] % q for q in q_ext]
                    le_sh.append((
                        jnp.asarray(_pack_ints(ws)),
                        jnp.asarray(_pack_ints(
                            [(w << 64) // q for w, q in zip(ws, q_ext)])),
                        jnp.asarray(_pack_ints(
                            [2 * q - ((w << 63) % q)
                             for w, q in zip(ws, q_ext)])),
                    ))
                L_enter = tuple(le)
                L_enter_sh = tuple(le_sh)
            else:
                L_enter_sh = ()

            plans.append(PartPlan(
                part_id=part_id,
                prime_idx=prime_idx,
                local_start=local,
                alpha=alpha,
                pack=self._make_pack(np.array(prime_idx)),
                Y_scalar=Y_scalar,
                L_scalar=L_scalar,
                L_enter=L_enter,
                L_enter_sh=L_enter_sh,
            ))
            local += alpha
        return plans
