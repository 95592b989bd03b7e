"""Global backend configuration.

The compute path is chosen per polynomial-op at trace time:

- "pallas": fused TPU kernels (liberate_tpu.ntt.pallas_ntt) — the NTT/iNTT
  run all stages in VMEM (13x faster than the XLA fallback on v5e).
- "xla": portable jnp path (ops.py) — used on CPU, for the virtual-device
  sharded mesh (GSPMD cannot partition pallas_call automatically), and as
  the bit-exact oracle for the kernels.

Resolution: ``use_pallas`` tristate; None (default) auto-detects TPU.
"""

import os

# Mosaic allocates each Pallas kernel's live set on a scoped-VMEM stack
# capped at 16 MiB by default; the platinum-width (logN=17, R=1024) NTT
# row-stage kernels need ~17 MiB. Raise the cap to 64 MiB (v5e has 128 MiB
# VMEM) — must be in the env before the TPU plugin snapshots it at first
# compile, which importing liberate_tpu before any TPU use guarantees.
if "xla_tpu_scoped_vmem_limit_kib" not in os.environ.get(
        "LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

# None = auto (TPU -> pallas), True/False = forced.
use_pallas = None

# Run Pallas kernels in interpreter mode (testing on CPU).
pallas_interpret = False

# Fused key-switch kernel (pallas_ntt.ntt_ksk_accum): ident-canon + NTT +
# both ksk multiplies + part accumulation in one kernel. Bit-exact
# (tests/test_fused_switch.py) and 1.5x faster than the composed path on
# v5e under execution-synced timing (24.1 vs 35.7 ms/mult at silver):
# the composed chain's ksk multiplies and part folds round-trip HBM in
# degenerate T(1,128) layouts, while the fused kernel keeps them on full
# (8,128) tiles in VMEM. (A round-1 note claimed the opposite from
# enqueue-rate timings; see BASELINE.md "Measurement methodology".)
use_fused_switch = True

# (A fused Pallas mod-down kernel existed rounds 2-4 but never shipped:
# its XLA-side compile on the remote TPU service did not terminate, and
# the Shoup plain-domain mod-down (use_shoup_moddown below) + the tiled
# XLA variant (use_tiled_moddown) supersede it. Removed in round 5.)

# MXU (matmul) NTT backend: the transform as int8 einsums on the
# systolic array (liberate_tpu.ntt.mxu_ntt) instead of VPU butterflies.
# O(N sqrt N) int8 MACs at ~394 TOPS replace the O(N log N) emulated
# 62-bit Montgomery multiplies (~60 VPU ops each); the VPU keeps one
# twiddle multiply + two digit recombinations per element. Output is
# NATURAL order (the classic kernels are bit-reversed) — valid because
# the engine only uses the NTT domain pointwise and permutes in the
# coefficient domain, but one engine instance must use ONE backend
# throughout (multiparty peers must agree). Bit-exactness is by
# pointwise-domain equivalence (tests/test_mxu.py, test_engine
# mxu-backend smoke). Works single-chip and on 1-D rns meshes (tables
# sliced eagerly: level packs channel-sharded, part packs replicated);
# 2-D coef meshes keep the coef-shard transforms.
#
# Tristate like use_pallas: None (default) = auto — ON on TPU (where the
# fused VMEM kernels run), OFF elsewhere (CPU tests keep the classic
# bit-reversed oracle paths). History: the round-2 XLA einsum composition
# lost the round-3 A/B (44.6 ms vs 26.8 base at silver — HBM round-trips
# of the int32 digit intermediates); the round-4 fused VMEM kernels
# (use_mxu_pallas) win it once the round-5 multi-consumer fusion fix
# landed: 7.34 vs 8.76 ms/mult at silver on v5e (benchmarks/ab_tiled.py
# mxu_pl vs base, execution-synced, correctness-checked).
use_mxu_ntt = None

# Fused Pallas MXU kernels for the matmul NTT backend (mxu_pallas.py):
# the whole digitize -> int8 MXU matmul -> recombine -> twiddle ->
# matmul -> recombine chain of one channel runs VMEM-resident in one
# kernel, instead of the XLA einsum composition whose int32 digit
# intermediates round-trip HBM. Only meaningful with use_mxu_ntt=True;
# bit-exact with the XLA composition (tests/test_mxu_pallas.py).
use_mxu_pallas = True

# Phase-split transforms: run the row-stage and lane-stage phases of the
# fused NTT/iNTT as SEPARATE Pallas kernels at every size (the logN>=16
# path always splits), and hoist the iNTT's N^-1-normalize / Montgomery-
# exit / reduce chain out of the kernels into XLA ops (identical op
# order, bit-exact). Round-3 on-device A/B (benchmarks/ntt_probe4.py,
# device-loop timing, v5e, logN=15 C=17): inverse 1.80 -> 1.50 ms from
# the split alone (1.06 ms with SMALL_T masked-roll stages on top);
# forward unchanged (0.62 ms). The extra HBM round trip between phases
# costs ~30 us and buys Mosaic smaller kernels it schedules better.
use_split_transform = True

# Shoup constant-multiply twiddle path: the Pallas plans carry PLAIN
# twiddles plus precomputed quotients wp = floor(w*2^64/q), and every
# butterfly multiply runs r = w*x - mulhi64(wp, x)*q instead of the
# Montgomery REDC — 2.4x faster on the v5e VPU (56.7 -> 24.0 us/channel
# for a 15-multiply chain, benchmarks/ntt_probe6.py), and the transforms
# are ~100% twiddle-multiply-bound (ntt_probe5: the interleaves cost
# 2.4 us/channel of the 36.6 total). Same values mod q with DIFFERENT
# [0, 2q) lazy representatives — turn OFF for bit-exact parity with the
# reference CUDA kernel chains (the golden-model tests pin both modes).
use_shoup_twiddles = True

# Phase-split key-switch core: canon+row kernel -> lane kernel -> ksk
# multiply+part-accumulate kernel, instead of the single fused
# ntt_ksk_accum kernel (same rationale as use_split_transform). Also
# extends the Pallas switch to every transform size (the single fused
# kernel was gated at R <= SPLIT_ROWS).
use_split_switch = True

# Tiled (4-D view) basis extension: pre_extend/extend computed on the
# [C, N/128, 128] pair view — the divided-difference rows are
# single-channel [2, 1, N] arrays that XLA otherwise tiles T(1,128)
# (1/8 vector utilization). Bit-exact with the flat chain
# (tests/test_engine.py::test_tiled_extend_bit_exact). ON: neutral alone
# (26.6 vs 26.8 ms base) but part of the winning "all" set in the
# round-3 on-device A/B (benchmarks/ab_tiled.py: all=20.9 ms vs
# base=26.8 ms at silver).
use_tiled_extend = True

# Tiled (4-D view) XLA rescale: _rescale_core computed on a
# [2, C, N/128, 128] view — same rationale as use_tiled_moddown below.
# Bit-exact (tests/test_engine.py::test_tiled_rescale_bit_exact).
# ON: 25.4 vs 26.8 ms base alone (round-3 on-device A/B at silver).
use_tiled_rescale = True

# Shoup-form (plain-domain) pointwise chains. Like use_shoup_twiddles,
# these replace Montgomery constant-multiplies with Shoup precomputed-
# quotient multiplies (u64.shoup_mul / u64.barrett_2q) — same values
# mod q, different [0, 2q) lazy representatives, ~30-50% fewer VPU ops
# per element on the chain they cover. OFF restores the bit-exact
# reference-parity Montgomery chains (tests/test_shoup_chains.py pins
# mod-q equivalence of every pair).
#
# use_shoup_moddown: the key-switch special-prime removal runs entirely
# in the plain domain — no Montgomery enter, the dropped-channel tile is
# Barrett-reduced, each P_j^{-1} multiply is a Shoup multiply, and the
# final Montgomery exit disappears.
use_shoup_moddown = True

# use_shoup_rescale: (d - s) * q_l^{-1} with s Barrett-reduced per target
# channel and the scalar multiply in Shoup form.
use_shoup_rescale = True

# use_shoup_ksk: store the key-switching key stacks for the fused MXU
# switch in SHOUP form — plain values w = REDC(k_mont) plus precomputed
# quotients wp = floor(w*2^64/q) (u64.shoup_quotient, one-time ~64-step
# device division at key prep) — so the kernel's two ksk products are
# Shoup constant-multiplies instead of Montgomery REDCs (~2.4x cheaper
# per multiply on the VPU; same values mod q, different [0, 2q) lazy
# representatives). Costs 2x ksk bytes streamed per switch, which
# overlaps the compute the multiplies no longer do. Only affects the
# single-chip fused MXU switch path (engine _ksk_stacked).
use_shoup_ksk = True

# use_shoup_extend: the key-switch basis extension emits PLAIN-domain
# [0, 2q) unsigned outputs (divided-difference terms are offset by 2^63
# and corrected with a per-channel constant instead of running the
# signed Montgomery path), which also removes the canon + identity-
# multiply pre-stage from the switch NTT kernels and turns the
# post-accumulation iNTT exit into a plain reduce. Applies on the Pallas
# and XLA paths; the MXU / coef-sharded backends keep the Montgomery
# chain (their domain bookkeeping differs).
use_shoup_extend = True

# Tiled (4-D view) XLA mod-down: the same composed chain computed on a
# [2, C, N/128, 128] view, so the dropped-channel broadcast operand is
# [2, 1, R, 128] (full 8-sublane tiles) instead of [2, 1, N] (T(1,128)
# degenerate tiling, 1/8 vector utilization). Bit-exact with the flat
# chain (tests/test_moddown.py::test_tiled_matches_composed).
# ON: the single biggest tiled win in the round-3 on-device A/B
# (21.3 vs 26.8 ms base alone at silver).
use_tiled_moddown = True


def mxu_enabled() -> bool:
    """Resolve the use_mxu_ntt tristate (None = auto: TPU only).

    Auto keys on the REAL backend, not pallas_enabled(): interpret-mode
    tests force use_pallas=True on CPU to exercise kernels, and that
    must not silently flip the engine into the natural-order MXU domain
    (which would break every bit-reversed-domain oracle comparison)."""
    if use_mxu_ntt is not None:
        return use_mxu_ntt
    env = os.environ.get("LIBERATE_TPU_MXU")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_enabled() -> bool:
    if use_pallas is not None:
        return use_pallas
    env = os.environ.get("LIBERATE_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False
