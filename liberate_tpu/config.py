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

# Fused Pallas mod-down (special-prime removal): keeps the whole n_sp
# iteration loop in VMEM on full (8,128) tiles; the composed XLA chain
# materializes ~5*n_sp intermediates in HBM with degenerate T(1,128)
# layouts (~1/8 vector utilization). Bit-exact with the composed ops
# (tests/test_fused_moddown.py). OFF: the kernel's XLA-side compile on
# the remote TPU compiler did not terminate within 40 minutes (round 2);
# root cause open.
use_fused_moddown = False

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
# 2-D coef meshes keep the coef-shard transforms. OFF pending the
# on-device A/B vs the fused Pallas kernels.
use_mxu_ntt = False

# Tiled (4-D view) basis extension: pre_extend/extend computed on the
# [C, N/128, 128] pair view — the divided-difference rows are
# single-channel [2, 1, N] arrays that XLA otherwise tiles T(1,128)
# (1/8 vector utilization). Bit-exact with the flat chain
# (tests/test_engine.py::test_tiled_extend_bit_exact).
use_tiled_extend = False

# Tiled (4-D view) XLA rescale: _rescale_core computed on a
# [2, C, N/128, 128] view — same rationale as use_tiled_moddown below.
# Bit-exact (tests/test_engine.py::test_tiled_rescale_bit_exact).
use_tiled_rescale = False

# Tiled (4-D view) XLA mod-down: the same composed chain computed on a
# [2, C, N/128, 128] view, so the dropped-channel broadcast operand is
# [2, 1, R, 128] (full 8-sublane tiles) instead of [2, 1, N] (T(1,128)
# degenerate tiling, 1/8 vector utilization). Bit-exact with the flat
# chain (tests/test_fused_moddown.py::test_tiled_matches_composed).
use_tiled_moddown = False


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
