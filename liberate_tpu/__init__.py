"""liberate_tpu — a TPU-native RNS-CKKS fully homomorphic encryption framework.

A from-scratch JAX/XLA/Pallas implementation of the RNS-CKKS scheme with the
full capability surface of Desilo/liberate-fhe (reference: /root/reference):
leveled CKKS arithmetic, hybrid gadget key switching, Galois rotations,
multiparty (threshold) FHE — redesigned TPU-first:

- 64-bit modular arithmetic emulated with 32-bit limbs (TPU has no 64-bit
  vector ALU); Montgomery multiplication mirrors the reference's REDC
  bit-for-bit (reference: src/liberate/ntt/ntt_cuda_kernel.cu:12-59).
- Negacyclic NTT as logN reshape+elementwise stages (no gathers), fused into
  Pallas kernels on TPU; per-RNS-channel NTTs are chip-local.
- The multi-GPU RNS-channel sharding of the reference
  (src/liberate/ntt/rns_partition.py) becomes a `jax.sharding.Mesh` axis;
  cross-device communication (pinned-buffer copies in the reference) becomes
  ICI collectives under shard_map.
- Replicated common randomness comes from counter-keyed ChaCha20 streams:
  identical (key, counter) => identical bits on every chip, so generation
  replaces communication (reference: src/liberate/csprng/csprng.py:33-46).
"""

from .version import VERSION
from . import config
from .fhe.data_struct import DataStruct, data_struct
from .fhe.presets import errors, params, types


def __getattr__(name):
    # Lazy: importing the engine pulls in JAX device state; keep the
    # top-level import light for host-only uses (prime generation, etc.).
    if name in ("CkksEngine", "ckks_engine"):
        from .fhe.engine import CkksEngine
        return CkksEngine
    raise AttributeError(name)

__all__ = [
    "VERSION",
    "CkksEngine",
    "ckks_engine",
    "DataStruct",
    "data_struct",
    "params",
    "types",
    "errors",
]
