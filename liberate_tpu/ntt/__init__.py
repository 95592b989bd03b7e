from . import golden, ops, u64
from .ntt_context import LevelPack, NttContext, PartPlan
from .rns_partition import RnsPartition, rns_partition

__all__ = [
    "golden", "ops", "u64",
    "NttContext", "LevelPack", "PartPlan",
    "RnsPartition", "rns_partition",
]
