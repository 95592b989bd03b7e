"""Multi-chip execution: RNS-channel sharding over a jax Mesh.

The reference's multi-GPU story is hand-rolled: per-device tensor lists,
pinned-host staging buffers, and explicit peer copies
(reference: src/liberate/ntt/rns_partition.py, ckks_engine.py:746-904).
The TPU-native equivalent is a sharding annotation: every polynomial is one
logical [2, C, N] array whose RNS channel axis is laid out over the mesh
axis ``rns``; XLA's SPMD partitioner turns the engine's jitted pipelines
into per-chip programs and inserts ICI collectives exactly where the
reference does manual transfers (ksk part accumulation -> psum, rescale
channel broadcast -> collective-broadcast).
"""

from .sharding import (
    make_mesh,
    make_mesh2d,
    shard_poly,
    shard_datastruct,
    replicate_datastruct,
    rns_sharding,
    pad_channels_to,
)

__all__ = [
    "make_mesh",
    "make_mesh2d",
    "shard_poly",
    "shard_datastruct",
    "replicate_datastruct",
    "rns_sharding",
    "pad_channels_to",
]
