"""RNS-channel sharding helpers.

Design: the channel (RNS residue) axis is the parallel axis, exactly like
the reference's multi-GPU partitioning (reference: src/liberate/ntt/
rns_partition.py:4-37) — per-channel NTTs are chip-local, so the only
cross-chip communication in the whole scheme is:

- the gadget-part accumulation in key switching (psum over parts),
- the dropped-channel broadcast in rescale,
- share aggregation in multiparty protocols (psum over DCN for multi-host).

GSPMD handles all three automatically from the sharding annotations on the
jitted engine pipelines; there is no hand-written collective in the hot
path. Uneven channel counts per level are handled by GSPMD's implicit
padding, mirroring the reference's uneven round-robin deal
(reference: rns_partition.py:29-37).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fhe.data_struct import DataStruct


def make_mesh(num_devices=None, axis_name="rns", devices=None) -> Mesh:
    """A 1-D device mesh over the RNS channel axis."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def rns_sharding(mesh: Mesh, axis_name="rns") -> NamedSharding:
    """Sharding for a packed poly [2, C, N]: channels over the mesh."""
    return NamedSharding(mesh, P(None, axis_name, None))


def _put(x, sharding):
    # Packed polys are [2, C, N] or batched [2, P, C, N]; per-channel
    # constant tables ([C], [2, C]) are small and replicated.
    if hasattr(x, "ndim") and x.ndim >= 3:
        if x.ndim == 4:
            s = NamedSharding(sharding.mesh,
                              P(None, None, *sharding.spec[1:]))
            return jax.device_put(x, s)
        return jax.device_put(x, sharding)
    return jax.device_put(x, NamedSharding(sharding.mesh, P()))


def shard_poly(x, mesh: Mesh, axis_name="rns"):
    """Place one packed polynomial with its channel axis over the mesh."""
    return _put(x, rns_sharding(mesh, axis_name))


def shard_datastruct(ds: DataStruct, mesh: Mesh, axis_name="rns") -> DataStruct:
    """Recursively place a DataStruct's polys channel-sharded on the mesh."""
    sharding = rns_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: _put(x, sharding), ds)


def replicate_datastruct(ds: DataStruct, mesh: Mesh) -> DataStruct:
    """Fully replicate (for small structures like plaintexts)."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), ds)
