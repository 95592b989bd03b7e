"""RNS-channel sharding helpers.

Design: the channel (RNS residue) axis is the parallel axis, exactly like
the reference's multi-GPU partitioning (reference: src/liberate/ntt/
rns_partition.py:4-37) — per-channel NTTs are chip-local, so the only
cross-chip communication in the whole scheme is:

- the gadget-part basis-extension state broadcast in key switching,
- the dropped-channel broadcast in rescale / special-prime mod-down,
- share aggregation in multiparty protocols (psum over DCN for multi-host).

GSPMD inserts all of these automatically from the sharding annotations on
the jitted engine pipelines; there is no hand-written collective in the
hot path. Uneven channel counts (the common case — the reference deals
channels round-robin, rns_partition.py:29-37) are handled by PADDING every
channel axis to a multiple of the mesh size ("channel quantum"): real
channels are a contiguous prefix, padding repeats the last real channel's
constants so padded rows stay bounded and are never read back. Build the
engine with ``CkksEngine(mesh=make_mesh(n))`` and all keys/ciphertexts are
born padded + sharded; use ``shard_datastruct`` only to import
externally-produced (host) data onto a mesh.
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


def make_mesh2d(n_rns: int, n_coef: int, rns_axis="rns", coef_axis="coef",
                devices=None) -> Mesh:
    """A 2-D ('rns', 'coef') mesh: channels over one axis, coefficients
    over the other (see liberate_tpu.parallel.coef_shard). The coef axis
    is the minor (fastest-varying) one so a shard's cross-stage ppermute
    partners are ICI neighbors."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[:n_rns * n_coef]).reshape(n_rns, n_coef)
    return Mesh(devices, (rns_axis, coef_axis))


def rns_sharding(mesh: Mesh, axis_name="rns") -> NamedSharding:
    """Sharding for a packed poly [2, C, N]: channels over the mesh."""
    return NamedSharding(mesh, P(None, axis_name, None))


def pad_channels_to(x, quantum: int):
    """Pad the channel axis (-2) of a packed poly up to a mesh multiple.

    Edge padding repeats the last real channel — consistent with the
    engine's padded pack constants (see liberate_tpu.ntt.ops.fit_channels).
    """
    C = x.shape[-2]
    W = -(-C // quantum) * quantum
    if W == C:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, W - C)
    return np.pad(np.asarray(x), pad, mode="edge")


def _put(x, mesh, axis_name):
    # Packed polys are [2, C, N] or batched [2, P, C, N]; per-channel
    # constant tables ([C], [2, C]) are small and replicated.
    if hasattr(x, "ndim") and x.ndim >= 3:
        n = mesh.devices.size
        x = pad_channels_to(x, n)
        spec = P(*([None] * (x.ndim - 2)), axis_name, None)
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_poly(x, mesh: Mesh, axis_name="rns"):
    """Place one packed polynomial with its channel axis over the mesh."""
    return _put(x, mesh, axis_name)


def shard_datastruct(ds: DataStruct, mesh: Mesh, axis_name="rns") -> DataStruct:
    """Place a DataStruct's polys channel-sharded on the mesh, padding
    uneven channel counts to the mesh size.

    For data produced by a mesh-aware engine this is a no-copy (already
    padded + sharded); use it to import host/single-chip data.
    """
    return jax.tree_util.tree_map(lambda x: _put(x, mesh, axis_name), ds)


def replicate_datastruct(ds: DataStruct, mesh: Mesh) -> DataStruct:
    """Fully replicate (for small structures like plaintexts)."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), ds)
