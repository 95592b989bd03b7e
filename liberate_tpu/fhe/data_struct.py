"""Ciphertext/key container.

The reference uses a NamedTuple of per-device torch tensors plus metadata
(reference: src/liberate/fhe/data_struct.py:5-24). Here the container is a
registered JAX pytree: ``data`` holds packed uint32-limb jnp arrays (or
nested DataStructs for compound keys), the metadata rides as static
aux_data — so a DataStruct can flow straight through jit/shard_map, and the
metadata participates in jit specialization (level, states).
"""

from typing import Any

import jax
import numpy as np

from ..version import VERSION


class DataStruct:
    """FHE data container (ciphertext, keys, or nested structures).

    Fields (matching the reference):
    - data: pytree of packed uint32 arrays [2, C, N], tuples thereof, or
      nested DataStructs (e.g. a Galois key holds rotation keys).
    - include_special: data includes the special-prime channels.
    - ntt_state: data is in the NTT (evaluation) domain.
    - montgomery_state: data is in Montgomery form.
    - origin: type tag (see presets.types.origins).
    - level: current level (0 = freshest).
    - hash: sha256 of the engine's generation parameters.
    - version: serialization version.
    """

    __slots__ = ("data", "include_special", "ntt_state", "montgomery_state",
                 "origin", "level", "hash", "version")

    def __init__(self, data, include_special: bool, ntt_state: bool,
                 montgomery_state: bool, origin: str, level: int,
                 hash: str = "", version: str = VERSION):
        self.data = data
        self.include_special = include_special
        self.ntt_state = ntt_state
        self.montgomery_state = montgomery_state
        self.origin = origin
        self.level = level
        self.hash = hash
        self.version = version

    # NamedTuple-style conveniences used throughout the reference API.
    def _replace(self, **kw) -> "DataStruct":
        fields = {k: getattr(self, k) for k in self.__slots__}
        fields.update(kw)
        return DataStruct(**fields)

    def __iter__(self):
        return iter(getattr(self, k) for k in self.__slots__)

    def __repr__(self):
        return (f"DataStruct(origin={self.origin!r}, level={self.level}, "
                f"ntt={self.ntt_state}, mont={self.montgomery_state}, "
                f"special={self.include_special})")

    # -- pytree protocol -------------------------------------------------------

    def tree_flatten(self):
        aux = (self.include_special, self.ntt_state, self.montgomery_state,
               self.origin, self.level, self.hash, self.version)
        return (self.data,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (data,) = children
        return cls(data, *aux)


jax.tree_util.register_pytree_node(
    DataStruct,
    lambda s: s.tree_flatten(),
    DataStruct.tree_unflatten,
)

# Reference-compatible alias.
data_struct = DataStruct


def to_host(obj: Any):
    """Recursively fetch device arrays to numpy (for serialization)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), obj)
