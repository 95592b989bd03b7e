from . import presets
from .data_struct import DataStruct, data_struct

__all__ = ["presets", "DataStruct", "data_struct"]


def __getattr__(name):
    # Lazy import: the engine pulls in jax-heavy modules.
    if name in ("CkksEngine", "ckks_engine", "engine"):
        from . import engine
        if name == "engine":
            return engine
        return getattr(engine, name)
    raise AttributeError(name)
