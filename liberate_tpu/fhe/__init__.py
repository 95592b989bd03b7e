from . import presets
from .data_struct import DataStruct, data_struct

__all__ = ["presets", "DataStruct", "data_struct"]


def __getattr__(name):
    # Lazy import: the engine pulls in jax-heavy modules. importlib is used
    # directly because `from . import engine` would re-enter this hook.
    if name in ("CkksEngine", "ckks_engine", "engine"):
        import importlib
        engine = importlib.import_module(".engine", __name__)
        if name == "engine":
            return engine
        return getattr(engine, name)
    raise AttributeError(name)
