"""Regenerate docs/API.md from the engine's signatures/docstrings.

Usage: python docs/gen_api.py > docs/API.md
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import inspect  # noqa: E402

from liberate_tpu.fhe.engine import CkksEngine  # noqa: E402


def main():
    print("# CkksEngine API reference\n")
    print("Auto-generated signature list (`python docs/gen_api.py >")
    print("docs/API.md`). The method set mirrors the reference engine")
    print("(reference: src/liberate/fhe/ckks_engine.py); see SURVEY.md 2.3")
    print("for the inventory mapping and docs/DESIGN.md for the TPU-native")
    print("architecture behind it.\n")
    for name, fn in sorted(vars(CkksEngine).items()):
        if name.startswith("_") or not callable(fn):
            continue
        try:
            sig = str(inspect.signature(fn)).replace(
                "liberate_tpu.fhe.data_struct.DataStruct", "DataStruct")
        except (TypeError, ValueError):
            sig = "(...)"
        doc = (inspect.getdoc(fn) or "").split("\n")[0].strip()
        suffix = f" — {doc}" if doc else ""
        print(f"- `{name}{sig}`{suffix}")


if __name__ == "__main__":
    main()
