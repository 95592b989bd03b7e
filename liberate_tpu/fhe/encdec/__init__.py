from .encdec import (
    conjugate_perm_data,
    decode,
    encode,
    rotate_perm_data,
)

__all__ = ["encode", "decode", "rotate_perm_data", "conjugate_perm_data"]
