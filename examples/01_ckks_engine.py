"""Basic engine usage: keygen, encode/encrypt, decrypt/decode.

Mirrors the reference's "[Example] CKKS engine.ipynb". Run with small
parameters on CPU (`JAX_PLATFORMS=cpu python examples/01_ckks_engine.py`)
or preset parameters on TPU (`python examples/01_ckks_engine.py silver`).
"""

import sys

from _params import example_params  # noqa: F401 (sets sys.path)

import liberate_tpu
from liberate_tpu.utils import check_errors


def main():
    engine = liberate_tpu.CkksEngine(**example_params(sys.argv))

    sk = engine.create_secret_key()
    pk = engine.create_public_key(sk)

    m = engine.example(amin=-1, amax=1)

    # Separate encode / encrypt / decrypt / decode:
    pt = engine.encode(m)
    ct = engine.encrypt(pt, pk)
    dec = engine.decode(engine.decrypt(ct, sk))
    print("== separate encode/encrypt ==")
    check_errors(dec, m)

    # Fused (with bias-guard DC protection):
    ct = engine.encorypt(m, pk)
    dec = engine.decrode(ct, sk)
    print("== fused encorypt/decrode ==")
    check_errors(dec, m)

    # Serialization round trip:
    fn = engine.save(ct, "/tmp/liberate_tpu_ct.pkl")
    ct2 = engine.load(fn)
    print("== after save/load ==")
    check_errors(engine.decrode(ct2, sk), m)


if __name__ == "__main__":
    main()
