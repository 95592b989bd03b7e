"""Homomorphic evaluation: add/sub/mult/rotate/conjugate at every level.

Mirrors the reference's "[Example] Evaluators.ipynb" error sweeps.
"""

import sys

import numpy as np

from _params import example_params  # noqa: F401 (sets sys.path)

import liberate_tpu


def main():
    engine = liberate_tpu.CkksEngine(**example_params(sys.argv))
    sk = engine.create_secret_key()
    pk = engine.create_public_key(sk)
    evk = engine.create_evk(sk)
    gk = engine.create_galois_key(sk)
    conjk = engine.create_conjugation_key(sk)

    m1 = engine.example(amin=-1, amax=1)
    m2 = engine.example(amin=-1, amax=1)
    err = lambda x, y: abs(engine.absmax_error(x, y))

    print("level | add        | sub        | mult       | rotate     | conj")
    for level in range(engine.num_levels - 1):
        ct1 = engine.encorypt(m1, pk, level)
        ct2 = engine.encorypt(m2, pk, level)
        e_add = err(engine.decrode(engine.add(ct1, ct2), sk), m1 + m2)
        e_sub = err(engine.decrode(engine.sub(ct1, ct2), sk), m1 - m2)
        e_mul = err(engine.decrode(engine.mult(ct1, ct2, evk), sk), m1 * m2)
        e_rot = err(engine.decrode(engine.rotate_galois(ct1, gk, 3), sk),
                    np.roll(m1, 3))
        e_cnj = err(engine.decrode(engine.conjugate(ct1, conjk), sk),
                    np.conj(m1))
        print(f"{level:5d} | {e_add:.3e} | {e_sub:.3e} | {e_mul:.3e} "
              f"| {e_rot:.3e} | {e_cnj:.3e}")

    # Mixed-level (auto-leveling) ops:
    ct1 = engine.encorypt(m1, pk, 0)
    ct2 = engine.encorypt(m2, pk, 2)
    print("auto-level mult err:",
          err(engine.decrode(engine.mult(ct1, ct2, evk), sk), m1 * m2))

    # Scalar and plaintext operands:
    ct = engine.encorypt(m1, pk)
    print("ct+scalar err:", err(engine.decrode(engine.add(ct, 0.5), sk),
                                m1 + 0.5))
    print("ct*scalar err:", err(engine.decrode(engine.mult(ct, 1.5), sk),
                                m1 * 1.5))
    print("ct*message err:", err(engine.decrode(engine.mult(ct, m2), sk),
                                 m1 * m2))


if __name__ == "__main__":
    main()
