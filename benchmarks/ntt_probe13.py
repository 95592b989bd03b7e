"""Engine-level bisect of the MXU-backend failure at silver.

Runs the engine with use_mxu_ntt + use_mxu_pallas on and reports the
decrypt error of (1) a fresh ciphertext, (2) ct+ct, (3) ct*ct — so a
wrong result isolates to keygen/encrypt/decrypt vs the mult path.

Usage: python benchmarks/ntt_probe13.py [logN]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

from liberate_tpu import config

config.use_mxu_ntt = True
config.use_mxu_pallas = True
if os.environ.get("JAX_PLATFORMS") == "cpu":
    config.use_pallas = True
    config.pallas_interpret = True


def main():
    import liberate_tpu

    logN = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    kw = {} if logN >= 14 else dict(num_scales=6, is_secured=False)
    eng = liberate_tpu.CkksEngine(seed=1, logN=logN, scale_bits=40,
                                  num_special_primes=2, **kw)
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    m1 = eng.example(amin=-1, amax=1)
    m2 = eng.example(amin=-1, amax=1)
    ct1 = eng.encorypt(m1, pk)
    ct2 = eng.encorypt(m2, pk)

    def err(ct, want):
        e = abs(eng.absmax_error(eng.decrode(ct, sk), want))
        return float(e.real) if hasattr(e, "real") else float(e)

    out = {"logN": logN}
    out["fresh"] = err(ct1, m1)
    out["add"] = err(eng.add(ct1, ct2), m1 + m2)
    out["mult"] = err(eng.mult(ct1, ct2, evk), m1 * m2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
