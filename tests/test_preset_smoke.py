"""Preset-shaped smoke test (VERDICT round-1 weak #5): one bronze
(logN=14) configuration end-to-end, so preset-specific breakage (prime
tables, channel counts, bias-guard CRT at production N) is visible to CI.

Marked slow: engine construction + the logN=14 compiles dominate (~1-2 min
on the CPU backend); mult/key-switching stays out (its compile alone is
minutes at this size — the switcher is covered at logN=8 and on TPU by
bench.py).
"""

import numpy as np
import pytest

import liberate_tpu


@pytest.mark.slow
def test_bronze_roundtrip_add():
    eng = liberate_tpu.CkksEngine(logN=14, scale_bits=40,
                                  num_special_primes=1, seed=3)
    # Bronze preset shape (reference: presets/params.py bronze).
    assert eng.ctx.logN == 14
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    m1 = eng.example(amin=-1, amax=1)
    m2 = eng.example(amin=-1, amax=1)
    ct1 = eng.encorypt(m1, pk)
    ct2 = eng.encorypt(m2, pk)

    dec = eng.decrode(ct1, sk)
    assert abs(eng.absmax_error(dec, m1)) < 1e-6

    out = eng.add(ct1, ct2)
    dec = eng.decrode(out, sk)
    assert abs(eng.absmax_error(dec, m1 + m2)) < 1e-6
