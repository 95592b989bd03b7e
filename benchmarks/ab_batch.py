"""On-device A/B: batched vs sequential mult throughput.

Times B-pair batched mult (STACKED ciphertexts -> one program dispatch
per wave, eng.mult_stacked) against B sequential eng.mult calls at
silver, execution-synced and correctness-coupled (homomorphic
accumulation across waves; every batch lane decrypted and checked after
timing).

Usage: python benchmarks/ab_batch.py [B] [logN]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    import liberate_tpu
    from liberate_tpu.utils import benchtime

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    logN = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    kw = (dict(scale_bits=40) if logN >= 14
          else dict(num_scales=4, is_secured=False, scale_bits=30))
    eng = liberate_tpu.CkksEngine(seed=1, logN=logN,
                                  num_special_primes=2, **kw)
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    msgs = [eng.example(amin=-1, amax=1) for _ in range(2 * B)]
    cts = [eng.encorypt(m, pk) for m in msgs]
    ca, cb = cts[0::2], cts[1::2]
    sa, sb = eng.stack_cts(ca), eng.stack_cts(cb)

    state = {}

    def chain_batched(K):
        acc = None
        for _ in range(K):
            o = eng.mult_stacked(sa, sb, evk)
            acc = o if acc is None else eng.add(acc, o)
        state["acc"], state["K"] = acc, K
        return acc.data

    def chain_seq(K):
        acc = [None] * B
        for _ in range(K):
            for i in range(B):
                o = eng.mult(ca[i], cb[i], evk)
                acc[i] = o if acc[i] is None else eng.add(acc[i], o)
        state["acc_seq"], state["K_seq"] = acc, K
        return [a.data for a in acc]

    benchtime.sync(chain_batched(2))
    k1, k2 = 2, 8
    t_b = benchtime.diff_time(chain_batched, k1, k2, trials=3) / B
    benchtime.sync(chain_seq(2))
    t_s = benchtime.diff_time(chain_seq, k1, k2, trials=3) / B

    # Correctness: decrypt every batch lane of the accumulated result.
    worst = 0.0
    K = state["K"]
    for i, o in enumerate(eng.unstack_ct(state["acc"])):
        e = abs(eng.absmax_error(eng.decrode(o, sk),
                                 K * msgs[2 * i] * msgs[2 * i + 1]))
        worst = max(worst, float(abs(e)))
    assert worst < 1e-3, f"batched mult wrong: err {worst}"
    print(json.dumps({
        "metric": f"silver_mult_batched_B{B}",
        "batched_ms_per_mult": round(t_b * 1e3, 3),
        "seq_ms_per_mult": round(t_s * 1e3, 3),
        "batched_mult_s": round(1.0 / t_b, 1),
        "speedup": round(t_s / t_b, 2),
        "absmax_error": worst,
    }), flush=True)


if __name__ == "__main__":
    main()
