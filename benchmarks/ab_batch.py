"""On-device A/B: batched vs sequential mult throughput.

Times B-pair mult_batched (one vmapped fused program) against B
sequential eng.mult calls at silver, execution-synced and
correctness-coupled (every output decrypted and checked after timing).

Usage: python benchmarks/ab_batch.py [B] [logN]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    import jax

    import liberate_tpu
    from liberate_tpu.utils import benchtime

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    logN = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    kw = {} if logN >= 14 else dict(num_scales=4, is_secured=False,
                                    scale_bits=30)
    eng = liberate_tpu.CkksEngine(seed=1, logN=logN,
                                  num_special_primes=2,
                                  **(kw or dict(scale_bits=40)))
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    msgs = [eng.example(amin=-1, amax=1) for _ in range(2 * B)]
    cts = [eng.encorypt(m, pk) for m in msgs]
    ca, cb = cts[0::2], cts[1::2]

    state = {}

    def chain_batched(K):
        """K waves of B batched mults; wave i multiplies the previous
        wave's FIRST output into position 0's pair chain? No — keep all
        waves independent but data-depend the d2h on every wave by
        rotating inputs through the previous outputs' levels is not
        possible (levels advance). Instead: time K independent waves and
        end the clock on a d2h touching every wave's outputs."""
        outs = []
        for _ in range(K):
            outs.append(eng.mult_batched(ca, cb, evk))
        state["outs"] = outs[-1]
        leaves = [o.data[0] for wave in outs for o in wave]
        return jax.numpy.stack([x[0, 0, :8] for x in leaves])

    def chain_seq(K):
        outs = []
        for _ in range(K):
            outs = [eng.mult(a, b, evk) for a, b in zip(ca, cb)]
        state["outs_seq"] = outs
        return jax.numpy.stack([o.data[0][0, 0, :8] for o in outs])

    benchtime.sync(chain_batched(1))
    k1, k2 = 2, 8
    t_b = benchtime.diff_time(chain_batched, k1, k2, trials=3) / B
    benchtime.sync(chain_seq(1))
    t_s = benchtime.diff_time(chain_seq, k1, k2, trials=3) / B

    # Correctness: decrypt every batched output of the last wave.
    worst = 0.0
    for i, o in enumerate(state["outs"]):
        e = abs(eng.absmax_error(eng.decrode(o, sk),
                                 msgs[2 * i] * msgs[2 * i + 1]))
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
