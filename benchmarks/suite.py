"""Benchmark suite: the BASELINE.md configurations.

Prints one JSON line per benchmark. Run on TPU for real numbers; on CPU it
runs tiny smoke shapes (the XLA path is the portable fallback, ~100x off).

Configs (BASELINE.md):
1. bronze enc/dec roundtrip latency
2. silver ct-ct mult + relin + rescale (the headline; also in ../bench.py)
3. rotation chain (galois hops)
4. RNS-sharded mult on a device mesh (virtual mesh when only 1 chip)
5. multiparty keygen/enc/threshold-dec
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax  # noqa: E402

import liberate_tpu  # noqa: E402


def _bench(fn, iters, trials=3):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def emit(metric, seconds, unit="ms"):
    print(json.dumps({"metric": metric,
                      "value": round(seconds * 1000, 3),
                      "unit": unit}), flush=True)


def main():
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        bronze = dict(logN=14, scale_bits=40, num_special_primes=1)
        silver = dict(logN=15, scale_bits=40, num_special_primes=2)
        iters = 10
    else:
        bronze = dict(logN=8, scale_bits=30, num_scales=3,
                      num_special_primes=1, is_secured=False)
        silver = dict(logN=8, scale_bits=30, num_scales=3,
                      num_special_primes=2, is_secured=False)
        iters = 2

    # -- 1. bronze enc (encode+encrypt) latency -----------------------------
    eng = liberate_tpu.CkksEngine(seed=1, **bronze)
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    gk = eng.create_galois_key(sk)
    m = eng.example(amin=-1, amax=1)
    emit("bronze_encorypt", _bench(lambda: eng.encorypt(m, pk).data, iters))
    ct = eng.encorypt(m, pk)
    ct2 = eng.encorypt(eng.example(amin=-1, amax=1), pk)

    # -- 3. rotation chain on bronze (before any d2h!) ----------------------
    emit("bronze_rotate_1hop",
         _bench(lambda: eng.rotate_single(ct, gk.data[0]).data, iters))
    emit("bronze_mult_relin_rescale",
         _bench(lambda: eng.mult(ct, ct2, evk).data, iters))

    # -- 2. silver mult (headline) ------------------------------------------
    eng_s = liberate_tpu.CkksEngine(seed=1, **silver)
    sk_s = eng_s.create_secret_key()
    pk_s = eng_s.create_public_key(sk_s)
    evk_s = eng_s.create_evk(sk_s)
    m1_s = eng_s.example(amin=-1, amax=1)
    m2_s = eng_s.example(amin=-1, amax=1)
    c1 = eng_s.encorypt(m1_s, pk_s)
    c2 = eng_s.encorypt(m2_s, pk_s)
    emit("silver_mult_relin_rescale",
         _bench(lambda: eng_s.mult(c1, c2, evk_s).data, iters))

    # -- 2b. gold mult; platinum opt-in (first compile ~10 min, then
    # persistently cached) --------------------------------------------------
    if on_tpu:
        eng_g = liberate_tpu.CkksEngine(seed=1, logN=16, scale_bits=40,
                                        num_special_primes=4)
        sk_g = eng_g.create_secret_key()
        pk_g = eng_g.create_public_key(sk_g)
        evk_g = eng_g.create_evk(sk_g)
        g1 = eng_g.encorypt(eng_g.example(amin=-1, amax=1), pk_g)
        g2 = eng_g.encorypt(eng_g.example(amin=-1, amax=1), pk_g)
        emit("gold_mult_relin_rescale",
             _bench(lambda: eng_g.mult(g1, g2, evk_g).data, iters))
        if os.environ.get("LIBERATE_TPU_BENCH_PLATINUM"):
            eng_p = liberate_tpu.CkksEngine(seed=1, logN=17, scale_bits=40,
                                            num_special_primes=6,
                                            is_secured=False)
            sk_p = eng_p.create_secret_key()
            pk_p = eng_p.create_public_key(sk_p)
            evk_p = eng_p.create_evk(sk_p)
            p1 = eng_p.encorypt(eng_p.example(amin=-1, amax=1), pk_p)
            p2 = eng_p.encorypt(eng_p.example(amin=-1, amax=1), pk_p)
            emit("platinum_mult_relin_rescale",
                 _bench(lambda: eng_p.mult(p1, p2, evk_p).data, iters))

    # -- 5. multiparty: collective pk + threshold decrypt (3 parties) -------
    sks = [eng.create_secret_key() for _ in range(3)]
    pk0 = eng.multiparty_create_public_key(sks[0])
    crs = eng.multiparty_public_crs(pk0)
    pks = [pk0] + [eng.multiparty_create_public_key(s, a=crs)
                   for s in sks[1:]]
    cpk = eng.multiparty_create_collective_public_key(pks)
    ctm = eng.encorypt(m, cpk)

    def threshold_dec():
        pcts = [eng.multiparty_decrypt_head(ctm, sks[0])]
        pcts += [eng.multiparty_decrypt_partial(ctm, s) for s in sks[1:]]
        pack = eng.pack(ctm.level, -1)
        from liberate_tpu.ntt import ops
        pt = pcts[0]
        for p in pcts[1:]:
            pt = ops.mont_add(pt, p, pack)
        return ops.reduce_2q(pt, pack)

    emit("bronze_3party_threshold_decrypt_device_side",
         _bench(threshold_dec, iters))

    # -- 4. sharded mult on a device mesh ------------------------------------
    n_dev = len(jax.devices())
    if n_dev > 1:
        from liberate_tpu.parallel import make_mesh

        # A mesh-aware engine: channel axes padded to the mesh size and
        # sharded; keys/cts are born distributed (see liberate_tpu.parallel).
        mesh = make_mesh(n_dev)
        eng_m = liberate_tpu.CkksEngine(seed=1, mesh=mesh, **silver)
        sk_m = eng_m.create_secret_key()
        pk_m = eng_m.create_public_key(sk_m)
        evk_m = eng_m.create_evk(sk_m)
        c1s = eng_m.encorypt(m1_s, pk_m)
        c2s = eng_m.encorypt(m2_s, pk_m)
        emit(f"silver_mult_sharded_{n_dev}dev",
             _bench(lambda: eng_m.mult(c1s, c2s, evk_m).data, iters))
    else:
        print(json.dumps({"metric": "silver_mult_sharded",
                          "value": None,
                          "unit": "skipped (1 device)"}), flush=True)

    # Correctness gates (after all timing: d2h degrades dispatch here).
    # A broken fast path must fail the suite, not report "verified".
    dec = eng_s.decrode(eng_s.mult(c1, c2, evk_s), sk_s)
    err = abs(eng_s.absmax_error(dec, m1_s * m2_s))
    assert err < 1e-4, f"silver mult decryption error too large: {err}"
    print(json.dumps({"metric": "silver_mult_verified",
                      "value": True, "unit": "bool",
                      "absmax_error": float(err.real)
                      if hasattr(err, "real") else float(err)}), flush=True)


if __name__ == "__main__":
    main()
