"""Worker for the 2-process multi-host multiparty test (run by
test_multihost.py; not a test module itself).

Each process is one PARTY on its own jax.distributed-initialized runtime —
the TPU-pod analogue of the reference's single-process multiparty loops
(reference: ckks_engine.py:2388-2687). Communication pattern:

- the CRS is NOT communicated: counter-keyed ChaCha20 with a shared seed
  produces identical bits on every host (SURVEY 2.4 item 3);
- secret shares never leave their process;
- public shares (pk0, partial decryptions) cross hosts via
  multihost_utils.process_allgather — the DCN path.

Usage: multihost_worker.py <process_id> <num_processes> <coordinator>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coordinator = sys.argv[3]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    from jax.experimental import multihost_utils

    import liberate_tpu

    # Shared engine seed -> identical parameters AND identical repeating
    # CSPRNG streams (the CRS) on every host.
    eng = liberate_tpu.CkksEngine(logN=8, scale_bits=30, num_scales=3,
                                  num_special_primes=2, is_secured=False,
                                  seed=20260817)

    # Per-party secret: reseed the rng per-party AFTER the shared-CRS draw
    # order is fixed. Draw the CRS first (same step counters everywhere).
    pk_seed_engine_a = eng.rng.randint(
        amax=eng.ntt.q_ints(0, -2), repeats=eng.num_special)
    crs = pk_seed_engine_a

    # CRS equality across hosts (generation replaces communication).
    crs_host = np.asarray(crs)
    all_crs = multihost_utils.process_allgather(crs_host)
    assert all_crs.shape[0] == nproc
    for j in range(nproc):
        np.testing.assert_array_equal(all_crs[j], all_crs[0])
    print(f"[{pid}] CRS identical across {nproc} hosts", flush=True)

    # Party-specific secret key (different seed per party).
    eng.refresh(seed=1000 + pid)
    sk = eng.create_secret_key()
    pk_share = eng.multiparty_create_public_key(sk, a=crs)

    # Exchange pk0 shares (public data) over the distributed runtime.
    pk0_all = multihost_utils.process_allgather(np.asarray(pk_share.data[0]))
    shares = [pk_share._replace(data=(pk0_all[j], pk_share.data[1]))
              for j in range(nproc)]
    cpk = eng.multiparty_create_collective_public_key(shares)

    # Same message everywhere (deterministic encrypt path needs identical
    # rng state: re-seed the shared stream identically).
    eng.refresh(seed=555)
    m = np.linspace(-1, 1, eng.num_slots) + 1j * np.linspace(1, -1,
                                                             eng.num_slots)
    ct = eng.encorypt(m, cpk)

    # Threshold decryption: party 0 computes the head, others partials.
    if pid == 0:
        pct = eng.multiparty_decrypt_head(ct, sk)
    else:
        pct = eng.multiparty_decrypt_partial(ct, sk)
    pcts_all = multihost_utils.process_allgather(np.asarray(pct))
    dec = eng.multiparty_decrypt_fusion([pcts_all[j] for j in range(nproc)],
                                        level=ct.level)
    err = abs(eng.absmax_error(dec, m))
    print(f"[{pid}] threshold decrypt err {err:.3e}", flush=True)
    assert err < 1e-4, f"multihost threshold decrypt failed: {err}"
    print(f"[{pid}] OK", flush=True)


if __name__ == "__main__":
    main()
