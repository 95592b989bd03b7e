"""Multi-chip usage: RNS-channel tensor parallelism over a device mesh.

The reference spreads RNS channels over GPUs with per-device tensor lists
and pinned-host copies (reference: src/liberate/ntt/rns_partition.py,
ckks_engine.py:746-904); here the same parallelism is a
`jax.sharding.Mesh` + engine-level channel padding, and GSPMD/shard_map
insert the ICI collectives. Every public API call is unchanged — the mesh
is purely a constructor argument.

Run on a multi-chip TPU host:       python examples/04_multichip.py
Try it anywhere on a virtual mesh:  JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/04_multichip.py
"""

import sys

from _params import example_params  # noqa: F401 (sets sys.path)

import jax
import numpy as np

import liberate_tpu
from liberate_tpu.parallel import make_mesh, shard_datastruct
from liberate_tpu.utils import check_errors


def main():
    n = len(jax.devices())
    mesh = make_mesh(n)   # 1-D mesh over the 'rns' (channel) axis
    print(f"mesh: {n} x {jax.devices()[0].platform}")

    params = example_params(sys.argv)
    engine = liberate_tpu.CkksEngine(mesh=mesh, **params)

    sk = engine.create_secret_key()     # born sharded on the mesh
    pk = engine.create_public_key(sk)
    evk = engine.create_evk(sk)

    m1 = engine.example(amin=-1, amax=1)
    m2 = engine.example(amin=-1, amax=1)
    ct1 = engine.encorypt(m1, pk)
    ct2 = engine.encorypt(m2, pk)

    # The channel (RNS) axis of every polynomial is spread over the mesh:
    poly = ct1.data[0]
    print("ciphertext poly:", poly.shape, "sharding:", poly.sharding.spec)

    out = engine.mult(ct1, ct2, evk)    # relin + rescale inside
    print("== sharded mult ==")
    check_errors(engine.decrode(out, sk), m1 * m2)

    gk = engine.create_galois_key(sk)
    rot = engine.rotate_galois(out, gk, 5)
    print("== sharded rotate ==")
    check_errors(engine.decrode(rot, sk), np.roll(m1 * m2, 5))

    # Import single-chip data onto the mesh (pads uneven channel counts):
    eng1 = liberate_tpu.CkksEngine(**params)
    ct_host = eng1.encorypt(m1, eng1.create_public_key(sk_host := eng1.create_secret_key()))
    ct_mesh = shard_datastruct(ct_host, mesh)
    sk_mesh = shard_datastruct(sk_host, mesh)
    print("== imported host ciphertext ==")
    check_errors(engine.decrode(ct_mesh, sk_mesh), m1)

    # 2-D ('rns', 'coef') layout: channels over one mesh axis AND each
    # polynomial's coefficients over the other, so a single transform
    # spans chips (cross-shard NTT stages are ppermute block exchanges —
    # liberate_tpu/parallel/coef_shard.py). Same API, different mesh.
    if n >= 4:
        from liberate_tpu.parallel import make_mesh2d

        mesh2 = make_mesh2d(2, n // 2)
        eng2 = liberate_tpu.CkksEngine(mesh=mesh2, **params)
        sk2 = eng2.create_secret_key()
        pk2 = eng2.create_public_key(sk2)
        evk2 = eng2.create_evk(sk2)
        c1 = eng2.encorypt(m1, pk2)
        c2 = eng2.encorypt(m2, pk2)
        print("== 2-D (rns, coef) mesh mult ==")
        print("ciphertext poly sharding:", c1.data[0].sharding.spec)
        check_errors(eng2.decrode(eng2.mult(c1, c2, evk2), sk2), m1 * m2)


if __name__ == "__main__":
    main()
