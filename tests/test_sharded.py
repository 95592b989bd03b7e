"""Multi-chip (sharded mesh) scheme tests on the 8-device virtual CPU mesh.

The RNS channel axis is the tensor-parallel axis (reference multi-GPU
analogue: src/liberate/ntt/rns_partition.py); the engine pads channel
counts to the mesh size so arbitrary (divisible AND non-divisible) channel
counts work on any mesh — the reference's uneven round-robin deal
(reference: rns_partition.py:29-37) expressed as padding + GSPMD.

Covers VERDICT round-1 item #1: sharded mult, rotate, rescale, and
threshold decrypt, on both divisible (C0_sp=8) and non-divisible
(C0_sp=6, mesh=4 -> pad 8; mesh=8 -> pad 8 with C_ord=4 padded) layouts.
"""

import numpy as np
import pytest

import jax

from liberate_tpu.fhe.engine import CkksEngine
from liberate_tpu.parallel import make_mesh, shard_datastruct


# num_scales=5, nsp=2 -> C0_sp = 8 (divisible by 8); levels below are
# non-divisible. num_scales=3, nsp=2 -> C0_sp = 6 (non-divisible by 4/8).
PARAMS_DIV = dict(logN=8, scale_bits=30, num_scales=5, num_special_primes=2,
                  is_secured=False, seed=20260816)
PARAMS_NONDIV = dict(logN=8, scale_bits=30, num_scales=3,
                     num_special_primes=2, is_secured=False, seed=7)


def _engine(params, n_devices):
    mesh = make_mesh(n_devices)
    return CkksEngine(mesh=mesh, **params), mesh


def _assert_rns_sharded(ds, n_devices):
    leaves = [x for x in jax.tree_util.tree_leaves(ds)
              if hasattr(x, "sharding") and getattr(x, "ndim", 0) >= 3]
    assert leaves, "no poly leaves found"
    for x in leaves:
        assert len(x.sharding.device_set) == n_devices
        for s in x.addressable_shards:
            assert s.data.shape[-2] == x.shape[-2] // n_devices


@pytest.mark.parametrize("params,n", [
    (PARAMS_DIV, 8),
    (PARAMS_NONDIV, 8),
    (PARAMS_NONDIV, 4),
])
def test_sharded_mult_relin_rescale(params, n):
    eng, mesh = _engine(params, n)
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    m1 = eng.example(amin=-1, amax=1)
    m2 = eng.example(amin=-1, amax=1)
    ct1 = eng.encorypt(m1, pk)
    ct2 = eng.encorypt(m2, pk)

    _assert_rns_sharded(ct1, n)
    _assert_rns_sharded(evk, n)

    out = eng.mult(ct1, ct2, evk)   # rescale x2 + cc_mult + relin inside
    _assert_rns_sharded(out, n)
    dec = eng.decrode(out, sk)
    assert abs(eng.absmax_error(dec, m1 * m2)) < 1e-4


def test_sharded_level_up():
    """level_up (rescale + re-scale multiply) walks the ciphertext through
    non-divisible channel counts on the mesh while preserving the message."""
    eng, mesh = _engine(PARAMS_DIV, 8)
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    ct2 = eng.level_up(ct, 3)
    assert ct2.level == 3
    _assert_rns_sharded(ct2, 8)
    dec = eng.decrode(ct2, sk)
    assert abs(eng.absmax_error(dec, m)) < 1e-4


def test_sharded_rotate():
    eng, mesh = _engine(PARAMS_NONDIV, 8)
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    rotk = eng.create_rotation_key(sk, 2)
    ct_rot = eng.rotate_single(ct, rotk)
    _assert_rns_sharded(ct_rot, 8)
    dec = eng.decrode(ct_rot, sk)
    assert abs(eng.absmax_error(dec, np.roll(m, 2))) < 1e-4


def test_sharded_threshold_decrypt():
    """Collective pk + threshold decryption, all data mesh-sharded."""
    eng, mesh = _engine(PARAMS_NONDIV, 8)
    sks = [eng.create_secret_key() for _ in range(3)]
    crs = None
    pks = []
    for sk_i in sks:
        pk_i = eng.multiparty_create_public_key(sk_i, a=crs)
        crs = eng.multiparty_public_crs(pk_i)
        pks.append(pk_i)
    cpk = eng.multiparty_create_collective_public_key(pks)

    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, cpk)
    _assert_rns_sharded(ct, 8)

    pcts = [eng.multiparty_decrypt_head(ct, sks[0])]
    pcts += [eng.multiparty_decrypt_partial(ct, sk_i) for sk_i in sks[1:]]
    dec = eng.multiparty_decrypt_fusion(pcts, level=ct.level)
    assert abs(eng.absmax_error(dec, m)) < 1e-4


def test_import_host_data_onto_mesh():
    """shard_datastruct pads uneven widths when importing single-chip data."""
    eng1 = CkksEngine(**PARAMS_NONDIV)   # no mesh: real widths (C0_sp=6)
    sk = eng1.create_secret_key()
    pk = eng1.create_public_key(sk)
    m = eng1.example(amin=-1, amax=1)
    ct = eng1.encorypt(m, pk)

    mesh = make_mesh(4)
    ct_s = shard_datastruct(ct, mesh)
    for x in jax.tree_util.tree_leaves(ct_s):
        if getattr(x, "ndim", 0) >= 3:
            assert x.shape[-2] % 4 == 0
            assert len(x.sharding.device_set) == 4

    # A mesh-aware engine with the same params can consume the import
    # (shard_datastruct pads uneven key widths to the engine's layout).
    eng4 = CkksEngine(mesh=mesh, **PARAMS_NONDIV)
    assert eng4.hash == eng1.hash
    sk_s = shard_datastruct(sk, mesh)
    dec = eng4.decrode(ct_s, sk_s)
    assert abs(eng4.absmax_error(dec, m)) < 1e-4


def test_sharded_pallas_kernels():
    """The fused Pallas kernels run per-shard under shard_map on a mesh
    (interpret mode on the virtual CPU mesh): same mult result as the
    sharded XLA path."""
    from liberate_tpu import config

    config.use_pallas = True
    config.pallas_interpret = True
    try:
        eng, mesh = _engine(PARAMS_NONDIV, 4)
        lp = eng.ntt.level_pack(0, -2)
        assert lp.pallas is not None and lp.pallas.mesh is mesh
        assert eng.ntt.parts(1)[0].pack.pallas is None  # part packs: XLA
        sk = eng.create_secret_key()
        pk = eng.create_public_key(sk)
        evk = eng.create_evk(sk)
        m1 = eng.example(amin=-1, amax=1)
        m2 = eng.example(amin=-1, amax=1)
        out = eng.mult(eng.encorypt(m1, pk), eng.encorypt(m2, pk), evk)
        _assert_rns_sharded(out, 4)
        dec = eng.decrode(out, sk)
        assert abs(eng.absmax_error(dec, m1 * m2)) < 1e-4
    finally:
        config.use_pallas = None
        config.pallas_interpret = False
