"""Multi-chip create_proof (mesh=...) on the virtual CPU mesh.

The BASELINE.md config-5 deliverable: commits via the sharded Pippenger,
domain transforms via the 4-step all-to-all NTT, grand products with
cross-shard carries — and the resulting proof must be BYTE-IDENTICAL to
the single-chip prover's (field/EC ops are exact, so only a logic bug can
make them diverge)."""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

import test_circuit_ir as toy
from zkodst_tpu.proof import keygen, prover, srs, verifier


@pytest.fixture(scope="module")
def setup():
    circ = toy.toy_circuit()
    params = srs.setup(circ.k, seed=2)
    pk = keygen.keygen(params, circ, msm_window=4)
    return circ, params, pk


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:4]), axis_names=("x",))


def test_sharded_prove_bit_identical_and_verifies(setup, mesh):
    circ, params, pk = setup
    w = toy.good_witness()
    single = prover.create_proof(params, pk, w, {}, seed=11)
    shard = prover.create_proof(params, pk, w, {}, seed=11, mesh=mesh)
    assert shard == single
    assert verifier.verify_proof(params, pk.vk, {}, shard)


def test_sharded_batched_ntt_roundtrip(mesh):
    from zkodst_tpu.ops import ntt as nttmod
    from zkodst_tpu.ops.field import FR
    from zkodst_tpu.ops.pyfield import FR as PFR
    from zkodst_tpu.parallel import ntt_sharded

    k, B = 6, 3
    n = 1 << k
    w = PFR.root_of_unity(k)
    rng = np.random.default_rng(8)
    a = FR.from_ints([[int(x) for x in row]
                      for row in rng.integers(0, 1 << 62, (B, n))])
    ref = np.asarray(nttmod.ntt(FR, a, w))
    nat = np.asarray(ntt_sharded.ntt_sharded_nat(FR, a, w, mesh, "x"))
    assert np.array_equal(nat, ref)
    back = np.asarray(ntt_sharded.intt_sharded_nat(FR, nat, w, mesh, "x"))
    assert np.array_equal(back, np.asarray(a))


def test_sharded_cumprod(mesh):
    from zkodst_tpu.ops.field import FR
    from zkodst_tpu.parallel.scan_sharded import cumprod_incl_sharded
    from zkodst_tpu.proof.prover import _cumprod_incl

    rng = np.random.default_rng(9)
    x = FR.from_ints([int(v) for v in rng.integers(1, 1 << 62, 64)])
    ref = np.asarray(_cumprod_incl(x))
    out, total = cumprod_incl_sharded(FR, x, mesh, "x")
    assert np.array_equal(np.asarray(out), ref)
    assert np.array_equal(np.asarray(total), ref[-1])


def test_2d_mesh_tuple_axis():
    """(host, chip) 2-D mesh with a tuple mesh axis — the pod-slice shape
    from parallel/bootstrap.py (hosts on DCN, chips on ICI)."""
    from zkodst_tpu.ops import ntt as nttmod
    from zkodst_tpu.ops.field import FR
    from zkodst_tpu.ops.pyfield import FR as PFR
    from zkodst_tpu.parallel import ntt_sharded
    from zkodst_tpu.parallel.bootstrap import axis_size, make_mesh

    mesh = make_mesh((2, 4), ("host", "chip"))
    assert axis_size(mesh, ("host", "chip")) == 8
    k = 6
    n = 1 << k
    w = PFR.root_of_unity(k)
    rng = np.random.default_rng(10)
    a = FR.from_ints([int(x) for x in rng.integers(0, 1 << 62, n)])
    ref = np.asarray(nttmod.ntt(FR, a, w))
    nat = np.asarray(ntt_sharded.ntt_sharded_nat(
        FR, a, w, mesh, ("host", "chip")))
    assert np.array_equal(nat, ref)
