import numpy as np
import jax
import pytest

from zkodst_tpu.ops import curve, msm, pycurve, field

rng = np.random.default_rng(13)
G = pycurve.G1
GEN = pycurve.G1_GEN


def setup(n, scalar_bits=254):
    base_ks = [int.from_bytes(rng.bytes(32), "little") % pycurve.R_ORDER
               for _ in range(n)]
    pts = [G.mul(GEN, k) for k in base_ks]
    scalars = [int.from_bytes(rng.bytes(32), "little") % (1 << scalar_bits)
               % pycurve.R_ORDER for _ in range(n)]
    P = curve.from_affine_ints(pts)
    S = np.stack([field.int_to_limbs(s) for s in scalars])
    want = None
    for p, s in zip(pts, scalars):
        want = G.add(want, G.mul(p, s))
    return P, S, want


def test_msm_matches_naive():
    P, S, want = setup(17)
    got = curve.to_affine_ints(msm.msm(P, S, c=8)[None])[0]
    assert got == want


def test_msm_window4():
    P, S, want = setup(17)
    got = curve.to_affine_ints(msm.msm(P, S, c=4)[None])[0]
    assert got == want


def test_msm_edge_scalars():
    # zeros, ones, r-1, equal points (padded to 17 to share the compiled
    # (N=17, c=8) program across tests)
    pts = [GEN, GEN, G.mul(GEN, 5), G.mul(GEN, 7)] + [GEN] * 13
    scalars = [0, 1, pycurve.R_ORDER - 1, 0] + [3] * 13
    P = curve.from_affine_ints(pts)
    S = np.stack([field.int_to_limbs(s) for s in scalars])
    want = None
    for p, s in zip(pts, scalars):
        want = G.add(want, G.mul(p, s))
    got = curve.to_affine_ints(msm.msm(P, S, c=8)[None])[0]
    assert got == want


def test_msm_all_zero():
    P, S, _ = setup(17)
    S = np.zeros_like(S)
    got = curve.to_affine_ints(msm.msm(P, S, c=8)[None])[0]
    assert got is None


def test_msm_mont_scalars():
    P, S, want = setup(17)
    ints = [field.limbs_to_int(s) for s in S]
    S_mont = field.FR.from_ints(ints)
    got = curve.to_affine_ints(msm.msm_mont(P, S_mont, c=8)[None])[0]
    assert got == want


@pytest.mark.slow
def test_chain_scan_kernel_interpret(monkeypatch):
    """The sequential Pallas chain-scan KERNEL itself (interpret mode on
    CPU) against the lax.scan emulation `_chain_scan_local` falls back to
    — the only CPU coverage of the kernel's accumulator/init logic.
    Interpret mode executes each vector op eagerly (~40 min on the 1-core
    host), hence slow-marked; the TPU e2e drives the compiled kernel."""
    monkeypatch.setenv("ZKODST_FORCE_KERNELS", "1")
    from zkodst_tpu.pallas import ec

    W, S = 128, 3
    n = W * S
    ks = rng.integers(1, 1 << 30, n)
    pts = curve.from_affine_ints([G.mul(GEN, int(k)) for k in ks])
    pt = ec.pack(pts)[0]                                   # (48, n)
    starts = (rng.integers(0, 4, n) == 0)
    kern = np.asarray(ec.chain_scan_local(
        pt, starts.astype(np.uint32)[None, :], W))
    monkeypatch.delenv("ZKODST_FORCE_KERNELS")
    emu = np.asarray(msm._chain_scan_local(jax.numpy.asarray(pt),
                                           jax.numpy.asarray(starts), W))
    ka = curve.to_affine_ints(ec.unpack(kern, n))
    ea = curve.to_affine_ints(ec.unpack(emu, n))
    assert ka == ea


@pytest.mark.slow
def test_scale_reduce_kernel(monkeypatch):
    """The fused Horner-replacement kernel (pallas/ec.py scale_reduce)
    against the host oracle. REAL TPU only: the pallas interpreter leaks
    memory without bound on this kernel's fori_loop body (observed 26 GB
    RSS even at an 8-step config), which is why msm() gates the kernel
    to real backends and this test skips elsewhere. Driven on TPU by
    scripts/profile_components.py's session."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("scale_reduce kernel needs a real TPU backend "
                    "(interpret mode leaks; see msm.msm)")
    import jax.numpy as jnp

    from zkodst_tpu.pallas import ec

    c, nlive = 4, 3
    ks = [5, 9, 13]
    pts = curve.from_affine_ints([G.mul(GEN, k) for k in ks])
    idp = np.broadcast_to(np.asarray(curve.identity()), (128 - nlive, 3, 16))
    wsp = jnp.concatenate([jnp.asarray(pts), jnp.asarray(idp)]) \
        .reshape(128, 48).T
    out = ec.unpack(ec.scale_reduce(wsp, c, nlive)[:, :1], 1)[0]
    want = None
    for w, k in enumerate(ks):
        want = G.add(want, G.mul(GEN, k * (1 << (c * w))))
    assert curve.to_affine_ints(np.asarray(out)[None])[0] == want


def test_msm_chain_path_interpret(monkeypatch):
    """The chained-sequential-scan (packed Pallas) MSM path, run in
    pallas interpret mode on CPU: N=512 forces W=256/S=2 chains, u64
    scalars keep it to 8 windows."""
    monkeypatch.setenv("ZKODST_FORCE_PACKED", "1")
    n = 512
    base_ks = rng.integers(1, 1 << 30, n)
    pts = [G.mul(GEN, int(k)) for k in base_ks]
    scalars = [int(x) for x in rng.integers(0, 1 << 64, n, dtype=np.uint64)]
    # exercise empty buckets, bucket 0, single-element and giant segments
    scalars[0] = 0
    scalars[1] = 1
    scalars[2:40] = [(1 << 64) - 1] * 38      # one segment spanning chains
    P = curve.from_affine_ints(pts)
    S = np.stack([field.int_to_limbs(s) for s in scalars])
    want = None
    for p, s in zip(pts, scalars):
        want = G.add(want, G.mul(p, s))
    got = curve.to_affine_ints(
        np.asarray(msm.msm(P, S, c=8, scalar_bits=64))[None])[0]
    assert got == want
