"""Pallas MSM step kernel vs the XLA curve ops (`device/curve.py`).

The fused double-and-conditional-add step (`pallas_curve._msm_step`) is the
whole compute of `msm_pallas`; it is asserted here against the composition
`select(bit, add(double(T), Q), double(T))` of the oracle-checked XLA curve
ops, on random lanes AND crafted special-case lanes (T at infinity, 2T==Q,
2T==−Q, masked bits).  Runs in DIRECT mode (kernel bodies as plain jnp) —
the pallas_call plumbing itself is covered by test_pallas_tower.
"""

import random

import pytest

import jax.numpy as jnp
import numpy as np

from threshold_crypto_tpu.device import curve as dcv
from threshold_crypto_tpu.device import pallas_curve as pcv
from threshold_crypto_tpu.device import pallas_tower as ptw
from threshold_crypto_tpu.host import curve as hcv
from threshold_crypto_tpu.host.params import R

rnd = random.Random(0x5CA1A5)


def _host_points(curve_host, n):
    g = curve_host.generator
    return [curve_host.mul(g, rnd.randrange(1, R)) for _ in range(n)]


def _build_cases(curve, curve_host, n=128):
    """(T_jac [n], Q_aff pytree [n], bits [n], expected via XLA ops).

    Lane roles: 0: T=inf; 1: Q=inf (bit cleared by driver); 2: 2T == Q
    (madd doubling case); 3: 2T == -Q (cancellation); rest random.
    """
    pts = _host_points(curve_host, n)
    qs = _host_points(curve_host, n)
    # lane 2: Q = 2T
    qs[2] = curve_host.add(pts[2], pts[2])
    # lane 3: Q = -(2T)
    qs[3] = curve_host.neg(curve_host.add(pts[3], pts[3]))
    bits = [rnd.randrange(2) for _ in range(n)]
    bits[0] = bits[2] = bits[3] = 1
    bits[1] = 0  # Q-at-infinity lane: driver clears the bit

    T = curve.from_host_affine([None if i == 0 else p
                                for i, p in enumerate(pts)])
    # give T non-trivial Z coordinates: T <- double(T_in) then use as state?
    # No: feed Jacobian Z != 1 by doubling on the XLA side first.
    T = curve.double(T)
    qs[1] = None
    Q_jac = curve.from_host_affine(qs)

    # expected: select(bit, double(T) + Q, double(T))
    d = curve.double(T)
    added = curve.add(d, Q_jac)
    bits_arr = jnp.asarray(np.array(bits, np.uint32))
    exp = dcv._select_pt(curve.f, bits_arr != 0, added, d)
    return T, Q_jac, bits_arr, exp


def _pack_jac(curve, T, n):
    if curve is dcv.G2:
        comps = [T[0][0], T[0][1], T[1][0], T[1][1], T[2][0], T[2][1]]
    else:
        comps = list(T)
    return ptw.pack([c.reshape(n, ptw.XL) for c in comps], n)


def _pack_aff_from_jac(curve, Q_jac, n):
    """Affine components of Z∈{0,1} Jacobian points (as from_host_affine)."""
    x, y = Q_jac[0], Q_jac[1]
    if curve is dcv.G2:
        comps = [x[0], x[1], y[0], y[1]]
    else:
        comps = [x, y]
    return ptw.pack([c.reshape(n, ptw.XL) for c in comps], n)


def _unpack_jac(curve, acc, n):
    k = 6 if curve is dcv.G2 else 3
    comps = ptw.unpack(acc, k, n)
    if curve is dcv.G2:
        return ((comps[0], comps[1]), (comps[2], comps[3]),
                (comps[4], comps[5]))
    return (comps[0], comps[1], comps[2])


def _check_step(curve, curve_host, impl):
    n = 128
    T, Q, bits, exp = _build_cases(curve, curve_host, n)
    acc = _pack_jac(curve, T, n)
    qp = _pack_aff_from_jac(curve, Q, n)
    R_ = ptw.pack_rows(n)
    bit_plane = jnp.pad(bits, (0, R_ * ptw.LANES - n)).reshape(1, R_, 128)
    ptw.DIRECT = True
    try:
        out = impl(acc, qp, bit_plane)
    finally:
        ptw.DIRECT = False
    got = _unpack_jac(curve, out, n)
    ok = np.asarray(curve.eq(got, exp))
    assert ok.all(), f"lanes differ: {np.nonzero(~ok)[0][:8]}"


def test_g1_msm_step_matches_xla():
    _check_step(dcv.G1, hcv.G1, pcv._g1_step_impl)


def test_g2_msm_step_matches_xla():
    _check_step(dcv.G2, hcv.G2, pcv._g2_step_impl)


def test_msm_pallas_matches_msm_naive():
    """4-bit end-to-end msm_pallas (DIRECT) == XLA msm_naive."""
    from threshold_crypto_tpu.device import pairing as dpr

    n = 8
    pts = _host_points(hcv.G1, n)
    pts[5] = None  # an infinity lane
    aff = dpr.g1_affine_from_host(pts)
    scalars = np.zeros((n, 16), np.uint32)
    for i in range(n):
        scalars[i, 0] = rnd.randrange(16)  # 4-bit scalars
    scalars = jnp.asarray(scalars)

    ptw.DIRECT = True
    try:
        got = pcv.msm_pallas(dcv.G1, aff, scalars, nbits=4)
    finally:
        ptw.DIRECT = False

    jac = dcv.G1.from_host_affine(pts)
    want = dcv.G1.msm_naive(jac, scalars, nbits=4)
    got1 = jax.tree_util.tree_map(lambda a: a[None], got)
    want1 = jax.tree_util.tree_map(lambda a: a[None], want)
    assert bool(np.asarray(dcv.G1.eq(got1, want1))[0])


import jax  # noqa: E402  (used in the test above)


def _check_step4(curve, curve_host, impl):
    """Windowed step: out == 16·T (+ d·P for digit d), incl. special lanes."""
    n = 128
    pts = _host_points(curve_host, n)
    qs = _host_points(curve_host, n)
    digits = [rnd.randrange(16) for _ in range(n)]
    digits[0] = 0              # no-add lane
    digits[1] = 7              # T at infinity lane (below)
    # lane 2: 16T == d·Q (doubling case inside the full add)
    digits[2] = 3
    T_host = list(pts)
    qs[2] = curve_host.mul(T_host[2], pow(3, -1, R) * 16 % R)
    # lane 3: 16T == -(d·Q) (cancellation)
    digits[3] = 5
    qs[3] = curve_host.mul(T_host[3], (-pow(5, -1, R) * 16) % R)

    T = curve.from_host_affine(
        [None if i == 1 else p for i, p in enumerate(T_host)]
    )
    Q_jac = curve.from_host_affine(qs)

    # XLA expectation: 16T + d·Q via generic ops
    acc = T
    for _ in range(4):
        acc = curve.double(acc)
    scal = np.zeros((n, 16), np.uint32)
    for i, d in enumerate(digits):
        scal[i, 0] = d
    dq = curve.scalar_mul_naive(Q_jac, jnp.asarray(scal), nbits=4)
    exp = curve.add(acc, dq)

    # build the packed 15-entry Jacobian table the driver would build
    entries = []
    cur = Q_jac
    entries.append(cur)
    for _ in range(14):
        cur = curve.add(cur, Q_jac)
        entries.append(cur)
    tab_comps = []
    from threshold_crypto_tpu.device.pallas_curve import _jac_comps
    for e in entries:
        tab_comps += [c.reshape(n, ptw.XL) for c in _jac_comps(curve, e)]
    tab_packed = ptw.pack(tab_comps, n)

    accp = _pack_jac(curve, T, n)
    R_ = ptw.pack_rows(n)
    digit_plane = jnp.pad(
        jnp.asarray(np.array(digits, np.uint32)), (0, R_ * ptw.LANES - n)
    ).reshape(1, R_, 128)
    ptw.DIRECT = True
    try:
        out = impl(accp, tab_packed, digit_plane)
    finally:
        ptw.DIRECT = False
    got = _unpack_jac(curve, out, n)
    ok = np.asarray(curve.eq(got, exp))
    assert ok.all(), f"lanes differ: {np.nonzero(~ok)[0][:8]}"


def test_g1_msm_step4_matches_xla():
    _check_step4(dcv.G1, hcv.G1, pcv._g1_step4_impl)


def test_g2_msm_step4_matches_xla():
    _check_step4(dcv.G2, hcv.G2, pcv._g2_step4_impl)


def test_msm_pallas_w4_matches_msm_naive():
    """8-bit end-to-end msm_pallas window=4 (DIRECT) == XLA msm_naive."""
    from threshold_crypto_tpu.device import pairing as dpr

    n = 8
    pts = _host_points(hcv.G1, n)
    pts[5] = None
    aff = dpr.g1_affine_from_host(pts)
    scalars = np.zeros((n, 16), np.uint32)
    for i in range(n):
        scalars[i, 0] = rnd.randrange(256)  # 8-bit scalars
    scalars = jnp.asarray(scalars)

    ptw.DIRECT = True
    try:
        got = pcv.msm_pallas(dcv.G1, aff, scalars, nbits=8, window=4)
    finally:
        ptw.DIRECT = False

    jac = dcv.G1.from_host_affine(pts)
    want = dcv.G1.msm_naive(jac, scalars, nbits=8)
    got1 = jax.tree_util.tree_map(lambda a: a[None], got)
    want1 = jax.tree_util.tree_map(lambda a: a[None], want)
    assert bool(np.asarray(dcv.G1.eq(got1, want1))[0])


def _check_shared(curve, curve_host, n, nbits, window=3, mode="direct"):
    """msm_pallas_shared (DIRECT) == host-oracle Σ k_i·P_i, with infinity
    lanes, zero scalars, duplicate points, and (n > 1024) multi-block
    accumulation scans."""
    from threshold_crypto_tpu.device import pairing as dpr

    pts = _host_points(curve_host, n)
    ks = [rnd.randrange(1 << nbits) for _ in range(n)]
    pts[1] = None          # infinity lane
    ks[0] = 0              # zero-scalar lane
    if n > 3:
        pts[3] = pts[2]    # duplicate points

    # host oracle
    acc = None
    for p, k in zip(pts, ks):
        if p is None or k == 0:
            continue
        term = curve_host.mul(p, k)
        acc = term if acc is None else curve_host.add(acc, term)

    from_host = (
        dpr.g2_affine_from_host if curve is dcv.G2 else dpr.g1_affine_from_host
    )
    aff = from_host(pts)
    scal = np.zeros((n, 16), np.uint32)
    nlimb = min(16, -(-nbits // 16))
    for i, k in enumerate(ks):
        for limb in range(nlimb):
            scal[i, limb] = (k >> (16 * limb)) & 0xFFFF
    if mode == "direct":
        ptw.DIRECT = True
    else:
        ptw.INTERPRET = True
    try:
        got = pcv.msm_pallas_shared(curve, aff, jnp.asarray(scal),
                                    nbits=nbits, window=window)
    finally:
        ptw.DIRECT = False
        ptw.INTERPRET = False
    got_host = curve.to_host_affine(
        jax.tree_util.tree_map(lambda a: a[None], got)
    )[0]
    assert got_host == acc, f"{curve.name} shared MSM mismatch"


def test_msm_pallas_shared_g1_small_64bit():
    _check_shared(dcv.G1, hcv.G1, 8, 64, window=3)


@pytest.mark.slow
def test_msm_pallas_shared_g2_small_64bit():
    _check_shared(dcv.G2, hcv.G2, 8, 64, window=3)


@pytest.mark.slow
def test_msm_pallas_shared_g2_w4():
    _check_shared(dcv.G2, hcv.G2, 8, 16, window=4)


@pytest.mark.slow
def test_msm_pallas_shared_g1_multiblock():
    # n > 1024 exercises the multi-block inner scan + row padding
    _check_shared(dcv.G1, hcv.G1, 1200, 8, window=3)


# NOTE: the fused (window x block)-grid winacc kernel (the non-DIRECT TPU
# path: VMEM-scratch accumulator, sequential grid) is NOT exercised here —
# the Pallas interpreter needs >40 min for one tiny case on this host's
# two CPU cores.  Its math is the same _jac_dbl/_jac_add/select code the
# DIRECT tests above cover; the pl.when/scratch plumbing is validated
# on-chip by benches/msm_shared.py, which asserts the fused result equals
# the XLA `msm_scalarwise` oracle at N=65536 on every run (and the RLC
# aggregate check would fail end-to-end on any mismatch).


@pytest.mark.slow
def test_msm_pallas_shared_255bit_combine():
    """Full 255-bit scalars (the Lagrange-combine shape: 85 base-8
    windows) through the shared MSM == host oracle."""
    _check_shared(dcv.G2, hcv.G2, 4, 255, window=3)


def test_msm_pallas_nofold_matches_scalar_mul():
    """fold=False (the per-lane Pallas scalar-mul behind encrypt_batch_
    pallas) == the XLA scalar_mul ladder, lane for lane."""
    from threshold_crypto_tpu.device import pairing as dpr

    n = 8
    pts = _host_points(hcv.G1, n)
    pts[5] = None
    aff = dpr.g1_affine_from_host(pts)
    scalars = np.zeros((n, 16), np.uint32)
    for i in range(n):
        scalars[i, 0] = rnd.randrange(256)
    scalars = jnp.asarray(scalars)

    ptw.DIRECT = True
    try:
        got = pcv.msm_pallas(dcv.G1, aff, scalars, nbits=8, window=4,
                             fold=False)
    finally:
        ptw.DIRECT = False

    jac = dcv.G1.from_host_affine(pts)
    want = dcv.G1.scalar_mul(jac, scalars, nbits=8, window=1)
    ok = np.asarray(dcv.G1.eq(got, want))
    # the infinity lane's digits are masked: its product must be infinity
    assert bool(np.asarray(dcv.G1.is_infinity(got))[5])
    assert ok[np.arange(n) != 5].all()


def _check_fixed(curve, curve_host, n, k):
    from threshold_crypto_tpu.device import pairing as dpr

    pts = _host_points(curve_host, n)
    pts[1] = None  # infinity lane
    aff = (dpr.g2_affine_from_host(pts) if curve is dcv.G2
           else dpr.g1_affine_from_host(pts))

    ptw.DIRECT = True
    try:
        got = pcv.scalar_mul_fixed_pallas(curve, aff, k)
    finally:
        ptw.DIRECT = False

    want = curve.from_host_affine([curve_host.mul(p, k) for p in pts])
    ok = np.asarray(curve.eq(got, want))
    inf = np.asarray(curve.is_infinity(got))
    assert bool(inf[1])
    assert ok[np.arange(n) != 1].all(), np.nonzero(~ok)[0][:8]


def test_scalar_mul_fixed_pallas_g1():
    """Static-scalar windowed ladder (DIRECT) == host mul, G1, with an
    infinity lane; k wider than a whole number of 4-bit windows."""
    _check_fixed(dcv.G1, hcv.G1, 8, 0x1D2E9F40312C7B)


def test_scalar_mul_fixed_pallas_g2():
    """Static-scalar windowed ladder (DIRECT) == host mul, G2."""
    _check_fixed(dcv.G2, hcv.G2, 4, 0xB493A0517E2D86F01)


def test_scalar_mul_fixed_pallas_zero():
    """k = 0 yields infinity on every lane."""
    from threshold_crypto_tpu.device import pairing as dpr

    pts = _host_points(hcv.G1, 4)
    aff = dpr.g1_affine_from_host(pts)
    ptw.DIRECT = True
    try:
        got = pcv.scalar_mul_fixed_pallas(dcv.G1, aff, 0)
    finally:
        ptw.DIRECT = False
    assert np.asarray(dcv.G1.is_infinity(got)).all()
