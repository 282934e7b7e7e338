"""Collocation coefficient correctness.

Radau points/weights checked against the known closed forms that the reference
obtains from casadi.collocation_points (ocp/collocation.py:67-200).
"""
import numpy as np

from awebox_tpu.ocp.collocation import Collocation, collocation_points


def test_radau_points_d2():
    taus = collocation_points(2, 'radau')
    np.testing.assert_allclose(taus, [1. / 3., 1.], atol=1e-12)


def test_radau_points_d4():
    taus = collocation_points(4, 'radau')
    # roots of the degree-4 right-Radau polynomial (known values)
    expected = [0.0885879595127039, 0.409466864440735, 0.787659461760847, 1.0]
    np.testing.assert_allclose(taus, expected, atol=1e-10)


def test_legendre_points_d3():
    taus = collocation_points(3, 'legendre')
    expected = (np.array([-np.sqrt(3. / 5.), 0., np.sqrt(3. / 5.)]) + 1.) / 2.
    np.testing.assert_allclose(taus, expected, atol=1e-12)


def test_quadrature_integrates_polynomials_exactly():
    # Radau quadrature with d nodes is exact for polynomials up to degree 2d-2
    for d in [2, 3, 4]:
        coll = Collocation.build(d, 'radau')
        taus = coll.tau_root[1:]
        for p in range(2 * d - 1):
            integral = np.dot(coll.quad_weights, taus ** p)
            np.testing.assert_allclose(integral, 1. / (p + 1), atol=1e-10,
                                       err_msg=f'd={d}, p={p}')


def test_differentiation_matrix():
    # the collocation derivative of a polynomial sampled at the nodes must
    # match the analytic derivative at the nodes
    d = 4
    coll = Collocation.build(d, 'radau')
    rng = np.random.default_rng(0)
    c = rng.normal(size=d + 1)  # polynomial of degree d
    poly = np.poly1d(c)
    vals = poly(coll.tau_root)
    derivs = vals @ coll.coeff_collocation  # [r] = sum_j vals_j * dl_j(tau_r)
    np.testing.assert_allclose(derivs, poly.deriv()(coll.tau_root), atol=1e-9)


def test_continuity_coefficients():
    d = 4
    coll = Collocation.build(d, 'radau')
    c = np.random.default_rng(1).normal(size=d + 1)
    poly = np.poly1d(c)
    vals = poly(coll.tau_root)
    np.testing.assert_allclose(np.dot(vals, coll.coeff_continuity), poly(1.0),
                               atol=1e-9)
    # radau: last collocation point is 1.0, so continuity is a selector
    np.testing.assert_allclose(coll.coeff_continuity,
                               np.eye(d + 1)[-1], atol=1e-9)
