"""Unit tests for the round-2 physics additions: Reynolds-dependent tether
cd, datafile wind profile fit, orbit-geometry estimators."""
import numpy as np

from awebox_tpu.model import tether, wind


def _cfg(cd_model):
    return {'tether_cd_model': cd_model, 'tether_reynolds_smoothing': 1e-4,
            'atmosphere_model': 'isa', 'wind_model': 'power'}


def _theta0():
    return {'tether': {'cd': 1.2},
            'atmosphere': {'g': 9.81, 'gamma': 1.4, 'r': 287.053,
                           't_ref': 288.15, 'p_ref': 101325., 'rho_ref': 1.225,
                           'gamma_air': 6.5e-3, 'mu_ref': 1.789e-5,
                           'c_sutherland': 120.}}


def test_cd_constant():
    cd = tether.drag_coefficient(_cfg('constant'), _theta0(), np.array(1e5))
    assert float(cd) == 1.2


def test_cd_piecewise_regimes():
    """Roshko piecewise fit (coefficients.py:95-158): laminar plateau ~1,
    drag crisis dips well below 1, high-Re plateau ~0.8."""
    cfg = _cfg('piecewise')
    t0 = _theta0()
    cd_laminar = float(tether.drag_coefficient(cfg, t0, np.array(1e3)))
    cd_crisis = float(tether.drag_coefficient(cfg, t0, np.array(4e5)))
    cd_high = float(tether.drag_coefficient(cfg, t0, np.array(1e8)))
    assert abs(cd_laminar - 1.0) < 0.1
    assert cd_crisis < 0.75
    assert abs(cd_high - 0.8) < 0.1
    # smooth and finite across the whole range
    res = np.asarray([float(tether.drag_coefficient(cfg, t0, np.array(r)))
                      for r in np.logspace(0, 9, 50)])
    assert np.isfinite(res).all() and (res > 0).all()


def test_reynolds_number_magnitude():
    """Re = rho u d / mu ~ 3.4e3 for a 5 mm tether at 10 m/s, sea level
    (1.225 * 10 * 0.005 / 1.789e-5)."""
    re = float(tether.reynolds_number(_cfg('constant'), _theta0(),
                                      np.array(0.), np.array(10.), 5e-3))
    assert 3e3 < re < 4e3


def test_wind_datafile_fit_roundtrip():
    """The penalized fit reproduces a smooth measured profile and evaluates
    as a jax function (wind.py:107-173 + lagr_interpol.py role)."""
    heights = np.array([10., 50., 100., 200., 400., 700.])
    u_x = 8. * (heights / 100.) ** 0.15
    u_y = 0.5 * np.ones_like(heights)
    params = wind.fit_datafile_profile(heights, u_x, u_y)
    for h, ux in zip(heights, u_x):
        vel = np.asarray(wind.get_velocity('datafile', params, np.array(h)))
        assert abs(vel[0] - ux) / ux < 0.05
        assert abs(vel[1] - 0.5) < 0.1
        assert vel[2] == 0.
    speed = float(wind.get_speed('datafile', params, np.array(150.)))
    assert 7. < speed < 11.


def test_geometry_models_circular_orbit():
    """On an exact circular orbit, 'frenet' recovers the circle center;
    'averaged' returns the kite position itself (single kite); 'parent'
    returns the parent node position."""
    from awebox_tpu.arch import Architecture
    from awebox_tpu.model.aero import geometry

    arch = Architecture({1: 0})
    R, omega = 50., 0.8
    phase = 0.3
    center_true = np.array([0., 0., 200.])
    e1, e2 = np.array([0., 1., 0.]), np.array([0., 0., 1.])
    q = center_true + R * (np.cos(phase) * e1 + np.sin(phase) * e2)
    dq = R * omega * (-np.sin(phase) * e1 + np.cos(phase) * e2)
    ddq = -R * omega ** 2 * (np.cos(phase) * e1 + np.sin(phase) * e2)
    si = {'x': {'q10': q, 'dq10': dq}, 'xdot': {'ddq10': ddq}}

    c_avg, dc_avg = geometry.center_and_velocity('averaged', si, arch, 0)
    np.testing.assert_allclose(np.asarray(c_avg), q)
    np.testing.assert_allclose(np.asarray(dc_avg), dq)

    c_fre, dc_fre = geometry.center_and_velocity('frenet', si, arch, 0)
    np.testing.assert_allclose(np.asarray(c_fre), center_true, atol=1e-6)
    # circle center is stationary up to the dropped-torsion approximation
    assert np.linalg.norm(np.asarray(dc_fre)) < 1e-6 * R * omega

    c_par, _ = geometry.center_and_velocity('parent', si, arch, 0)
    np.testing.assert_allclose(np.asarray(c_par), np.zeros(3))
