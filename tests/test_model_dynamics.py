"""Model dynamics unit tests: structure, trivial kinematics, DCM evolution,
and a hand-checkable Newton/pendulum verification of the Lagrangian chain.

The Newton check mirrors the reference's philosophy of validating the implicit
DAE residual on states with known closed-form dynamics
(/root/reference/test/units/test_model.py).
"""
import functools

import jax
import numpy as np
import pytest

from awebox_tpu.arch import Architecture
from awebox_tpu.model.builder import make_model
from awebox_tpu.model.system import PHI_NAMES
from tests.test_options import make_ampyx_options

pytestmark = pytest.mark.slow  # compile-heavy tier; core suite runs without -m slow


@functools.lru_cache(maxsize=None)
def _build(kind):
    options = make_ampyx_options()
    if kind in ('3dof', '3dof_newton'):
        options['user_options.system_model.kite_dof'] = 3
    if kind == '3dof_newton':
        options['user_options.tether_drag_model'] = 'not_in_use'
        options['user_options.wind.model'] = 'uniform'
        options['user_options.atmosphere'] = 'uniform'
    arch = Architecture({1: 0})
    processed = options.build(arch)
    model = make_model(processed, arch)
    model.eq_jit = jax.jit(model.eq_fn)
    return model, processed, arch


def build_6dof_model():
    return _build('6dof')


def build_3dof_model(extra=None):
    return _build('3dof_newton' if extra else '3dof')


def set_var(model, v, var_type, name, value_si):
    """Set an SI value into the scaled flat model-variables vector."""
    sl = model.layout.slices[var_type][name]
    off = model.layout.type_offsets[var_type]
    idx = np.arange(sl.start, sl.stop) + off
    scale = model.scaling[var_type][sl]
    v[idx] = np.reshape(np.asarray(value_si, dtype=float), -1) / scale
    return v


def test_eq_count_is_nx_plus_nz_6dof():
    model, _, _ = build_6dof_model()
    assert model.n_eq == model.layout.dims['x'] + model.layout.dims['z']
    # eq components present
    assert 'dynamics_translation' in model.eq_slices
    assert 'dynamics_constraint' in model.eq_slices
    assert 'rotation_dynamics1' in model.eq_slices
    assert 'ref_frame_dynamics1' in model.eq_slices
    assert 'trivial_dq10' in model.eq_slices
    assert 'trivial_ddelta10' in model.eq_slices
    assert 'trivial_ddl_t' in model.eq_slices
    assert 'integral_e' in model.eq_slices


def test_eq_count_is_nx_plus_nz_3dof():
    model, _, _ = build_3dof_model()
    assert model.n_eq == model.layout.dims['x'] + model.layout.dims['z']
    assert 'trivial_dcoeff10' in model.eq_slices


def test_newton_point_mass():
    """With negligible tether mass, no drag, near-zero wind, zero airspeed:
    the translation residual must reduce to m*ddq + m*g*zhat + lambda*q - f_fict."""
    model, processed, arch = build_3dof_model(extra={
        'user_options.tether_drag_model': 'not_in_use',
        'user_options.wind.model': 'uniform',
        'user_options.atmosphere': 'uniform',
    })
    theta0 = model.theta0_init
    theta0['tether']['rho'] = np.asarray(1e-12)   # massless tether
    theta0['wind']['u_ref'] = np.asarray(1e-8)    # still air

    m = float(theta0['geometry']['m_k'])
    g = 9.81
    l_t = 200.
    q = np.array([0., 0., l_t])
    ddq = np.array([1.3, -0.7, 2.1])
    lam = 0.8
    f_needed = m * ddq + m * g * np.array([0., 0., 1.]) + lam * q

    v = np.zeros(model.layout.total_dim)
    set_var(model, v, 'x', 'q10', q)
    set_var(model, v, 'x', 'dq10', np.zeros(3))
    set_var(model, v, 'x', 'l_t', l_t)
    set_var(model, v, 'x', 'dl_t', 0.)
    set_var(model, v, 'x', 'coeff', np.zeros(2)) if model.layout.has('x', 'coeff') else None
    set_var(model, v, 'x', 'coeff10', np.zeros(2))
    set_var(model, v, 'xdot', 'ddq10', ddq)
    set_var(model, v, 'z', 'lambda10', lam)
    set_var(model, v, 'u', 'f_fict10', f_needed)
    set_var(model, v, 'theta', 'diam_t', 2e-3)
    set_var(model, v, 'theta', 't_f', 30.)

    phi = np.ones(len(PHI_NAMES))  # gamma = 1: fictitious force active
    res = np.asarray(model.eq_jit(v, phi, theta0))
    translation = res[model.eq_slices['dynamics_translation']]
    np.testing.assert_allclose(translation, 0., atol=1e-9)

    # trivial kinematics rows vanish when xdot vars equal their counterparts
    set_var(model, v, 'xdot', 'dq10', np.zeros(3))
    set_var(model, v, 'xdot', 'dl_t', 0.)
    set_var(model, v, 'xdot', 'ddl_t', 0.)
    set_var(model, v, 'u', 'ddl_t', 0.)
    res = np.asarray(model.eq_jit(v, phi, theta0))
    np.testing.assert_allclose(res[model.eq_slices['trivial_dq10']], 0., atol=1e-12)
    np.testing.assert_allclose(res[model.eq_slices['trivial_ddl_t']], 0., atol=1e-12)


def test_holonomic_circular_state():
    """On a consistent circular state (|q|=l_t, dq perpendicular to q,
    centripetal ddq), the Baumgarte-stabilized holonomic residual vanishes."""
    model, processed, arch = build_3dof_model()
    theta0 = model.theta0_init

    l_t = 200.
    speed = 15.
    q = l_t / np.sqrt(2.) * np.array([1., 0., 1.])
    that = np.array([0., 1., 0.])
    dq = speed * that
    # gddot = |dq|^2 + q.ddq - l dl' ... with dl_t=0, ddq s.t. q.ddq = -|dq|^2
    ddq = -speed ** 2 / l_t ** 2 * q

    v = np.zeros(model.layout.total_dim)
    set_var(model, v, 'x', 'q10', q)
    set_var(model, v, 'x', 'dq10', dq)
    set_var(model, v, 'x', 'l_t', l_t)
    set_var(model, v, 'x', 'dl_t', 0.)
    set_var(model, v, 'xdot', 'ddq10', ddq)
    set_var(model, v, 'xdot', 'ddl_t', 0.)
    set_var(model, v, 'theta', 'diam_t', 2e-3)
    set_var(model, v, 'theta', 't_f', 30.)

    phi = np.ones(len(PHI_NAMES))
    res = np.asarray(model.eq_jit(v, phi, theta0))
    np.testing.assert_allclose(res[model.eq_slices['dynamics_constraint']], 0., atol=1e-9)


def test_dcm_residual():
    """6-DOF: DCM evolution residual vanishes when dR = R*skew(omega)."""
    model, processed, arch = build_6dof_model()
    theta0 = model.theta0_init

    rng = np.random.default_rng(3)
    # random orthonormal R
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    omega = np.array([0.1, -0.2, 0.3])
    skew = np.array([[0, -omega[2], omega[1]],
                     [omega[2], 0, -omega[0]],
                     [-omega[1], omega[0], 0]])
    dR = Q @ skew

    v = np.zeros(model.layout.total_dim)
    set_var(model, v, 'x', 'q10', np.array([100., 0., 150.]))
    set_var(model, v, 'x', 'l_t', 200.)
    set_var(model, v, 'x', 'r10', Q.reshape(9))
    set_var(model, v, 'x', 'omega10', omega)
    set_var(model, v, 'xdot', 'dr10', dR.reshape(9))
    set_var(model, v, 'theta', 'diam_t', 2e-3)
    set_var(model, v, 'theta', 't_f', 30.)

    phi = np.ones(len(PHI_NAMES))
    res = np.asarray(model.eq_jit(v, phi, theta0))
    np.testing.assert_allclose(res[model.eq_slices['ref_frame_dynamics1']], 0., atol=1e-10)


def test_energy_row_matches_power():
    model, processed, arch = build_6dof_model()
    theta0 = model.theta0_init
    v = np.asarray(np.random.default_rng(0).normal(size=model.layout.total_dim) * 0.1)
    v = np.array(v)
    set_var(model, v, 'x', 'q10', np.array([120., 30., 140.]))
    set_var(model, v, 'x', 'l_t', 200.)
    set_var(model, v, 'x', 'dl_t', 5.)
    set_var(model, v, 'z', 'lambda10', 3.)
    phi = np.ones(len(PHI_NAMES))
    power = float(model.power_fn(v, phi, theta0))
    np.testing.assert_allclose(power, 3. * 200. * 5., rtol=1e-12)

    e_scale = processed['processed']['scaling']['x']['e']
    set_var(model, v, 'xdot', 'de', power)  # de set in SI
    res = np.asarray(model.eq_jit(v, phi, theta0))
    np.testing.assert_allclose(res[model.eq_slices['integral_e']], 0., atol=1e-10)


def test_ineq_structure_ampyx():
    model, _, _ = build_6dof_model()
    names = list(model.ineq_slices.keys())
    assert 'tether_force_max10' in names
    assert 'tether_force_min10' in names
    assert 'airspeed_max10' in names
    assert 'alpha_ub1' in names
    assert 'rotation_max10' in names
    assert not any('anticollision' in n for n in names)  # single kite
    assert not any('acceleration' in n for n in names)   # ampyx disables
