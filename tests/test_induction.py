"""Actuator-disk induction model tests.

Mirrors the reference strategy of tiny end-to-end solves per feature config
(test/trials/test_trials.py actuator variants) plus unit checks of the
momentum-theory residual (actuator.py:149-167) on hand-constructed states.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from awebox_tpu.api.trial import Trial
from awebox_tpu.arch import Architecture
from awebox_tpu.model.aero import actuator, induction
from awebox_tpu.model.builder import make_model
from tests.test_options import make_ampyx_options

pytestmark = pytest.mark.slow  # compile-heavy tier; core suite runs without -m slow


def make_actuator_options(steadyness='quasi-steady', symmetry='axisymmetric'):
    options = make_ampyx_options()
    options['user_options.system_model.kite_dof'] = 3
    options['user_options.induction_model'] = 'actuator'
    options['model.aero.actuator.steadyness'] = steadyness
    options['model.aero.actuator.symmetry'] = symmetry
    options['nlp.n_k'] = 4
    options['nlp.collocation.d'] = 3
    return options


def build_model(options):
    arch = Architecture({1: 0})
    built = options.build(arch)
    return make_model(built, arch), built, arch


def test_variable_sets_per_variant():
    m, _, _ = build_model(make_actuator_options('quasi-steady', 'axisymmetric'))
    assert 'ui10' in m.layout.names('z')
    assert 'a_qaxi0' in m.layout.names('z')

    m, _, _ = build_model(make_actuator_options('quasi-steady', 'asymmetric'))
    for n in ('a_qasym0', 'acos_qasym0', 'asin_qasym0'):
        assert n in m.layout.names('z')

    m, _, _ = build_model(make_actuator_options('unsteady', 'axisymmetric'))
    assert 'a_uaxi0' in m.layout.names('x')
    assert 'da_uaxi0' in m.layout.names('xdot')


def _consistent_state(m, arch):
    """A state vector where the kite flies a circle crosswind."""
    v = np.zeros(m.layout.total_dim)
    si_scale = m.scaling
    layout = m.layout

    def set_var(t, name, val):
        sl = layout.slices[t][name]
        off = layout.type_offsets[t]
        v[off + sl.start:off + sl.stop] = np.asarray(val) / si_scale[t][sl]

    set_var('x', 'q10', [200., 0., 150.])
    set_var('x', 'dq10', [0., 30., 0.])
    set_var('x', 'coeff10', [1., 0.])
    set_var('x', 'l_t', 250.)
    set_var('z', 'lambda10', 1.)
    set_var('z', 'a_qaxi0', 0.2)
    set_var('z', 'ui10', [-0.5, 0., 0.])
    set_var('theta', 'diam_t', 0.005)
    set_var('theta', 't_f', 30.)
    return v


def test_momentum_theory_residual_consistency():
    """At a state where thrust exactly equals 4 corr (1-a) q A, the qaxi
    residual row is zero."""
    m, built, arch = build_model(make_actuator_options())
    v = _consistent_state(m, arch)
    si = m.to_si(jnp.asarray(v))
    theta0 = m.theta0_init

    sup = actuator.layer_support(m.cfg, si, theta0, arch, 0)
    # forces from the 3-DOF aero model
    from awebox_tpu.model.aero import kite_aero
    f_earth, _, _ = kite_aero.forces_and_outputs(m.cfg, si, theta0, arch)
    thrust = float(f_earth[1] @ sup['n_hat'])

    # solve 4 corr(a) (1-a) q A = thrust for the 'simple' correction:
    # corr = cosgamma - a  =>  quadratic in a
    qA = float(sup['qzero'] * sup['area'])
    cg = float(sup['cosgamma'])
    # 4 (cg - a)(1 - a) qA = thrust
    coeffs = [4. * qA, -4. * qA * (1. + cg), 4. * qA * cg - thrust]
    roots = np.roots(coeffs)
    a_root = min(r.real for r in roots if abs(r.imag) < 1e-12 and r.real > -0.2)

    layout = m.layout
    sl = layout.slices['z']['a_qaxi0']
    off = layout.type_offsets['z']
    v2 = v.copy()
    v2[off + sl.start] = a_root / m.scaling['z'][sl][0]

    si2 = m.to_si(jnp.asarray(v2))
    refs = {
        'thrust_ref': 1.0, 'moment_ref': 1.0, 'a_ref': 0.33,
        'varrho_ref': m.cfg['act_varrho_ref'],
        'b_ref': m.cfg['geometry_static']['b_ref'],
        'u_ref': theta0['wind']['u_ref'],
    }
    resi = actuator.residuals_for_layer(
        m.cfg, si2, theta0, arch, 0, 'qaxi', f_earth, refs)
    assert abs(float(resi[0])) < 1e-6


def test_iota_blend():
    """iota=1 pins ui to zero; iota=0 pins ui to the actuator model value."""
    m, built, arch = build_model(make_actuator_options())
    v = _consistent_state(m, arch)
    si = m.to_si(jnp.asarray(v))
    theta0 = m.theta0_init
    from awebox_tpu.model.aero import kite_aero
    f_earth, _, _ = kite_aero.forces_and_outputs(m.cfg, si, theta0, arch)
    refs = {'thrust_ref': 1., 'moment_ref': 1., 'a_ref': 0.33,
            'varrho_ref': m.cfg['act_varrho_ref'],
            'b_ref': m.cfg['geometry_static']['b_ref'],
            'u_ref': theta0['wind']['u_ref']}

    res1 = induction.residuals(m.cfg, si, theta0, arch, 1.0, f_earth, refs)
    ui = np.asarray(si['z']['ui10'])
    u_ref = float(theta0['wind']['u_ref'])
    np.testing.assert_allclose(np.asarray(res1[:3]) * u_ref, ui, rtol=1e-10)

    res0 = induction.residuals(m.cfg, si, theta0, arch, 0.0, f_earth, refs)
    ui_model = actuator.induced_velocity_at_kite(
        m.cfg, si, theta0, arch, 1, 'qaxi')
    np.testing.assert_allclose(np.asarray(res0[:3]) * u_ref,
                               ui - np.asarray(ui_model), rtol=1e-8)

    # induced velocity direction: opposite the disk normal for a > 0
    sup = actuator.layer_support(m.cfg, si, theta0, arch, 0)
    assert float(jnp.asarray(ui_model) @ sup['n_hat']) < 0.


@pytest.mark.slow
def test_actuator_qaxi_e2e():
    """Tiny single-kite power cycle with the qaxi actuator model converges
    through the induction homotopy step."""
    trial = Trial(make_actuator_options(), 'act_qaxi').build()
    trial.optimize(verbose=False)
    assert trial.solve_succeeded
    go = trial.global_outputs()
    assert 15. < go['time_period'] < 80.
    # induction factor within the momentum-theory band at the solution
    outputs = trial.outputs_on_coll()
    a = np.asarray(outputs['actuator']['a_qaxi0'])
    assert np.all(a > -1e-6) and np.all(a < 0.5 + 1e-6)
    # induced velocity is active (nonzero) at the solution
    ui = np.asarray(outputs['actuator']['ui1'])
    assert np.max(np.abs(ui)) > 1e-3
