"""Trajectory families beyond power_cycle: landing / transition / launch
with xi-parameterized boundary trajectories.

Counterpart of the reference's operation/formulation machinery
(/root/reference/awebox/ocp/operation.py:52-377, formulation.py:78-187,
tools/parameterization.py) exercised on a tiny solved power cycle as the
source trajectory.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from awebox_tpu.api.trial import Trial
# solved_trial fixture comes from tests/conftest.py (session scope)
from tests.test_options import make_ampyx_options

pytestmark = pytest.mark.slow


def _options(traj_type, source_trial):
    options = make_ampyx_options()
    options['user_options.system_model.kite_dof'] = 3
    options['nlp.n_k'] = 4
    options['nlp.collocation.d'] = 3
    options['user_options.trajectory.type'] = traj_type
    if traj_type in ('transition', 'nominal_landing', 'compromised_landing'):
        options['user_options.trajectory.transition.initial_trajectory'] = \
            source_trial
    if traj_type in ('transition', 'launch'):
        options['user_options.trajectory.transition.terminal_trajectory'] = \
            source_trial
    return options


@pytest.mark.heavy
def test_landing_structure(solved_trial):  # noqa: F811
    trial = Trial(_options('nominal_landing', solved_trial),
                  'landing').build()
    ocp = trial.ocp
    assert ocp.vstruct.with_xi
    assert 'param_initial' in ocp.eq_slices
    assert 'terminal_position' in ocp.ineq_slices
    assert not ocp.periodic

    # the initial guess sweeps the source orbit, so the xi_0 pin is already
    # satisfied at the guess
    from awebox_tpu.opti.homotopy import build_p_fix
    from awebox_tpu.opti.initialization import build_initial_guess, \
        build_reference
    V0 = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V0))
    res = np.asarray(ocp.eq_fn(jnp.asarray(V0), P))
    pin = res[ocp.eq_slices['param_initial']]
    np.testing.assert_allclose(pin, 0., atol=1e-9)

    # terminal inequalities are eta-blended (inactive at eta=1); at eta=0
    # they evaluate finite and start violated (> 0): the orbit end is far
    # outside the landing radius
    from awebox_tpu.model.system import PHI_NAMES
    V_eta0 = V0.copy()
    V_eta0[ocp.vstruct.phi_slice.start + PHI_NAMES.index('eta')] = 0.
    rineq = np.asarray(ocp.ineq_fn(jnp.asarray(V_eta0), P))
    term = rineq[ocp.ineq_slices['terminal_position']]
    assert np.isfinite(term).all()
    assert term.max() > 0.
    # blended off at eta = 1
    rineq1 = np.asarray(ocp.ineq_fn(jnp.asarray(V0), P))
    assert np.allclose(rineq1[ocp.ineq_slices['terminal_position']], 0.)


@pytest.mark.heavy
def test_transition_structure(solved_trial):  # noqa: F811
    trial = Trial(_options('transition', solved_trial), 'transition').build()
    ocp = trial.ocp
    assert 'param_initial' in ocp.eq_slices
    assert 'param_terminal' in ocp.eq_slices
    sl = ocp.eq_slices['param_terminal']
    assert sl.stop - sl.start == ocp.vstruct.nx

    # moving xi_f moves the terminal pin target
    from awebox_tpu.opti.homotopy import build_p_fix
    from awebox_tpu.opti.initialization import build_initial_guess, \
        build_reference
    V0 = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V0))
    r_a = np.asarray(ocp.eq_fn(jnp.asarray(V0), P))[sl]
    V1 = V0.copy()
    V1[ocp.vstruct.xi_slice.start + 1] = 0.5
    r_b = np.asarray(ocp.eq_fn(jnp.asarray(V1), P))[sl]
    assert np.max(np.abs(r_a - r_b)) > 1e-8


@pytest.mark.heavy
def test_launch_structure(solved_trial):  # noqa: F811
    trial = Trial(_options('launch', solved_trial), 'launch').build()
    ocp = trial.ocp
    assert 'initial_conditions' in ocp.eq_slices
    assert 'param_terminal' in ocp.eq_slices
    assert 'param_initial' not in ocp.eq_slices


@pytest.mark.heavy
def test_landing_schedule_branches(solved_trial):  # noqa: F811
    from awebox_tpu.opti.homotopy import define_schedule
    trial = Trial(_options('nominal_landing', solved_trial),
                  'landing_sched').build()
    schedule = define_schedule(trial.ocp)
    assert 'nominal_landing' in schedule['steps']
    assert 'power' not in schedule['steps']
    assert 'eta' in schedule['used_phis']
    # upsilon/nu stay pinned at 1 (tracking blend factors)
    assert {'nu', 'upsilon'} <= schedule['used_phis']


@pytest.mark.heavy
def test_modular_initial_guess_structure(solved_trial):  # noqa: F811
    """Modular primitive-scheduled initializer (reference initialization_dir/
    modular.py role, opti/modular_init.py): for a landing problem the guess
    must be finite, start on the source orbit side, END in the parked
    configuration (near-zero terminal kite speed, reduced radius), and carry
    polynomial-consistent xdot."""
    from awebox_tpu.opti.initialization import build_initial_guess

    options = _options('nominal_landing', solved_trial)
    options['solver.initialization.type'] = 'modular'
    trial = Trial(options, 'landing_modular').build()
    ocp = trial.ocp
    V = build_initial_guess(ocp)
    assert np.isfinite(V).all()

    layout = trial.model.layout
    vs = ocp.vstruct
    q_sl = layout.slices['x']['q10']
    dq_sl = layout.slices['x']['dq10']
    q_scale = trial.model.scaling['x'][q_sl]
    dq_scale = trial.model.scaling['x'][dq_sl]
    X = np.asarray(vs.get_x_all(V))
    # terminal kite nearly at rest (parked configuration)
    v_term = np.linalg.norm(X[-1][dq_sl] * dq_scale)
    v_start = np.linalg.norm(X[0][dq_sl] * dq_scale)
    assert v_term < 0.2 * max(v_start, 1.), (v_term, v_start)
    # radius shrinks toward the parked tether length
    r_term = np.linalg.norm(X[-1][q_sl] * q_scale)
    r_start = np.linalg.norm(X[0][q_sl] * q_scale)
    assert r_term < r_start
    # xdot consistent with the collocation polynomial at interval 0
    C = ocp.coll.coeff_collocation
    h = 1. / ocp.n_k
    tf = float(ocp.time_period_fn(V))
    X_stack = np.stack([V[vs.x_slice(0)]] +
                       [V[vs.coll_x_slice(0, j)] for j in range(ocp.d)])
    xd_expected = (C[:, 0] @ X_stack) / (h * tf)
    np.testing.assert_allclose(V[vs.xdot_slice(0)], xd_expected,
                               rtol=1e-8, atol=1e-10)


@pytest.mark.heavy
def test_nominal_landing_solve(solved_trial):  # noqa: F811
    """End-to-end landing homotopy: initial -> fictitious -> landing ->
    final on the tiny grid. The landing steps currently reach loose
    (max_iter-advanced) stationarity rather than tight KKT tolerance — the
    reference needs its 1318-line modular landing initializer to make these
    solves crisp — so the assertions target the physics the homotopy must
    deliver: the trajectory stays finite, the terminal node DESCENDS toward
    the landing radius, and xi stays feasible."""
    options = _options('nominal_landing', solved_trial)
    options['solver.max_iter'] = 250
    trial = Trial(options, 'landing_e2e').build()
    trial.optimize(verbose=False)
    V = np.asarray(trial.solution.V_opt)
    assert np.isfinite(V).all()
    ocp = trial.ocp
    layout = trial.model.layout
    q_sl = layout.slices['x']['q10']
    q_scale = trial.model.scaling['x'][q_sl]
    x_term = np.asarray(ocp.vstruct.get_coll_x(V))[-1, -1]
    r_term = np.linalg.norm(x_term[q_sl] * q_scale)
    V_src = np.asarray(solved_trial.solution.V_opt)
    x0_src = np.asarray(solved_trial.ocp.vstruct.get_x_all(V_src))[0]
    r_orbit = np.linalg.norm(
        x0_src[q_sl] * solved_trial.model.scaling['x'][q_sl])
    # descent: terminal radius below the source orbit radius (loose — the
    # partially-converged landing homotopy reaches ~0.5-0.9x depending on
    # where max_iter lands)
    assert r_term < r_orbit, (r_term, r_orbit)
    # xi_0 stays inside [0, 1]
    xi = V[ocp.vstruct.xi_slice]
    assert 0. <= xi[0] <= 1.
    # every homotopy step recorded a result
    assert 'nominal_landing_0' in trial.solution.step_results
    assert 'final_0' in trial.solution.step_results
