"""Block-structured KKT factorization vs dense reference.

The block path (ocp/blockkkt.py) must produce the same primal-dual direction
as solving the dense condensed system M = W + A^T D^-1 A assembled from the
dense structured derivatives — on a problem small enough to afford both.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from awebox_tpu.api.trial import Trial
from awebox_tpu.options.options import Options
from awebox_tpu.options.kite_data import ampyx_ap2_settings
from awebox_tpu.opti.homotopy import build_p_fix, define_schedule, set_initial_bounds
from awebox_tpu.opti.initialization import build_initial_guess, build_reference
from awebox_tpu.opti.ipsolver import InteriorPointSolver

pytestmark = pytest.mark.slow  # compile-heavy tier; core suite runs without -m slow


def _build(n_k=3, d=2, phase_fix='simple', kite_dof=3):
    options = Options()
    ampyx_ap2_settings.set_ampyx_ap2_settings(options)
    options['user_options.system_model.architecture'] = {1: 0}
    options['user_options.system_model.kite_dof'] = kite_dof
    options['user_options.trajectory.type'] = 'power_cycle'
    options['user_options.wind.model'] = 'power'
    options['user_options.wind.u_ref'] = 10.
    options['params.wind.z_ref'] = 100.0
    options['user_options.trajectory.lift_mode.phase_fix'] = phase_fix
    options['nlp.n_k'] = n_k
    options['nlp.collocation.d'] = d
    return Trial(options, 'blockkkt').build()


def _state_and_args(trial):
    ocp = trial.ocp
    V0 = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V0))
    schedule = define_schedule(ocp)
    lb, ub = set_initial_bounds(ocp, trial.lb_nominal, trial.ub_nominal, V0, schedule)
    lbw, ubw, free, center = InteriorPointSolver.split_pins(lb, ub)
    lbw, ubw, free = jnp.asarray(lbw), jnp.asarray(ubw), jnp.asarray(free)

    rng = np.random.default_rng(7)
    w = np.asarray(V0) + 1e-3 * rng.normal(size=V0.shape)
    w = np.where(free > 0.5, w, center)
    span = np.minimum(1e-2 * np.maximum(1., np.abs(w)),
                      0.5 * (np.asarray(ubw) - np.asarray(lbw)))
    w = np.clip(w, np.where(np.isfinite(lbw), np.asarray(lbw) + span, -np.inf),
                np.where(np.isfinite(ubw), np.asarray(ubw) - span, np.inf))
    w = jnp.asarray(w)

    mu = 1e-1
    cI = ocp.ineq_fn(w, P)
    s = jnp.maximum(-cI, 1e-2)
    lam = jnp.maximum(mu / s, 1e-8)
    y = jnp.asarray(0.1 * rng.normal(size=ocp.n_eq))
    dl = jnp.maximum(w - lbw, 1e-8)
    du = jnp.maximum(ubw - w, 1e-8)
    zl = jnp.where(jnp.isfinite(lbw), mu / dl, 0.)
    zu = jnp.where(jnp.isfinite(ubw), mu / du, 0.)
    return dict(w=w, s=s, y=y, lam=lam, zl=zl, zu=zu, mu=mu,
                lbw=lbw, ubw=ubw, free=free, P=P)


def _dense_direction(ocp, st, delta_w, delta_c, delta_ce):
    """Reference: dense condensed solve in numpy (f64)."""
    from awebox_tpu.ocp.structured import make_structured_derivs
    derivs = make_structured_derivs(ocp)
    w, y, lam, s = st['w'], st['y'], st['lam'], st['s']
    zl, zu, mu = st['zl'], st['zu'], st['mu']
    lbw, ubw, free, P = st['lbw'], st['ubw'], st['free'], st['P']
    fval, gradf, cE, cI, JE, JI, H = [np.asarray(a) for a in
                                      derivs(w, y, lam, P)]
    n = len(w)
    n_eq, n_ineq = ocp.n_eq, ocp.n_ineq
    free_n = np.asarray(free)
    dl = np.maximum(np.asarray(w - lbw), 1e-20)
    du = np.maximum(np.asarray(ubw - w), 1e-20)
    sigma = np.clip(np.asarray(zl) / dl + np.asarray(zu) / du, 0., 1e16)
    W = H + np.diag(sigma)
    W = W * np.outer(free_n, free_n) + np.diag(1. - free_n)
    W = W + delta_w * np.diag(free_n)
    A = np.concatenate([JE, JI], axis=0) * free_n[None, :]
    lam_safe = np.maximum(np.asarray(lam), 1e-12)
    D = np.concatenate([delta_ce * np.ones(n_eq),
                        np.asarray(s) / lam_safe + delta_c * np.ones(n_ineq)])
    r2 = np.concatenate([cE, cI + mu / lam_safe])
    r1 = -(gradf + A.T @ np.concatenate([np.asarray(y), lam_safe * 0 + np.asarray(lam)])
           - mu / dl + mu / du) * free_n
    M = W + A.T @ (A / D[:, None])
    rhs = r1 - A.T @ (r2 / D)
    dw = np.linalg.solve(M, rhs) * free_n
    dnu = (A @ dw + r2) / D
    return dw, dnu[:n_eq], dnu[n_eq:]


def _compare(trial, n_k_expected=None):
    """Run block kkt_solve, then verify against the dense condensed system
    assembled at the SAME delta the in-jit ladder settled on (the ladder may
    legitimately escalate when M is indefinite at the initial delta)."""
    ocp = trial.ocp
    st = _state_and_args(trial)
    delta_w, delta_c, delta_ce = 1e-6, 1e-8, 1e-8

    from awebox_tpu.ocp.blockkkt import make_block_kkt
    derivs_fn, kkt_solve, maps = make_block_kkt(ocp)
    blocks = derivs_fn(st['w'], st['y'], st['lam'], st['P'])

    # the frame assembly must reproduce the dense condensed matrix exactly
    asm = maps.assemble(blocks, st['w'], st['s'], st['y'], st['lam'],
                        st['zl'], st['zu'], st['lbw'], st['ubw'],
                        st['free'], st['mu'], delta_c, delta_ce)

    dw, dy, dlam, ds, dzl, dzu, ok, info = kkt_solve(
        blocks, st['w'], st['s'], st['y'], st['lam'], st['zl'], st['zu'],
        st['lbw'], st['ubw'], st['free'], st['mu'],
        delta_w, delta_c, delta_ce)
    assert bool(ok)

    dw_ref, dy_ref, dlam_ref = _dense_direction(
        ocp, st, float(info['delta_used']), delta_c, delta_ce)

    scale = max(1., np.abs(dw_ref).max())
    np.testing.assert_allclose(np.asarray(dw), dw_ref, atol=1e-5 * scale,
                               rtol=1e-4)
    scale_y = max(1., np.abs(dy_ref).max())
    np.testing.assert_allclose(np.asarray(dy), dy_ref, atol=1e-5 * scale_y,
                               rtol=1e-4)
    scale_l = max(1., np.abs(dlam_ref).max())
    np.testing.assert_allclose(np.asarray(dlam), dlam_ref, atol=1e-5 * scale_l,
                               rtol=1e-4)


@pytest.mark.heavy
def test_block_kkt_matches_dense():
    _compare(_build(n_k=3, d=2, phase_fix='simple'))


@pytest.mark.slow
@pytest.mark.heavy
def test_block_kkt_matches_dense_single_reelout():
    _compare(_build(n_k=4, d=2, phase_fix='single_reelout'))


@pytest.mark.slow
@pytest.mark.heavy
def test_block_kkt_6dof_augmented_residual():
    """6-DOF coverage: DCM/omega/surface states change the keep_rows set,
    the beta cost enters the node scalar, and the local dimensions grow.

    The condensed system here is ill-conditioned (cond(M) ~ 1e15 from the
    1/delta_ce equality regularization), so a direction-vs-dense comparison
    is meaningless — the dense f64 solve's own error exceeds the tolerance.
    Instead verify the block direction satisfies the AUGMENTED KKT equations
        W dw + A^T dnu = r1,     A dw - D dnu = -r2
    to small relative residual (what the augmented iterative refinement in
    blockkkt.kkt_solve guarantees; the failure mode it guards against is
    the 1/delta_ce amplification of primal error into the duals)."""
    trial = _build(n_k=2, d=2, kite_dof=6)
    ocp = trial.ocp
    st = _state_and_args(trial)
    delta_w, delta_c, delta_ce = 1e-6, 1e-8, 1e-8

    from awebox_tpu.ocp.blockkkt import make_block_kkt
    from awebox_tpu.ocp.structured import make_structured_derivs
    derivs_fn, kkt_solve, maps = make_block_kkt(ocp)
    blocks = derivs_fn(st['w'], st['y'], st['lam'], st['P'])
    dw, dy, dlam, ds, dzl, dzu, ok, info = kkt_solve(
        blocks, st['w'], st['s'], st['y'], st['lam'], st['zl'], st['zu'],
        st['lbw'], st['ubw'], st['free'], st['mu'],
        delta_w, delta_c, delta_ce)
    assert bool(ok)

    derivs = make_structured_derivs(ocp)
    fval, gradf, cE, cI, JE, JI, H = [np.asarray(a) for a in
                                      derivs(st['w'], st['y'], st['lam'],
                                             st['P'])]
    w, s, lam = np.asarray(st['w']), np.asarray(st['s']), np.asarray(st['lam'])
    free = np.asarray(st['free'])
    lbw, ubw, mu = np.asarray(st['lbw']), np.asarray(st['ubw']), st['mu']
    dl = np.maximum(w - lbw, 1e-20)
    du = np.maximum(ubw - w, 1e-20)
    sigma = np.clip(np.asarray(st['zl']) / dl + np.asarray(st['zu']) / du,
                    0., 1e16)
    W = H + np.diag(sigma)
    W = W * np.outer(free, free) + np.diag(1. - free)
    W = W + float(info['delta_used']) * np.diag(free)
    A = np.concatenate([JE, JI], axis=0) * free[None, :]
    lam_safe = np.maximum(lam, 1e-12)
    D = np.concatenate([delta_ce * np.ones(ocp.n_eq),
                        s / lam_safe + delta_c * np.ones(ocp.n_ineq)])
    r2 = np.concatenate([cE, cI + mu / lam_safe])
    nu = np.concatenate([np.asarray(st['y']), lam])
    r1 = -(gradf + A.T @ nu - mu / dl + mu / du) * free

    dnu = np.concatenate([np.asarray(dy), np.asarray(dlam)])
    dwn = np.asarray(dw)
    res1 = W @ dwn + A.T @ dnu - r1
    res2 = A @ dwn - D * dnu + r2
    scale1 = np.linalg.norm(r1) + 1.
    scale2 = np.linalg.norm(r2) + np.linalg.norm(D * dnu) + 1.
    # primal equation: refinement floor ~ cond(M)^2 * eps^2 levels out near
    # 1e-7 relative here; dual equation: exact by construction of dnu
    assert np.linalg.norm(res1) / scale1 < 1e-5, np.linalg.norm(res1) / scale1
    assert np.linalg.norm(res2) / scale2 < 1e-10, np.linalg.norm(res2) / scale2


@pytest.mark.slow
@pytest.mark.heavy
def test_block_kkt_6dof_initial_step_no_stall():
    """Round-4 stall scenario: on the nonconvex 6-DOF initial homotopy step
    the block path's chol-only inertia test used to force delta_w so high
    that the solve trapped in a watchdog loop while dense converged. With
    the Lanczos/Forsgren-Gill probe (blockkkt.kkt_solve round 5) the block
    path must now complete the same step in <= 1.5x the dense path's
    iterations."""
    from awebox_tpu.opti import homotopy as hm

    def solve_initial(linear_solver):
        trial = _build(n_k=6, d=3, kite_dof=6)
        trial.options['solver']['linear_solver'] = linear_solver
        ocp = trial.ocp
        V0 = build_initial_guess(ocp)
        V_ref = build_reference(ocp, V0)
        sol = hm.solve_homotopy(ocp, V0, V_ref, trial.lb_nominal,
                                trial.ub_nominal,
                                final_homotopy_step='initial',
                                verbose=False)
        assert sol.success, sol.step_results
        return sum(r['iterations'] for r in sol.step_results.values())

    it_dense = solve_initial('dense')
    it_block = solve_initial('block')
    assert it_block <= 1.5 * it_dense + 5, (it_block, it_dense)
