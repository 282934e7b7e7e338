#!/usr/bin/env python
"""Scaling evidence for the block-structured KKT factorization.

Measures per-iteration wall time of the block kkt_solve vs the dense
condensed solve over n_k in {8, 16, 32} (3-DOF), and demonstrates that the
paper-benchmark scale (n_k=100, d=4, 6-DOF single kite — reference
examples/paper_benchmarks/reference_options.py:94-121) assembles and
factorizes per-iteration on one chip, which the dense path cannot
(a dense Hessian alone would be ~5 GB f64).

Usage: python benchmarks/kkt_scaling.py [--skip-dense] [--big]
"""
import argparse
import time
import sys

import numpy as np


def build_trial(n_k, d, kite_dof):
    from awebox_tpu.api.trial import Trial
    from awebox_tpu.options.options import Options
    from awebox_tpu.options.kite_data import ampyx_ap2_settings
    options = Options()
    ampyx_ap2_settings.set_ampyx_ap2_settings(options)
    options['user_options.system_model.architecture'] = {1: 0}
    options['user_options.system_model.kite_dof'] = kite_dof
    options['user_options.trajectory.type'] = 'power_cycle'
    options['user_options.wind.model'] = 'power'
    options['user_options.wind.u_ref'] = 10.
    options['params.wind.z_ref'] = 100.0
    options['user_options.trajectory.lift_mode.phase_fix'] = 'simple'
    options['nlp.n_k'] = n_k
    options['nlp.collocation.d'] = d
    return Trial(options, f'kkt_scaling_{n_k}_{d}_{kite_dof}').build()


def state_for(trial):
    import jax.numpy as jnp
    from awebox_tpu.opti.homotopy import build_p_fix, define_schedule, set_initial_bounds
    from awebox_tpu.opti.initialization import build_initial_guess, build_reference
    from awebox_tpu.opti.ipsolver import InteriorPointSolver
    ocp = trial.ocp
    V0 = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V0))
    schedule = define_schedule(ocp)
    lb, ub = set_initial_bounds(ocp, trial.lb_nominal, trial.ub_nominal, V0, schedule)
    lbw, ubw, free, center = InteriorPointSolver.split_pins(lb, ub)
    w = jnp.asarray(np.where(free > 0.5, np.asarray(V0), center))
    mu = 1e-1
    cI = ocp.ineq_fn(w, P)
    s = jnp.maximum(-cI, 1e-2)
    lam = jnp.maximum(mu / s, 1e-8)
    y = jnp.zeros(ocp.n_eq)
    lbw, ubw = jnp.asarray(lbw), jnp.asarray(ubw)
    dl = jnp.maximum(w - lbw, 1e-8)
    du = jnp.maximum(ubw - w, 1e-8)
    zl = jnp.where(jnp.isfinite(lbw), mu / dl, 0.)
    zu = jnp.where(jnp.isfinite(ubw), mu / du, 0.)
    return dict(w=w, s=s, y=y, lam=lam, zl=zl, zu=zu, mu=mu,
                lbw=lbw, ubw=ubw, free=jnp.asarray(free), P=P)


def time_block(trial, st, reps=5):
    import jax
    from awebox_tpu.ocp.blockkkt import make_block_kkt
    derivs_fn, kkt_solve, maps = make_block_kkt(trial.ocp)
    dfn = jax.jit(derivs_fn)
    ksol = jax.jit(kkt_solve)
    args = (st['w'], st['s'], st['y'], st['lam'], st['zl'], st['zu'],
            st['lbw'], st['ubw'], st['free'], st['mu'], 1e-6, 1e-8, 1e-8)
    t0 = time.time()
    blocks = dfn(st['w'], st['y'], st['lam'], st['P'])
    out = ksol(blocks, *args)
    jax.block_until_ready(out[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        blocks = dfn(st['w'], st['y'], st['lam'], st['P'])
        out = ksol(blocks, *args)
    jax.block_until_ready(out[0])
    per_iter = (time.time() - t0) / reps
    finite = bool(np.isfinite(np.asarray(out[0])).all())
    return per_iter, compile_s, finite


def time_dense(trial, st, reps=3):
    import jax
    import jax.numpy as jnp
    from awebox_tpu.ocp.structured import make_structured_derivs
    ocp = trial.ocp
    derivs = make_structured_derivs(ocp)
    n, n_eq, n_ineq = ocp.vstruct.total, ocp.n_eq, ocp.n_ineq

    @jax.jit
    def dense_solve(w, y, lam, s, zl, zu, lbw, ubw, free, mu, P):
        fval, gradf, cE, cI, JE, JI, H = derivs(w, y, lam, P)
        dl = jnp.maximum(w - lbw, 1e-20)
        du = jnp.maximum(ubw - w, 1e-20)
        sigma = jnp.clip(zl / dl + zu / du, 0., 1e16)
        W = H + jnp.diag(sigma)
        W = W * jnp.outer(free, free) + jnp.diag(1. - free) + 1e-6 * jnp.diag(free)
        A = jnp.concatenate([JE, JI], axis=0) * free[None, :]
        lam_safe = jnp.maximum(lam, 1e-12)
        D = jnp.concatenate([1e-8 * jnp.ones(n_eq), s / lam_safe + 1e-8 * jnp.ones(n_ineq)])
        M = W + A.T @ (A / D[:, None])
        r2 = jnp.concatenate([cE, cI + mu / lam_safe])
        r1 = -(gradf + A.T @ jnp.concatenate([y, lam]) - mu / dl + mu / du) * free
        rhs = r1 - A.T @ (r2 / D)
        L = jnp.linalg.cholesky(M)
        t = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, t, lower=False)

    args = (st['w'], st['y'], st['lam'], st['s'], st['zl'], st['zu'],
            st['lbw'], st['ubw'], st['free'], st['mu'], st['P'])
    t0 = time.time()
    out = dense_solve(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = dense_solve(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--skip-dense', action='store_true')
    ap.add_argument('--big', action='store_true',
                    help='also run the n_k=100 d=4 6-DOF paper-benchmark scale')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_enable_x64', True)
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    print(f'# backend: {jax.devices()[0].platform}', flush=True)
    for n_k in (8, 16, 32):
        trial = build_trial(n_k, 3, 3)
        st = state_for(trial)
        tb, cb, finite = time_block(trial, st)
        line = f'n_k={n_k:3d} block {tb*1e3:9.2f} ms/iter (compile {cb:5.1f}s, finite={finite})'
        if not args.skip_dense:
            td, cd = time_dense(trial, st)
            line += f' | dense {td*1e3:9.2f} ms/iter (compile {cd:5.1f}s) | speedup {td/tb:5.2f}x'
        print(line, flush=True)

    if args.big:
        print('# paper-benchmark scale: n_k=100, d=4, 6-DOF single kite', flush=True)
        trial = build_trial(100, 4, 6)
        st = state_for(trial)
        n = trial.ocp.vstruct.total
        print(f'#   V entries: {n}, eq: {trial.ocp.n_eq}, ineq: {trial.ocp.n_ineq}', flush=True)
        tb, cb, finite = time_block(trial, st)
        print(f'n_k=100 6dof block {tb*1e3:9.2f} ms/iter (compile {cb:5.1f}s, finite={finite})',
              flush=True)


if __name__ == '__main__':
    main()
