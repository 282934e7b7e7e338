#!/usr/bin/env python
"""Reproducers + measurements behind the round-4 TPU KKT findings.

Three independent facts, each reproducible on one v5-lite chip (16G HBM):

1. COMPILE OOM (round 3's mystery "kernel fault", BENCH_r03 rc=124):
   the batched dense direction module at B=256, n=540 fails to COMPILE with
       "XLA:TPU compile permanent error. Ran out of memory in memory space
        hbm. Used 17.04G of 15.75G hbm."
   surfaced as `remote_compile: HTTP 500: tpu_compile_helper subprocess
   exit code 1`. At B=128 the same module compiles and runs. Repro:
       python benchmarks/repro_tpu_kkt_findings.py oom 256   # fails
       python benchmarks/repro_tpu_kkt_findings.py oom 128   # ok

2. f32 CHOLESKY CANNOT FACTOR THE CONDENSED KKT SYSTEM:
   M = W + A^T D^-1 A with D_eq = delta_ce = 1e-8 carries
   cond(M) ~ ||A||^2 / delta_ce ~ 1e13 (measured diag range 2.5e-4..1.05e13
   at the committed anchor), far beyond f32 Cholesky's ~1/eps_f32 ~ 1e7
   reach. Row equilibration + Jacobi scaling + delta_ce up to 1e-4 all still
   fail (measured round 4); delta_ce >= 1e-2 factors in f32 but computes a
   proximally-damped direction nearly orthogonal to the true Newton step
   (cos ~ -0.2), which stalls the iteration. The near-null structure is
   physical: trivial-dynamics rows (l_t' = dl_t) divided by (h*t_f) couple
   only weakly (~1/250) to their rate variables, so the
   {collocation, continuity, periodicity} row chain of the l_t/e states is
   near-dependent — sigma_min(row-normalized A_eq) ~ 3.5e-4. MA57 pivots
   through this; an f32 chol cannot. Repro:
       python benchmarks/repro_tpu_kkt_findings.py cond

3. MIXED PRECISION IS SUFFICIENT AND NECESSARY:
   f32 derivatives + f64 condensed assembly/factorization converge the +-5%
   wind-sweep refinement to eq-residual ~4e-8 (prototype, 32 iterations) —
   but the f64 assembly must consume the SAME (f32-rounded) Jacobian used
   for the dual recovery: rounding the assembled M itself to f32 diverges
   (exact-solve-of-perturbed-problem vs perturbed-solve distinction).
   f64-emulation cost on this backend is ~100-200x for elementwise-heavy
   graphs (vals module: 6.7 ms f32 vs 1168 ms f64), so whole-pipeline f64
   is not viable; bench.py therefore scopes x64 OFF for the derivative
   modules and ON only inside the direction solve (solve_dtype='float64',
   parallel/batch.py).
"""
import sys

import numpy as np


def repro_oom(B):
    import jax
    import jax.numpy as jnp
    n, n_eq, n_ineq = 540, 483, 32
    rng = np.random.RandomState(0)
    f32 = np.float32
    H = jnp.asarray(rng.randn(B, n, n).astype(f32) * 0.01)
    JE = jnp.asarray(rng.randn(B, n_eq, n).astype(f32) * 0.1)
    JI = jnp.asarray(rng.randn(B, n_ineq, n).astype(f32) * 0.1)
    r1 = jnp.asarray(rng.randn(B, n).astype(f32))
    free = jnp.asarray((rng.rand(n) > 0.1).astype(f32))

    def direction(H, JE, JI, r1):
        W0 = 0.5 * (H + H.T) + 3. * jnp.eye(n)
        A = jnp.concatenate([JE, JI], axis=0) * free[None, :]
        As = A * 1e4
        AtA = As.T @ As
        eye_free = jnp.diag(free)

        def chol_ok(delta):
            LM = jnp.linalg.cholesky(W0 + delta * eye_free + AtA)
            return LM, jnp.all(jnp.isfinite(LM))

        def cond(c):
            k, d, _, ok = c
            return jnp.logical_and(~ok, k < 7)

        def body(c):
            k, d, _, _ = c
            d = jnp.maximum(d * 100., 1e-8)
            LM, ok = chol_ok(d)
            return k + 1, d, LM, ok

        LM0, ok0 = chol_ok(jnp.asarray(1e-8))
        _, _, LM, ok = jax.lax.while_loop(
            cond, body, (jnp.asarray(0), jnp.asarray(1e-8), LM0, ok0))

        def msolve(b):
            t = jax.scipy.linalg.solve_triangular(LM, b, lower=True)
            return jax.scipy.linalg.solve_triangular(LM.T, t, lower=False)

        dw = msolve(r1)
        M = W0 + AtA
        for _ in range(2):
            dw = dw + msolve(r1 - M @ dw)
        return dw * free, ok

    fn = jax.jit(jax.vmap(direction))
    print(f'# compiling direction-module analog at B={B}, n={n}...',
          flush=True)
    out = fn(H, JE, JI, r1)
    jax.block_until_ready(out)
    print(f'# OK: compiled and ran at B={B}')


def repro_cond():
    """cond(M) at the committed anchor; f32 chol failure demonstration."""
    import os
    import sys as _s
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    _s.path.insert(0, root)
    _s.path.insert(0, here)
    from awebox_tpu.api.trial import Trial
    from awebox_tpu.opti.homotopy import build_p_fix, final_bounds
    from awebox_tpu.opti.initialization import (build_initial_guess,
                                                build_reference)
    from awebox_tpu.opti.ipsolver import InteriorPointSolver
    from awebox_tpu.ocp.structured import make_structured_derivs
    from make_bench_anchor import bench_options

    trial = Trial(bench_options(n_k=4, d=3), 'repro').build()
    ocp = trial.ocp
    anchor = np.load(os.path.join(root, 'tests', 'artifacts',
                                  'bench_anchor_nk4_d3.npz'))
    V0 = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V0))
    lbf, ubf = final_bounds(ocp, trial.lb_nominal, trial.ub_nominal,
                            np.asarray(V0))
    lbw, ubw, free, _ = InteriorPointSolver.split_pins(lbf, ubf)
    derivs = make_structured_derivs(ocp)
    _, _, cE, _, JE, JI, H = [np.asarray(x) for x in derivs(
        jnp.asarray(anchor['w']), jnp.asarray(anchor['y']),
        jnp.asarray(anchor['lam']), P)]
    w, s, lam = anchor['w'], anchor['s'], anchor['lam']
    zl, zu = anchor['zl'], anchor['zu']
    dl = np.maximum(w - lbw, 1e-20)
    du = np.maximum(ubw - w, 1e-20)
    sigma = np.clip(zl / dl + zu / du, 0., 1e16)
    W0 = H + np.diag(sigma)
    W0 = W0 * (free[:, None] * free[None, :]) + np.diag(1. - free)
    A = np.concatenate([JE, JI], 0) * free[None, :]
    D = np.concatenate([1e-8 * np.ones(ocp.n_eq),
                        s / np.maximum(lam, 1e-12) + 1e-8])
    As = A / np.sqrt(D)[:, None]
    M = W0 + As.T @ As
    print(f'# diag(M) range: {np.abs(np.diag(M)).min():.2e} .. '
          f'{np.abs(np.diag(M)).max():.2e}')
    rn = np.maximum(np.linalg.norm(JE * free[None, :], axis=1), 1e-12)
    S = np.linalg.svd(JE * free[None, :] / rn[:, None], compute_uv=False)
    print(f'# sigma_min(row-normalized A_eq) = {S[-1]:.2e}')
    try:
        np.linalg.cholesky(M.astype(np.float32))
        print('# f32 chol: unexpectedly succeeded')
    except np.linalg.LinAlgError:
        print('# f32 chol: FAILED (as measured on TPU — the in-jit ladder '
              'spins with ok=False)')
    np.linalg.cholesky(M + 1e-8 * np.diag(free))   # f64 succeeds
    print('# f64 chol: ok')


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'cond'
    if mode == 'oom':
        repro_oom(int(sys.argv[2]) if len(sys.argv) > 2 else 256)
    else:
        repro_cond()
