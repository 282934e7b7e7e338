#!/usr/bin/env python
"""Round-5 experiment: f32-viable KKT direction for the TPU bench.

Round-4 finding: the condensed system M = W + A^T D^-1 A with
delta_ce = 1e-8 carries cond ~ 1e13+ (f32-infeasible), and the pure
range-space form is unusable because H itself is indefinite at the anchor
(measured here: chol(W0 + 1e-8 I) fails even in f64 — the constraint
curvature IS what makes the condensed operator PD).

Candidate fix measured by this script: MODERATE condensation + mixed-precision
iterative refinement.

    D~ = D_equilibrated + delta_d        (delta_d ~ 1e-4: injects <= 1e4)
    M~ = W0 + delta_w I + A'^T D~^-1 A'  (f32 chol after Jacobi scaling)
    refine against the TRUE augmented system (D' = R D R, delta_ce -> 0)
    with f64 residuals; corrections through the f32 M~ factor.

The dual error left in near-null row directions is harmless: a dual error
e_nu feeds the primal only through A^T e_nu, and those directions satisfy
||A^T v|| ~ sigma_min ~ 3.5e-4 — exactly why IPOPT's delta_c regularization
is benign. The script reports, at the committed bench anchor:

  1. cond + f32-chol success of Jacobi-scaled M~ across delta_d;
  2. cosine + relative error of the refined f32 direction vs the f64
     condensed reference (delta_ce = 1e-8);
  3. the same for a batched-LU solve of the equilibrated augmented system
     (the simpler alternative if pivoted LU conditioning suffices).

Run: JAX_PLATFORMS=cpu python benchmarks/repro_f32_schur.py
"""
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
cache = os.path.join(ROOT, '.jax_cache')
jax.config.update('jax_compilation_cache_dir', cache)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from awebox_tpu.api.trial import Trial
from awebox_tpu.opti.homotopy import build_p_fix, final_bounds
from awebox_tpu.opti.initialization import build_initial_guess, build_reference
from awebox_tpu.opti.ipsolver import InteriorPointSolver
from awebox_tpu.ocp.structured import make_structured_derivs
from make_bench_anchor import bench_options


def build_anchor_point():
    trial = Trial(bench_options(n_k=4, d=3), 'schur_repro').build()
    ocp = trial.ocp
    anchor = np.load(os.path.join(ROOT, 'tests', 'artifacts',
                                  'bench_anchor_nk4_d3.npz'))
    V0 = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V0))
    lbf, ubf = final_bounds(ocp, trial.lb_nominal, trial.ub_nominal,
                            np.asarray(V0))
    relax = 1e-8
    fin_l = np.isfinite(lbf) & (lbf != ubf)
    fin_u = np.isfinite(ubf) & (lbf != ubf)
    lbf = np.where(fin_l, lbf - relax * np.maximum(1., np.abs(lbf)), lbf)
    ubf = np.where(fin_u, ubf + relax * np.maximum(1., np.abs(ubf)), ubf)
    lbw, ubw, free, _ = InteriorPointSolver.split_pins(lbf, ubf)
    return trial, ocp, anchor, P, lbw, ubw, free


def kkt_data(ocp, anchor, P, lbw, ubw, free):
    derivs = make_structured_derivs(ocp)
    out = derivs(jnp.asarray(anchor['w']), jnp.asarray(anchor['y']),
                 jnp.asarray(anchor['lam']), P)
    fval, gradf, cE, cI, JE, JI, H = [np.asarray(x) for x in out]
    w, s, lam = anchor['w'], anchor['s'], anchor['lam']
    y, zl, zu = anchor['y'], anchor['zl'], anchor['zu']
    mu = 1e-5
    dl = np.maximum(w - lbw, 1e-20)
    du = np.maximum(ubw - w, 1e-20)
    sigma = np.clip(zl / dl + zu / du, 0., 1e16)
    W0 = H + np.diag(sigma)
    W0 = W0 * (free[:, None] * free[None, :]) + np.diag(1. - free)
    A = np.concatenate([JE, JI], 0) * free[None, :]
    lam_safe = np.maximum(lam, 1e-12)
    n_eq, n_ineq = ocp.n_eq, ocp.n_ineq
    D = np.concatenate([1e-8 * np.ones(n_eq), s / lam_safe + 1e-8])
    r2 = np.concatenate([cE, cI + mu / lam_safe])
    r1 = -(gradf + A.T @ np.concatenate([y, lam]) - mu / dl + mu / du) * free
    return dict(W0=W0, A=A, D=D, r1=r1, r2=r2, n_eq=n_eq, n_ineq=n_ineq,
                sigma=sigma, free=free)


def dense_condensed_f64(d, delta_w=1e-8):
    """Reference direction: the existing condensed path at f64."""
    W0, A, D, r1, r2 = d['W0'], d['A'], d['D'], d['r1'], d['r2']
    free = d['free']
    M = W0 + delta_w * np.diag(free) + (A / D[:, None]).T @ A
    dw = np.linalg.solve(M, r1 - A.T @ (r2 / D))
    dnu = (A @ dw + r2) / D
    return dw * free, dnu, M


def equilibrate(d):
    A64, D64, r2_64 = d['A'], d['D'], d['r2']
    rn = 1.0 / np.maximum(np.abs(A64).max(axis=1), 1e-12)
    return rn, A64 * rn[:, None], D64 * rn * rn, r2_64 * rn


def moderate_condensed(d, delta_d, dtype=np.float32, delta_w=1e-8,
                       n_refine=3, report=False):
    """M~ = W0 + dw I + A'^T (D'+delta_d)^-1 A' in `dtype`, then f64-residual
    refinement against the true augmented system (D', delta_ce -> 1e-8)."""
    free = d['free']
    rn, A_e, D_e, r2_e = equilibrate(d)
    W0 = d['W0']
    Dt = D_e + delta_d
    M = W0 + delta_w * np.diag(free) + (A_e / Dt[:, None]).T @ A_e
    md = 1.0 / np.sqrt(np.maximum(np.abs(np.diag(M)), 1e-30))
    Ms = (M * md[:, None] * md[None, :]).astype(dtype)
    if report:
        print(f'    cond(jacobi M~[{delta_d:g}]) = '
              f'{np.linalg.cond(Ms.astype(np.float64)):.2e}')
    LM = np.linalg.cholesky(Ms)          # raises if f32-infeasible

    def msolve(b):
        t = np.linalg.solve(LM, (b * md).astype(dtype))
        return (np.linalg.solve(LM.T, t) * md).astype(np.float64)

    # initial solve of the REGULARIZED system (dtype precision)
    rhs = d['r1'] - A_e.T @ (r2_e / Dt)
    dw = msolve(rhs.astype(dtype))
    dnu_e = (A_e @ dw + r2_e) / Dt

    # refinement vs the true system: [W0h A'^T; A' -D'] (f64 residuals)
    W0h = W0 + delta_w * np.diag(free)
    for _ in range(n_refine):
        r_w = d['r1'] - (W0h @ dw + A_e.T @ dnu_e)
        r_nu = -r2_e - (A_e @ dw - D_e * dnu_e)
        # correction via the regularized factor (SPD proximal preconditioner)
        e_w = msolve((r_w + A_e.T @ (r_nu / Dt)).astype(dtype))
        e_nu = (A_e @ e_w - r_nu) / Dt
        dw = dw + e_w
        dnu_e = dnu_e + e_nu
    # final residual vs true augmented system
    r_w = d['r1'] - (W0h @ dw + A_e.T @ dnu_e)
    r_nu = -r2_e - (A_e @ dw - D_e * dnu_e)
    res = max(np.abs(r_w).max(), np.abs(r_nu).max())
    dnu = rn * dnu_e
    return (dw * free), dnu, res


def augmented_lu(d, dtype=np.float32, delta_w=1e-8, delta_ce=1e-8,
                 n_refine=2, report=False):
    """Pivoted LU of the equilibrated augmented system in `dtype` + f64
    refinement. Simpler, but no inertia signal."""
    import scipy.linalg as sla
    free = d['free']
    rn, A_e, D_e, r2_e = equilibrate(d)
    n = len(d['r1'])
    m = len(D_e)
    W0h = d['W0'] + delta_w * np.diag(free)
    D_reg = D_e + delta_ce
    K = np.block([[W0h, A_e.T], [A_e, -np.diag(D_reg)]])
    kd = 1.0 / np.sqrt(np.maximum(np.abs(np.diag(K)), 1e-6))
    Ks = (K * kd[:, None] * kd[None, :]).astype(dtype)
    if report:
        print(f'    cond(jacobi K_aug) = '
              f'{np.linalg.cond(Ks.astype(np.float64)):.2e}')
    lu, piv = sla.lu_factor(Ks)

    def ksolve(b):
        return (sla.lu_solve((lu, piv), (b * kd).astype(dtype)) * kd
                ).astype(np.float64)

    b = np.concatenate([d['r1'], -r2_e])
    x = ksolve(b.astype(dtype))
    for _ in range(n_refine):
        r = b - K @ x
        x = x + ksolve(r.astype(dtype))
    res = np.abs(b - K @ x).max()
    dw, dnu_e = x[:n], x[n:]
    return dw * free, rn * dnu_e, res


def main():
    print('# building anchor point...')
    trial, ocp, anchor, P, lbw, ubw, free = build_anchor_point()
    d = kkt_data(ocp, anchor, P, lbw, ubw, free)
    print(f'# n={len(d["r1"])}, n_eq={d["n_eq"]}, n_ineq={d["n_ineq"]}')
    print(f'# sigma range: {d["sigma"].min():.2e}..{d["sigma"].max():.2e}')

    dw64, dnu64, M = dense_condensed_f64(d)
    print(f'# old condensed M (delta_ce=1e-8): cond = {np.linalg.cond(M):.2e}, '
          f'|dw| = {np.abs(dw64).max():.3e}')

    def compare(name, dw, res):
        cos = dw64 @ dw / (np.linalg.norm(dw64) * np.linalg.norm(dw))
        rel = np.linalg.norm(dw - dw64) / np.linalg.norm(dw64)
        print(f'    {name}: cos={cos:.6f} rel_err={rel:.3e} aug_res={res:.2e}')

    for delta_d in (1e-2, 1e-3, 1e-4):
        for dtype in (np.float64, np.float32):
            tag = f'moderate delta_d={delta_d:g} {np.dtype(dtype).name}'
            try:
                dw, dnu, res = moderate_condensed(d, delta_d, dtype=dtype,
                                                  report=(dtype == np.float32))
                compare(tag, dw, res)
            except np.linalg.LinAlgError:
                print(f'    {tag}: f32 chol FAILED')

    for dtype in (np.float64, np.float32):
        tag = f'aug-LU {np.dtype(dtype).name}'
        dw, dnu, res = augmented_lu(d, dtype=dtype, report=(dtype == np.float32))
        compare(tag, dw, res)


if __name__ == '__main__':
    main()
