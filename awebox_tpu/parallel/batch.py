"""Batched scenario solving over device meshes.

The reference's only batch axis is a serial Python loop over sweep cases
(sweep.py:117-172). Here a fleet of independent OCPs (e.g. a wind-speed power
curve, or randomized initializations a la the Energies-2023 robustness study)
is one jitted program: the interior-point iteration is written as a pure
function of a state pytree, vmapped over the scenario axis, and sharded over
a `jax.sharding.Mesh` so scenario fleets ride data-parallel over ICI.

The step here is the fixed-iteration production path (no host-side line
search): fraction-to-boundary steps with a monotone barrier schedule. The
host-driven solver in opti/ipsolver.py remains the robust single-problem
path; this is the throughput path.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_ip_step(ocp, derivs_fn=None, delta_w: float = 1e-8,
                 delta_c: float = 1e-8, tau: float = 0.99,
                 kappa_mu: float = 0.8, mu_min: float = 1e-8,
                 n_ladder: int = 7, ladder_factor: float = 100.,
                 kkt: str = 'auto', hessian: str = 'exact',
                 split: bool = False, solve_dtype=None,
                 auglu_factor: str = 'qr', auglu_mode: Optional[str] = None,
                 step_cap: Optional[float] = None):
    """Pure-jax single interior-point iteration for one scenario.

    state = dict(w, s, y, lam, zl, zu, mu); p = NLP parameter pytree
    (including per-scenario theta0 for parameter sweeps). Returns the updated
    state. No python control flow on traced values: the primal regularization
    runs an in-jit `lax.while_loop` ladder (mirror of the host ladder in
    ipsolver.solve, the IPOPT inertia-correction analog) — if the condensed
    Cholesky produces non-finite factors, delta_w is raised geometrically and
    the factorization retried, so a failed factorization can never leak NaNs
    into the iterates; the barrier decreases geometrically clipped at the
    error level (adaptive-mu lite).

    kkt = 'block' uses the block-structured factorization (ocp/blockkkt.py,
    O(n_k) per iteration); 'dense' materializes the full condensed system;
    'auglu' factors the row-equilibrated AUGMENTED system with pivoted LU in
    f32 plus f64-residual iterative refinement (see below);
    'auto' picks block whenever the problem supports it (not vortex).

    Why 'auglu' exists (round-5, the f32-viable KKT strategy): the condensed
    operator M = W + A^T D^-1 A with D_eq = delta_ce = 1e-8 carries
    cond ~ 1e13..1e18 — not only beyond f32 Cholesky (~1e7) but beyond f64
    accuracy too (1/eps_f64 ~ 4e15): the old f64 condensed direction was
    itself noise-dominated. Moderate condensation (delta_d ~ 1e-4) fails
    differently: W is indefinite on null(A) at production iterates, so the
    moderately-condensed matrix is not even PD. The augmented form
        K = [[W + delta_w I, A'^T], [A', -(D' + delta_ce)]]
    with per-row equilibration A' = R A (duals nu = R nu') never inverts
    delta_ce; after Jacobi scaling cond(K) ~ 2e9 (measured at the bench
    anchor, benchmarks/repro_f32_schur.py), and partial-pivoted LU handles
    the indefiniteness the way MA57's symmetric-indefinite pivoting does for
    the reference (opts/default.py:322). An f32 factorization + 2 sweeps of
    f64-residual refinement reaches augmented-system residual ~3e-9 —
    identical to the f64 factorization — at MXU f32 speed. The O(n^3) work
    stays f32; only O(n^2) residual matvecs pay the f64-emulation tax.

    hessian = 'gauss_newton' replaces the exact Lagrangian Hessian with the
    Gauss-Newton curvature of the tracking objective (structured.py) — a much
    smaller traced graph (no third-order AD through the Euler-Lagrange
    dynamics), intended for throughput refinement from a warm anchor where
    linear convergence suffices.

    solve_dtype = 'float64' runs ONLY the condensed factorization + solves in
    (emulated) f64 while derivatives stay in the input dtype. The condensed
    matrix M = W + A^T D^-1 A carries cond ~ ||A||^2/delta_ce ~ 1e13 (plus
    near-dependent trivial-dynamics/continuity/periodicity row chains,
    measured sigma_min(A_eq) ~ 3.5e-4 on the bench anchor) — far beyond f32
    Cholesky's ~1e7 reach, which is why the all-f32 path spins the whole
    regularization ladder and returns ok=False every iteration on TPU.
    f32 derivatives into an f64 solve converge to eq-residual ~1e-7
    (prototype-validated round 4); this is the MA57-precision role at MXU
    derivative speed.

    split=True returns (derivs_fn, direction_fn) instead of the fused step:
    the caller jits/vmaps the two halves as SEPARATE XLA modules and chains
    them host-side. Two smaller compiles replace one monolithic one — on the
    shared-compile-server TPU backend, module compile time grows superlinearly
    in graph size and each cached module survives a later failure, so retries
    accumulate progress instead of restarting the whole compile.
    """
    n = ocp.vstruct.total
    n_eq, n_ineq = ocp.n_eq, ocp.n_ineq

    if kkt == 'auto':
        if derivs_fn is not None or not hasattr(ocp, 'model'):
            kkt = 'dense'
        else:
            # block structure requires the zoh interval layout without
            # horizon-coupling constraints (vortex wake, averaged integral)
            dense_only = (
                ocp.model.cfg.get('induction_model') in ('vortex', 'averaged')
                or ocp.options['model']['integral_outputs']
                or ocp.vstruct.u_param in ('poly', 'ms')
                or getattr(ocp.vstruct, 'with_xi', False)
                or ocp.options['user_options']['trajectory']['type'] == 'mpc')
            kkt = 'dense' if dense_only else 'block'

    if kkt == 'block':
        return _make_block_ip_step(ocp, delta_w=delta_w, delta_c=delta_c,
                                   tau=tau, kappa_mu=kappa_mu, mu_min=mu_min)

    if derivs_fn is None:
        # the structured per-node assembly covers the zoh layout without
        # horizon-coupling rows; everything else gets plain dense autodiff
        structured_ok = (
            hasattr(ocp, 'model')
            and ocp.vstruct.u_param == 'zoh'
            and ocp.model.cfg.get('induction_model') not in ('vortex', 'averaged')
            and not ocp.options['model']['integral_outputs']
            and not getattr(ocp.vstruct, 'with_xi', False)
            and ocp.options['user_options']['trajectory']['type'] != 'mpc')
        if structured_ok:
            from ..ocp.structured import make_structured_derivs
            derivs_fn = make_structured_derivs(ocp, hessian=hessian)
        else:
            f, eq, ineq = ocp.f_fn, ocp.eq_fn, ocp.ineq_fn
            n_eq_l, n_ineq_l = ocp.n_eq, ocp.n_ineq

            def lagrangian(w, y, lam, p):
                L = f(w, p)
                if n_eq_l:
                    L = L + y @ eq(w, p)
                if n_ineq_l:
                    L = L + lam @ ineq(w, p)
                return L

            def derivs_fn(w, y, lam, p):
                fval, gradf = jax.value_and_grad(f)(w, p)
                cE = eq(w, p) if n_eq_l else jnp.zeros(0)
                cI = ineq(w, p) if n_ineq_l else jnp.zeros(0)
                JE = jax.jacfwd(eq)(w, p) if n_eq_l else jnp.zeros((0, n))
                JI = jax.jacfwd(ineq)(w, p) if n_ineq_l else jnp.zeros((0, n))
                H = jax.hessian(lagrangian)(w, y, lam, p)
                return fval, gradf, cE, cI, JE, JI, H

    def direction(state, derivs_out, lbw, ubw, free):
        w, s, y, lam = state['w'], state['s'], state['y'], state['lam']
        zl, zu, mu = state['zl'], state['zu'], state['mu']

        fval, gradf, cE, cI, JE, JI, H = derivs_out
        # non-finite derivatives (iterate escaped the model's domain) must not
        # poison the linear algebra: sanitize, the ladder then produces a
        # heavily damped (near-gradient) step
        gradf = jnp.where(jnp.isfinite(gradf), gradf, 0.)
        cE = jnp.where(jnp.isfinite(cE), cE, 0.)
        cI = jnp.where(jnp.isfinite(cI), cI, 0.)
        JE = jnp.where(jnp.isfinite(JE), JE, 0.)
        JI = jnp.where(jnp.isfinite(JI), JI, 0.)
        H = jnp.where(jnp.isfinite(H), H, 0.)

        dl = jnp.maximum(w - lbw, 1e-20)
        du = jnp.maximum(ubw - w, 1e-20)
        sigma = jnp.clip(zl / dl + zu / du, 0., 1e16)
        W0 = H + jnp.diag(sigma)
        W0 = W0 * (free[:, None] * free[None, :]) + jnp.diag(1. - free)

        A = jnp.concatenate([JE, JI], axis=0) * free[None, :]
        lam_safe = jnp.maximum(lam, 1e-12)
        # Condensed quasi-definite form M = W + A^T D^-1 A solved by Cholesky
        # with iterative refinement; equality rows carry a small dual
        # regularization delta_ce to keep D positive. See the solve_dtype
        # note in the docstring: cond(M) ~ 1e13 demands f64 factorization —
        # emulated on TPU, native on CPU.
        sdt = jnp.dtype(solve_dtype) if solve_dtype is not None else W0.dtype
        idt = W0.dtype
        delta_ce = delta_c
        D = jnp.concatenate([delta_ce * jnp.ones(n_eq),
                             s / lam_safe + delta_c * jnp.ones(n_ineq)])
        r2 = jnp.concatenate([cE, cI + mu / lam_safe]) if n_ineq else cE
        r1 = -(gradf + A.T @ jnp.concatenate([y, lam]) - mu / dl + mu / du) * free

        if kkt == 'auglu':
            fac_in = state.get('fac') if auglu_mode == 'stale' else None
            dw, dnu, ok, fac_out = _auglu_solve(
                W0, A, D, r1, r2, free, n, delta_w, delta_ce, n_ladder,
                ladder_factor, factor=auglu_factor, mode=auglu_mode,
                fac=fac_in)
            idt = W0.dtype
            dw = jnp.where(ok & jnp.isfinite(dw), dw, 0.).astype(idt)
            dnu = jnp.where(ok & jnp.isfinite(dnu), dnu, 0.).astype(idt)
            dy, dlam = dnu[:n_eq], dnu[n_eq:]
            ds = -(cI + s) - JI @ dw if n_ineq else s
            dzl = mu / dl - zl - zl * dw / dl
            dzu = mu / du - zu + zu * dw / du
            err_d = jnp.max(jnp.abs(r1))
            err_p = jnp.max(jnp.abs(cE), initial=0.)
            if n_ineq:
                err_p = jnp.maximum(err_p, jnp.max(jnp.abs(cI + s)))
            out = _advance_state(state, (dw, dy, dlam, ds, dzl, dzu), ok,
                                 err_d, lbw, ubw, n_ineq, tau, kappa_mu,
                                 mu_min, err_kkt=jnp.maximum(err_d, err_p),
                                 step_cap=step_cap)
            if auglu_mode == 'refresh':
                out['fac'] = fac_out
            elif auglu_mode == 'stale':
                out['fac'] = state['fac']
            return out

        W0 = W0.astype(sdt)
        As = A.astype(sdt) / jnp.sqrt(D.astype(sdt))[:, None]
        AtA = As.T @ As
        eye_free = jnp.diag(free).astype(sdt)

        # in-jit regularization ladder: raise delta_w until chol succeeds
        def chol_ok(delta):
            LM = jnp.linalg.cholesky(W0 + delta * eye_free + AtA)
            return LM, jnp.all(jnp.isfinite(LM))

        def ladder_cond(carry):
            k, delta, _, ok = carry
            return jnp.logical_and(~ok, k < n_ladder)

        def ladder_body(carry):
            k, delta, _, _ = carry
            delta = jnp.maximum(delta * ladder_factor, delta_w)
            LM, ok = chol_ok(delta)
            return k + 1, delta, LM, ok

        LM0, ok0 = chol_ok(jnp.asarray(delta_w, dtype=sdt))
        _, delta_used, LM, ok = jax.lax.while_loop(
            ladder_cond, ladder_body,
            (jnp.asarray(0), jnp.asarray(delta_w, dtype=sdt), LM0, ok0))

        def msolve(b):
            t = jax.scipy.linalg.solve_triangular(LM, b, lower=True)
            return jax.scipy.linalg.solve_triangular(LM.T, t, lower=False)

        Wd = W0 + delta_used * eye_free
        rhs_w = (r1 - A.T @ (r2 / D)).astype(sdt)
        dw = msolve(rhs_w)
        for _ in range(2):  # refinement against the 1/delta_ce conditioning
            dw = dw + msolve(rhs_w - (Wd @ dw + As.T @ (As @ dw)))
        dw = (dw * free).astype(idt)
        dnu = ((A @ dw + r2) / D).astype(idt)
        # if even the maximally damped factorization failed, stand still
        # rather than step on NaNs (recovery: mu stays, next iterate retries)
        dw = jnp.where(ok, dw, 0.)
        dnu = jnp.where(ok, dnu, 0.)
        dw = jnp.where(jnp.isfinite(dw), dw, 0.)
        dnu = jnp.where(jnp.isfinite(dnu), dnu, 0.)
        dy, dlam = dnu[:n_eq], dnu[n_eq:]
        ds = -(cI + s) - JI @ dw if n_ineq else s
        dzl = mu / dl - zl - zl * dw / dl
        dzu = mu / du - zu + zu * dw / du

        err_d = jnp.max(jnp.abs(r1))
        err_p = jnp.max(jnp.abs(cE), initial=0.)
        if n_ineq:
            err_p = jnp.maximum(err_p, jnp.max(jnp.abs(cI + s)))
        return _advance_state(state, (dw, dy, dlam, ds, dzl, dzu), ok, err_d,
                              lbw, ubw, n_ineq, tau, kappa_mu, mu_min,
                              err_kkt=jnp.maximum(err_d, err_p),
                              step_cap=step_cap)

    if split:
        return derivs_fn, direction

    def step(state, p, lbw, ubw, free):
        derivs_out = derivs_fn(state['w'], state['y'], state['lam'], p)
        return direction(state, derivs_out, lbw, ubw, free)

    return step


def _auglu_solve(W0, A, D, r1, r2, free, n, delta_w, delta_ce, n_ladder,
                 ladder_factor, dw_cap=1e4, n_refine=2, factor='qr',
                 mode=None, fac=None):
    """f32 factorization of the row-equilibrated augmented KKT system with
    refinement (the 'auglu' mode of make_ip_step).

        K(delta) = [[W0 + delta*diag(free), A'^T], [A', -(D' + delta_ce)]]
        A' = R A,  D' = R D R,  duals recovered as nu = R nu'

    factor='lu': partial-pivoted LU plays MA57's symmetric-indefinite-
    pivoting role (reference opts/default.py:322) — it factors the
    indefinite K without requiring W0 PD (the condensed path's hidden
    assumption). Jacobi-scaled; two f64 block-form refinement sweeps reach
    residual ~3e-9 at the bench anchor (benchmarks/repro_f32_schur.py).

    factor='qr' (default): Householder QR — no pivoting (blocked,
    matmul-heavy: measured ~1.7x faster than pivoted LU on TPU at bench
    size) and stable on the indefinite K. XLA's QR carries an ABSOLUTE
    (not columnwise-relative) f32 backward error, so the matrix is
    Ruiz-equilibrated to |entries| ~ 1 first: with plain Jacobi scaling
    (tiny saddle diagonals -> entries up to 1e8) the QR solve is ~1e-3 and
    refinement stalls; after 3 Ruiz sweeps the direct solve reaches ~4e-6
    scaled residual (measured, anchor K). Guarded refinement sweeps keep
    whichever iterate has the smaller true residual.

    mode (qr only): None = stateless (factor every call).
    'refresh' = also return the factorization as `fac` for reuse.
    'stale' = SKIP the O(n^3) factorization: reuse `fac` from a previous
    refresh as a preconditioner for iterative refinement against the
    CURRENT K (assembled fresh in f32, O(n^2)). In a continuation loop K
    changes slowly between iterations, so 3 preconditioned sweeps recover
    the direction at a fraction of the cost; the `ok` gate (relative
    residual, finiteness, |dw| cap) rejects the step when the stale factor
    has drifted too far, and the iterate then stands still until the next
    refresh (IPOPT-watchdog-like semantics).

    The in-jit ladder raises delta until the solution is finite and
    |dw|_inf <= dw_cap (a near-singular factorization yields a finite but
    absurd step; treat it as failed, mirroring IPOptions.dw_cap)."""
    fdt = jnp.float32
    rdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # All O(n^2) assembly stays f32 (f64 emulation on TPU taxes elementwise
    # work ~100x); f64 appears only in O(n)-sized vectors and in the
    # refinement residual, computed from one-off f64 casts of the f32
    # matrices (their f32-rounded values ARE the system we solve).
    rn32 = jnp.clip(1.0 / jnp.clip(jnp.max(jnp.abs(A), axis=1), 1e-10, 1e10),
                    0., 1e6).astype(fdt)
    rn = rn32.astype(rdt)
    W32 = W0.astype(fdt)
    A32 = A.astype(fdt) * rn32[:, None]
    D_e = D.astype(rdt) * rn * rn
    r1_h = r1.astype(rdt)
    r2_e = r2.astype(rdt) * rn
    b = jnp.concatenate([r1_h, -r2_e])
    free32 = free.astype(fdt)
    D_reg = D_e + delta_ce
    Dr32 = D_reg.astype(fdt)

    def assemble(delta):
        d32 = jnp.asarray(delta, fdt)
        Wd = W32 + d32 * jnp.diag(free32)
        return jnp.block([[Wd, A32.T], [A32, -jnp.diag(Dr32)]])

    if factor == 'qr':
        def solve_with(Q, R, s, K, n_sweeps):
            M = K * s[:, None] * s[None, :]
            M64 = M.astype(rdt)
            c = b * s.astype(rdt)

            def msolve(v32):
                return jax.scipy.linalg.solve_triangular(
                    R, Q.T @ v32, lower=False).astype(rdt)

            z = msolve(c.astype(fdt))
            res = c - M64 @ z
            best = jnp.max(jnp.abs(res))
            for _ in range(n_sweeps):
                z1 = z + msolve(res.astype(fdt))
                res1 = c - M64 @ z1
                b1 = jnp.max(jnp.abs(res1))
                better = b1 < best
                z = jnp.where(better, z1, z)
                res = jnp.where(better, res1, res)
                best = jnp.minimum(best, b1)
            x = s.astype(rdt) * z
            rel = best / jnp.maximum(jnp.max(jnp.abs(c)), 1e-30)
            ok = (jnp.all(jnp.isfinite(x))
                  & (jnp.max(jnp.abs(x[:n])) <= dw_cap)
                  & (rel <= 1e-3))
            return x, ok

        if mode == 'stale':
            Q, R, s = fac
            K = assemble(delta_w)
            x, ok = solve_with(Q, R, s, K, n_sweeps=3)
            dw = x[:n] * free.astype(rdt)
            return dw, rn * x[n:], ok, fac

        def attempt(delta):
            K = assemble(delta)
            s = jnp.ones(K.shape[0], fdt)
            M = K
            for _ in range(3):
                rr = jnp.sqrt(jnp.clip(jnp.max(jnp.abs(M), axis=1),
                                       1e-12, None))
                s = s / rr
                M = K * s[:, None] * s[None, :]
            Q, R = jnp.linalg.qr(M)
            x, ok = solve_with(Q, R, s, K, n_sweeps=1)
            return x, ok, (Q, R, s)

        x0, ok0, fac0 = attempt(jnp.asarray(delta_w, rdt))

        def ladder_cond(carry):
            k, _, _, ok, _ = carry
            return jnp.logical_and(~ok, k < n_ladder)

        def ladder_body(carry):
            k, delta, _, _, _ = carry
            delta = jnp.maximum(delta * ladder_factor, delta_w)
            x, ok, fc = attempt(delta)
            return k + 1, delta, x, ok, fc

        _, _, x, ok, fac_out = jax.lax.while_loop(
            ladder_cond, ladder_body,
            (jnp.asarray(0), jnp.asarray(delta_w, rdt), x0, ok0, fac0))
        dw = x[:n] * free.astype(rdt)
        return dw, rn * x[n:], ok, fac_out

    # factor == 'lu'
    W64 = W32.astype(rdt)
    A64 = A32.astype(rdt)

    def attempt(delta):
        K = assemble(delta)
        Wd_diag = jnp.diag(K)[:n]
        kdiag = jnp.concatenate([jnp.abs(Wd_diag), Dr32])
        kd = jnp.clip(1.0 / jnp.sqrt(jnp.clip(kdiag, 1e-8, None)), 0., 1e4)
        Ks = K * kd[:, None] * kd[None, :]
        lu, piv = jax.scipy.linalg.lu_factor(Ks)

        def ksolve(v):
            return (kd * jax.scipy.linalg.lu_solve(
                (lu, piv), kd * v)).astype(rdt)

        x = ksolve(b.astype(fdt))
        for _ in range(n_refine):
            xw, xnu = x[:n], x[n:]
            r_w = r1_h - (W64 @ xw + delta * (free * xw) + A64.T @ xnu)
            r_nu = -r2_e - (A64 @ xw - D_reg * xnu)
            x = x + ksolve(jnp.concatenate([r_w, r_nu]).astype(fdt))
        ok = jnp.all(jnp.isfinite(x)) & (jnp.max(jnp.abs(x[:n])) <= dw_cap)
        return x, ok

    x0, ok0 = attempt(jnp.asarray(delta_w, rdt))

    def ladder_cond(carry):
        k, _, _, ok = carry
        return jnp.logical_and(~ok, k < n_ladder)

    def ladder_body(carry):
        k, delta, _, _ = carry
        delta = jnp.maximum(delta * ladder_factor, delta_w)
        x, ok = attempt(delta)
        return k + 1, delta, x, ok

    _, _, x, ok = jax.lax.while_loop(
        ladder_cond, ladder_body,
        (jnp.asarray(0), jnp.asarray(delta_w, rdt), x0, ok0))
    dw = x[:n] * free.astype(rdt)
    dnu = rn * x[n:]
    return dw, dnu, ok, None


def _advance_state(state, direction, ok, err_d, lbw, ubw, n_ineq,
                   tau, kappa_mu, mu_min, err_kkt=None, step_cap=None):
    """Fraction-to-boundary step + dual safeguards + adaptive-mu, shared by
    the dense and block KKT paths. ``err_kkt`` is the KKT error of the
    *incoming* iterate (max of primal and barrier-dual infeasibility); it is
    stored on the outgoing state so a while_loop driver can stop when the
    fleet has converged (lagging by one cheap iteration).

    ``step_cap`` (scaled units, optional): trust-region-style truncation
    |alpha dw|_inf <= step_cap. The fleet step has no line search; on
    strongly nonlinear continuations (wide wind sweeps) a full Newton step
    from a mildly perturbed iterate can leave the basin entirely — capping
    the actual displacement keeps the iteration local at the cost of more
    iterations far from the solution. Near the optimum |dw| is small and
    the cap is inactive."""
    w, s, y, lam = state['w'], state['s'], state['y'], state['lam']
    zl, zu, mu = state['zl'], state['zu'], state['mu']
    dw, dy, dlam, ds, dzl, dzu = direction
    lam_safe = jnp.maximum(lam, 1e-12)
    dl = jnp.maximum(w - lbw, 1e-20)
    du = jnp.maximum(ubw - w, 1e-20)

    def ftb(val, dval):
        neg = dval < 0
        ratios = jnp.where(neg, -tau * val / jnp.where(neg, dval, -1.), jnp.inf)
        return jnp.minimum(jnp.min(ratios, initial=1.0), 1.0)

    alpha = jnp.minimum(ftb(dl, dw), ftb(du, -dw))
    if n_ineq:
        alpha = jnp.minimum(alpha, ftb(s, ds))
    if step_cap is not None:
        alpha = jnp.minimum(
            alpha, step_cap / jnp.maximum(jnp.max(jnp.abs(dw)), 1e-12))
    alpha_z = jnp.minimum(ftb(jnp.maximum(zl, 1e-300), dzl),
                          ftb(jnp.maximum(zu, 1e-300), dzu))
    if n_ineq:
        alpha_z = jnp.minimum(alpha_z, ftb(lam_safe, dlam))

    w = w + alpha * dw
    y = jnp.clip(y + alpha * dy, -1e10, 1e10)
    if n_ineq:
        lam = jnp.clip(lam + alpha_z * dlam, 1e-16, 1e10)
        s = jnp.maximum(s + alpha * ds, 1e-16)
    zl = jnp.where(jnp.isfinite(lbw), zl + alpha_z * dzl, 0.)
    zu = jnp.where(jnp.isfinite(ubw), zu + alpha_z * dzu, 0.)
    # IPOPT's kappa_sigma corridor keeps bound duals consistent with the
    # barrier, preventing z blow-ups from poisoning sigma next iteration
    dl = jnp.maximum(w - lbw, 1e-20)
    du = jnp.maximum(ubw - w, 1e-20)
    kappa_sigma = 1e10
    zl = jnp.clip(zl, mu / (kappa_sigma * dl), kappa_sigma * mu / dl)
    zu = jnp.clip(zu, mu / (kappa_sigma * du), kappa_sigma * mu / du)
    zl = jnp.where(jnp.isfinite(lbw), zl, 0.)
    zu = jnp.where(jnp.isfinite(ubw), zu, 0.)

    # adaptive-mu lite: contract toward the dual-infeasibility level,
    # holding the barrier if the factorization failed outright
    mu = jnp.maximum(jnp.minimum(kappa_mu * mu, 0.1 * err_d), mu_min)
    mu = jnp.where(ok, mu, state['mu'])

    out = dict(w=w, s=s, y=y, lam=lam, zl=zl, zu=zu, mu=mu)
    if 'err' in state:
        out['err'] = err_kkt if err_kkt is not None else state['err']
    return out


def _make_block_ip_step(ocp, delta_w=1e-8, delta_c=1e-8, tau=0.99,
                        kappa_mu=0.8, mu_min=1e-8):
    """Interior-point iteration whose direction comes from the block-structured
    KKT factorization (ocp/blockkkt.py) — O(n_k) per-iteration complexity and
    no dense (n x n) intermediates, so it scales to paper-benchmark horizons
    (n_k=100, d=4) and stays vmappable over the scenario batch."""
    from ..ocp.blockkkt import make_block_kkt
    derivs_fn, kkt_solve, maps = make_block_kkt(ocp)
    n_eq, n_ineq = ocp.n_eq, ocp.n_ineq

    def step(state, p, lbw, ubw, free):
        w, s, y, lam = state['w'], state['s'], state['y'], state['lam']
        zl, zu, mu = state['zl'], state['zu'], state['mu']
        blocks = derivs_fn(w, y, lam, p)
        delta_ce = delta_c
        dw, dy, dlam, ds, dzl, dzu, ok, info = kkt_solve(
            blocks, w, s, y, lam, zl, zu, lbw, ubw, free, mu,
            delta_w, delta_c, delta_ce)
        err_p = jnp.max(jnp.abs(blocks['cE']), initial=0.)
        if n_ineq:
            err_p = jnp.maximum(err_p, jnp.max(jnp.abs(blocks['cI'] + s)))
        return _advance_state(state, (dw, dy, dlam, ds, dzl, dzu), ok,
                              info['err_d'], lbw, ubw, n_ineq, tau,
                              kappa_mu, mu_min,
                              err_kkt=jnp.maximum(info['err_d'], err_p))

    return step


def make_batched_solver(ocp, lb, ub, n_iter: int = 100, mesh=None,
                        axis_name: str = 'scenario', batch_p: bool = False,
                        tol: float = 0.0, kkt: str = 'auto', **ip_kwargs):
    """vmapped + sharded IP solve over a scenario batch.

    Returns solve(batched_state, P) jitted; if a Mesh is given, the
    scenario axis of all inputs is sharded over it (pure data parallelism over
    ICI; independent NLPs need no collectives - SURVEY section 2.10/5.8).

    batch_p=True treats every leaf of P as carrying a leading scenario axis
    (parameter sweeps: per-scenario theta0/cost/ref); False shares one P
    across the batch (e.g. randomized-initialization robustness studies).

    tol > 0 turns the fixed-length scan into a convergence-gated while_loop:
    a scenario stops iterating once its KKT error (state['err'], primal +
    barrier-dual infeasibility) drops below tol; n_iter becomes the cap.
    Under vmap the loop runs until every lane is done, so a converged fleet
    costs max-iterations-of-slowest, not n_iter.
    """
    from ..opti.ipsolver import InteriorPointSolver
    lbw, ubw, free_np, center_np = InteriorPointSolver.split_pins(lb, ub)
    lbw = jnp.asarray(lbw)
    ubw = jnp.asarray(ubw)
    free = jnp.asarray(free_np)

    step = make_ip_step(ocp, kkt=kkt, **ip_kwargs)

    def solve_one(state, p):
        if tol > 0.:
            if 'err' not in state:
                state = dict(state, err=jnp.asarray(jnp.inf))

            def cond(carry):
                it, st = carry
                return jnp.logical_and(it < n_iter, st['err'] > tol)

            def body(carry):
                it, st = carry
                return it + 1, step(st, p, lbw, ubw, free)

            _, out = jax.lax.while_loop(cond, body, (jnp.asarray(0), state))
            return out

        def body(st, _):
            return step(st, p, lbw, ubw, free), None
        out, _ = jax.lax.scan(body, state, None, length=n_iter)
        return out

    batched = jax.vmap(solve_one, in_axes=(0, 0 if batch_p else None))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard = NamedSharding(mesh, P(axis_name))
        state_keys = ['w', 's', 'y', 'lam', 'zl', 'zu', 'mu'] \
            + (['err'] if tol > 0. else [])
        state_shardings = {k: shard for k in state_keys}
        p_shardings = shard if batch_p else None
        if batch_p:
            # every P leaf carries the scenario axis; shard them all
            return jax.jit(batched,
                           in_shardings=(state_shardings, jax.tree_util.tree_map(
                               lambda _: shard, _p_template(ocp))),
                           out_shardings=state_shardings)
        return jax.jit(batched, in_shardings=(state_shardings, p_shardings),
                       out_shardings=state_shardings)
    return jax.jit(batched)


def _p_template(ocp):
    """Template P pytree for sharding annotation (structure only)."""
    from ..opti.homotopy import build_p_fix
    import numpy as _np
    return build_p_fix(ocp, _np.zeros(ocp.vstruct.total))


def stack_p(p_list):
    """Stack per-scenario parameter pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(
        [jnp.asarray(x) for x in xs]), *p_list)


def init_batched_state(ocp, V_init_batch, P, lb, ub, mu0=1e-2,
                       with_err: bool = False):
    """Stack per-scenario initial states into a batched pytree."""
    states = [_single_state(ocp, V0, P, lb, ub, mu0) for V0 in V_init_batch]
    out = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    if with_err:
        out['err'] = jnp.full((len(states),), jnp.inf)
    return out


def _single_state(ocp, V0, P, lb, ub, mu0):
    from ..opti.ipsolver import InteriorPointSolver
    lbw, ubw, free, center = InteriorPointSolver.split_pins(lb, ub)
    w = np.where(free > 0.5, np.asarray(V0), center)
    span = np.minimum(1e-2 * np.maximum(1., np.abs(w)), 0.5 * (ubw - lbw))
    w = np.clip(w, np.where(np.isfinite(lbw), lbw + span, -np.inf),
                np.where(np.isfinite(ubw), ubw - span, np.inf))
    cI = np.asarray(ocp.ineq_fn(jnp.asarray(w), P))
    s = np.maximum(np.abs(cI), mu0)   # violation-scale slacks (see ipsolver)
    lam = np.maximum(mu0 / s, 1e-8)
    dl = np.where(np.isfinite(lbw), np.maximum(w - lbw, 1e-8), np.inf)
    du = np.where(np.isfinite(ubw), np.maximum(ubw - w, 1e-8), np.inf)
    zl = np.where(np.isfinite(lbw), mu0 / dl, 0.)
    zu = np.where(np.isfinite(ubw), mu0 / du, 0.)
    return dict(w=jnp.asarray(w), s=jnp.asarray(s),
                y=jnp.zeros(ocp.n_eq), lam=jnp.asarray(lam),
                zl=jnp.asarray(zl), zu=jnp.asarray(zu),
                mu=jnp.asarray(float(mu0)))
