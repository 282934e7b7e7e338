"""Primal-dual interior-point NLP solver in JAX.

From-scratch replacement for the reference's IPOPT + MA57 stack
(/root/reference/awebox/opti/preparation.py:233-363). Solves

    min  f(w, p)
    s.t. c_E(w, p)  = 0
         c_I(w, p) <= 0
         lbw <= w <= ubw

with the Fiacco-McCormick barrier method in primal-dual form, exactly as the
hippo strategy requires: ``mu_target`` keeps intermediate homotopy solves at a
relaxed barrier (reference opts/default.py:347-351), warm starts reuse primal
and dual iterates.

TPU-first linear algebra: the KKT system is solved by a Cholesky/Schur
factorization ([W, A^T; A, -D] with W = H + Sigma + delta_w I forced positive
definite by primal regularization). chol(W) succeeding certifies the correct
KKT inertia (n, m, 0) without symmetric-indefinite pivoting - the role MA57's
inertia detection plays in IPOPT - and costs only matmuls and triangular
solves, which map straight onto the MXU. All heavy pieces are jitted and
vmappable for batched scenario solves; the outer loop is host-driven.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import awelogger


@dataclass
class IPOptions:
    tol: float = 1e-8
    mu_init: float = 1e-1
    mu_target: float = 0.0       # relaxed barrier target (hippo)
    mu_linear_decrease: float = 0.2
    mu_superlinear_power: float = 1.5
    kappa_eps: float = 10.0      # barrier-subproblem tolerance factor
    tau_min: float = 0.99
    max_iter: int = 3000
    delta_w_init: float = 1e-6
    delta_w_max: float = 1e10
    # step-norm guard: a chol-successful factorization of a NEAR-singular
    # KKT matrix returns a finite but absurd direction (|dw| ~ 1e4 in scaled
    # units, observed on the 6-DOF n_k=20 initial step via near-dependent
    # trivial-dynamics/continuity/periodicity row chains). MA57 would report
    # wrong inertia there; chol cannot, so treat |dw|_inf > dw_cap as a
    # factorization failure and climb the regularization ladder instead of
    # handing the line search an unusable direction. The cap is RELATIVE to
    # the iterate scale (effective cap = dw_cap * max(1, |w|_inf)) so a
    # legitimately large Newton step from a far-from-solution iterate on a
    # large-norm problem is not misclassified (advisor r4); tune per trial
    # via solver options if a model family needs it.
    dw_cap: float = 300.0
    delta_c: float = 1e-7
    armijo_eta: float = 1e-4
    max_ls: int = 25
    bound_relax: float = 1e-8
    bound_push: float = 1e-2     # kappa_1: minimal distance of w0 from bounds
    slack_min: float = 1e-8
    verbose: bool = False


@dataclass
class IPResult:
    w: jnp.ndarray
    y: jnp.ndarray              # equality multipliers
    lam: jnp.ndarray            # inequality multipliers (>= 0)
    s: jnp.ndarray              # inequality slacks
    zl: jnp.ndarray
    zu: jnp.ndarray
    mu: float
    kkt_error: float
    iterations: int
    success: bool
    status: str = ''


def _finite(x, repl):
    return jnp.where(jnp.isfinite(x), x, repl)


class InteriorPointSolver:
    """One compiled solver instance per (f, eq, ineq) function triple.

    The parameter vector/pytree `p` flows through every call, so homotopy
    steps (which only change p and the bounds) reuse the same compilation.
    """

    def __init__(self, f, eq, ineq, n, n_eq, n_ineq, options: IPOptions = None,
                 derivs_fn=None, block_kkt=None):
        self.f = f
        self.eq = eq
        self.ineq = ineq
        self.n = n
        self.n_eq = n_eq
        self.n_ineq = n_ineq
        self.opts = options or IPOptions()
        self._build()
        if derivs_fn is not None:
            # structure-exploiting override: (w, y, lam, p) ->
            # (fval, gradf, cE, cI, JE, JI, H)
            self._derivs = derivs_fn
        # block-structured KKT path (ocp/blockkkt.make_block_kkt): a
        # (derivs_fn, kkt_solve) pair; the solve loop then never materializes
        # dense jacobians/hessians and the direction comes from the O(n_k)
        # factorization with its own in-jit regularization ladder
        self._block = block_kkt
        if block_kkt is not None:
            bd, bs = block_kkt
            self._block_derivs = jax.jit(bd)
            self._block_solve = jax.jit(bs)

    # ------------------------------------------------------------------
    def _build(self):
        f, eq, ineq = self.f, self.eq, self.ineq
        n_eq, n_ineq = self.n_eq, self.n_ineq

        def lagrangian(w, y, lam, p):
            L = f(w, p)
            if n_eq:
                L = L + y @ eq(w, p)
            if n_ineq:
                L = L + lam @ ineq(w, p)
            return L

        @jax.jit
        def derivs(w, y, lam, p):
            fval, gradf = jax.value_and_grad(f)(w, p)
            cE = eq(w, p) if n_eq else jnp.zeros(0)
            cI = ineq(w, p) if n_ineq else jnp.zeros(0)
            JE = jax.jacfwd(eq)(w, p) if n_eq else jnp.zeros((0, self.n))
            JI = jax.jacfwd(ineq)(w, p) if n_ineq else jnp.zeros((0, self.n))
            H = jax.hessian(lagrangian)(w, y, lam, p)
            return fval, gradf, cE, cI, JE, JI, H

        self._derivs = derivs

        @jax.jit
        def kkt_solve(gradf, cE, cI, JE, JI, H, w, s, y, lam, zl, zu,
                      lbw, ubw, free, mu, delta_w, delta_c, delta_ce):
            # barrier diagonal
            dl = jnp.maximum(w - lbw, 1e-20)
            du = jnp.maximum(ubw - w, 1e-20)
            sigma = zl / dl + zu / du

            W = H + jnp.diag(sigma) + delta_w * jnp.eye(self.n)
            # exact elimination of pinned variables: identity rows/cols on the
            # pinned block, zeroed Jacobian columns, zeroed rhs => dw_pin = 0
            W = W * (free[:, None] * free[None, :]) + jnp.diag(1. - free)

            A = jnp.concatenate([JE, JI], axis=0) * free[None, :]
            lam_safe = jnp.maximum(lam, 1e-12)
            # D for the inertia test must be > 0 on all rows (Forsgren-Gill);
            # the solve itself keeps equality rows exact - a positive delta_c
            # there would turn regularized steps into dy ~ cE/delta_c dual
            # explosions.
            D_test = jnp.concatenate([
                delta_c * jnp.ones(n_eq),
                s / lam_safe + delta_c * jnp.ones(n_ineq)])
            D = jnp.concatenate([
                delta_ce * jnp.ones(n_eq),
                s / lam_safe + delta_c * jnp.ones(n_ineq)])
            r2 = jnp.concatenate([cE, cI + mu / lam_safe]) if n_ineq else cE

            # primal-dual dual-infeasibility rhs (bound-dual terms eliminate
            # to the centered form): r1 = -(gradf + A^T nu - mu/dl + mu/du)
            r1 = -(gradf + A.T @ jnp.concatenate([y, lam]) - mu / dl + mu / du) * free

            # Inertia certificate (Forsgren-Gill): with D > 0, the KKT matrix
            # [W, A^T; A, -D] has the correct inertia (n, m, 0) iff
            # M = W + A^T D^-1 A is positive definite - chol(M) succeeding
            # replaces MA57's inertia detection with MXU-friendly algebra.
            Dinv_sqrt = 1.0 / jnp.sqrt(D_test)
            As = A * Dinv_sqrt[:, None]
            M = W + As.T @ As
            LM = jnp.linalg.cholesky(M)
            ok = jnp.all(jnp.isfinite(LM))
            diag = (jnp.max(jnp.abs(M), initial=0.), jnp.all(jnp.isfinite(M)),
                    jnp.max(jnp.abs(A), initial=0.), jnp.max(sigma, initial=0.))

            # direction from the full augmented system (accurate regardless of
            # the 1/delta_c conditioning of the condensed form), with one step
            # of iterative refinement
            m_tot = n_eq + n_ineq
            K = jnp.block([[W, A.T], [A, -jnp.diag(D)]])
            rhs = jnp.concatenate([r1, -r2])
            lu, piv = jax.scipy.linalg.lu_factor(K)
            sol = jax.scipy.linalg.lu_solve((lu, piv), rhs)
            resid = rhs - K @ sol
            sol = sol + jax.scipy.linalg.lu_solve((lu, piv), resid)
            dw = sol[:self.n] * free
            dnu = sol[self.n:]

            dy = dnu[:n_eq]
            dlam = dnu[n_eq:]
            ds = -(cI + s) - JI @ dw if n_ineq else jnp.zeros(0)
            dzl = mu / dl - zl - zl * dw / dl
            dzu = mu / du - zu + zu * dw / du

            return dw, dy, dlam, ds, dzl, dzu, ok, diag

        self._kkt_solve = kkt_solve

        @jax.jit
        def barrier_phi_theta(w, s, p, mu, lbw, ubw):
            """(barrier objective phi, constraint violation theta)."""
            phi = f(w, p)
            dl = w - lbw
            du = ubw - w
            phi = phi - mu * jnp.sum(jnp.where(jnp.isfinite(lbw), jnp.log(jnp.maximum(dl, 1e-300)), 0.0))
            phi = phi - mu * jnp.sum(jnp.where(jnp.isfinite(ubw), jnp.log(jnp.maximum(du, 1e-300)), 0.0))
            theta = 0.
            if n_ineq:
                phi = phi - mu * jnp.sum(jnp.log(jnp.maximum(s, 1e-300)))
                theta = theta + jnp.sum(jnp.abs(ineq(w, p) + s))
            if n_eq:
                theta = theta + jnp.sum(jnp.abs(eq(w, p)))
            feasible = jnp.logical_and(jnp.all(w > lbw), jnp.all(w < ubw))
            if n_ineq:
                feasible = jnp.logical_and(feasible, jnp.all(s > 0))
            phi = jnp.where(feasible, phi, jnp.inf)
            return phi, theta

        self._barrier_phi_theta = barrier_phi_theta

        @jax.jit
        def kkt_error(w, s, y, lam, zl, zu, p, mu, lbw, ubw, free):
            gradf = jax.grad(f)(w, p)
            r_w = gradf - zl + zu
            if n_eq:
                r_w = r_w + jax.vjp(lambda ww: eq(ww, p), w)[1](y)[0]
            if n_ineq:
                r_w = r_w + jax.vjp(lambda ww: ineq(ww, p), w)[1](lam)[0]

            # IPOPT-style scaling of the dual residual
            s_max = 100.
            mults = jnp.sum(jnp.abs(y)) + jnp.sum(jnp.abs(lam)) \
                + jnp.sum(jnp.abs(zl)) + jnp.sum(jnp.abs(zu))
            n_mults = n_eq + n_ineq + 2 * self.n
            s_d = jnp.maximum(s_max, mults / jnp.maximum(n_mults, 1)) / s_max

            err_d = jnp.max(jnp.abs(r_w * free)) / s_d
            err_p = 0.
            if n_eq:
                err_p = jnp.maximum(err_p, jnp.max(jnp.abs(eq(w, p))))
            if n_ineq:
                err_p = jnp.maximum(err_p, jnp.max(jnp.abs(ineq(w, p) + s)))
            dl = w - lbw
            du = ubw - w
            comp_l = jnp.where(jnp.isfinite(lbw), zl * dl - mu, 0.0)
            comp_u = jnp.where(jnp.isfinite(ubw), zu * du - mu, 0.0)
            err_c = jnp.maximum(jnp.max(jnp.abs(comp_l), initial=0.),
                                jnp.max(jnp.abs(comp_u), initial=0.))
            if n_ineq:
                err_c = jnp.maximum(err_c, jnp.max(jnp.abs(lam * s - mu)))
            err_c = err_c / s_d
            return jnp.maximum(jnp.maximum(err_d, err_p), err_c)

        self._kkt_error = kkt_error

    # ------------------------------------------------------------------
    @staticmethod
    def split_pins(lbw, ubw):
        """Detect fixed variables (lb == ub): they are eliminated exactly by
        masking (IPOPT's fixed_variable_treatment=make_parameter analog) while
        keeping problem shapes static across homotopy steps. Returns
        (lbw_free, ubw_free, free_mask, center)."""
        lbw = np.asarray(lbw, dtype=float)
        ubw = np.asarray(ubw, dtype=float)
        with np.errstate(invalid='ignore'):
            center = 0.5 * (lbw + ubw)
            eps_pin = 1e-9 * (1. + np.abs(np.where(np.isfinite(center), center, 0.)))
            pinned = (ubw - lbw) < 2. * eps_pin
        lbw_free = np.where(pinned, -np.inf, lbw)
        ubw_free = np.where(pinned, np.inf, ubw)
        return lbw_free, ubw_free, (1. - pinned.astype(float)), \
            np.where(pinned, center, 0.)

    def init_state(self, w0, p, lbw, ubw, y0=None, lam0=None, mu=None):
        o = self.opts
        lbw, ubw, free, center = self.split_pins(lbw, ubw)
        w0 = jnp.where(free > 0.5, jnp.asarray(w0), center)
        lbw = jnp.asarray(lbw)
        ubw = jnp.asarray(ubw)
        # push strictly inside bounds
        span = jnp.minimum(o.bound_push * jnp.maximum(1., jnp.abs(w0)),
                           0.5 * (ubw - lbw))
        w = jnp.clip(jnp.asarray(w0), lbw + span, ubw - span)
        w = jnp.where(jnp.isfinite(w), w, 0.0)

        mu = float(o.mu_init if mu is None else mu)
        cI = self.ineq(w, p) if self.n_ineq else jnp.zeros(0)
        # |cI| (not -cI): rows VIOLATED at the start (cI > 0, e.g. landing
        # terminal radii) need slacks at the violation scale, or the
        # fraction-to-boundary rule collapses onto the tiny slack and the
        # iteration jams at alpha ~ s/|cI|
        s = jnp.maximum(jnp.abs(cI), o.slack_min * 10)
        s = jnp.maximum(s, mu / 100.)
        y = jnp.zeros(self.n_eq) if y0 is None else jnp.asarray(y0)
        lam = jnp.maximum(mu / s, 1e-8) if lam0 is None else jnp.maximum(jnp.asarray(lam0), 1e-8)
        dl = jnp.maximum(w - lbw, 1e-8)
        du = jnp.maximum(ubw - w, 1e-8)
        zl = jnp.where(jnp.isfinite(lbw), mu / dl, 0.0)
        zu = jnp.where(jnp.isfinite(ubw), mu / du, 0.0)
        return dict(w=w, s=s, y=y, lam=lam, zl=zl, zu=zu, mu=mu)

    # ------------------------------------------------------------------
    def solve(self, w0, p, lbw, ubw, state=None, tol=None, mu_init=None,
              mu_target=None, max_iter=None, verbose=None, callback=None,
              callback_step=1, **kw) -> IPResult:
        """callback(it=..., w=..., mu=..., err=..., f=..., alpha=...) is
        invoked every `callback_step` iterations — the per-iteration
        recording hook (reference tools/callback.py:31-118, enabled by
        option solver.callback)."""
        import copy as _copy
        o = _copy.copy(self.opts)
        lbw, ubw, free_np, center_np = self.split_pins(lbw, ubw)
        relax = o.bound_relax * np.maximum(1., np.abs(np.where(np.isfinite(lbw), lbw, 0.)))
        lbw = np.where((free_np > 0.5) & np.isfinite(lbw), lbw - relax, lbw)
        relax_u = o.bound_relax * np.maximum(1., np.abs(np.where(np.isfinite(ubw), ubw, 0.)))
        ubw = np.where((free_np > 0.5) & np.isfinite(ubw), ubw + relax_u, ubw)
        free = jnp.asarray(free_np)
        pin_center = jnp.asarray(center_np)
        if tol is not None:
            o.tol = tol
        if mu_init is not None:
            o.mu_init = mu_init
        if mu_target is not None:
            o.mu_target = mu_target
        if max_iter is not None:
            o.max_iter = max_iter
        if verbose is not None:
            o.verbose = verbose
        lbw = jnp.asarray(lbw, dtype=jnp.asarray(w0).dtype)
        ubw = jnp.asarray(ubw, dtype=jnp.asarray(w0).dtype)
        if state is None:
            kw.setdefault('mu', o.mu_init)
            state = self.init_state(w0, p, lbw, ubw, **kw)
        w, s, y, lam = state['w'], state['s'], state['y'], state['lam']
        zl, zu = state['zl'], state['zu']
        mu = state['mu']
        w = jnp.where(free > 0.5, w, pin_center)

        mu_min = max(o.mu_target, o.tol / 10.)
        delta_w_last = 0.0
        filter_list = []
        theta_init = None
        best_err = np.inf
        best_state = None
        bad_streak = 0
        acceptable_streak = 0
        status = 'max_iter'
        success = False
        it = 0

        for it in range(1, o.max_iter + 1):
            if self._block is not None:
                blocks = self._block_derivs(w, y, lam, p)
                fval, gradf = blocks['fval'], blocks['gradf']
                cE, cI = blocks['cE'], blocks['cI']
            else:
                fval, gradf, cE, cI, JE, JI, H = self._derivs(w, y, lam, p)
            if not np.isfinite(float(fval)):
                status = 'nan_objective'
                break
            if self._block is not None:
                if not bool(jnp.all(jnp.isfinite(gradf))):
                    status = 'nan_derivatives'
                    break
            elif not (bool(jnp.all(jnp.isfinite(H))) and bool(jnp.all(jnp.isfinite(JE)))
                      and bool(jnp.all(jnp.isfinite(JI))) and bool(jnp.all(jnp.isfinite(gradf)))):
                status = 'nan_derivatives'
                break

            # convergence at the target barrier level
            err_target = float(self._kkt_error(w, s, y, lam, zl, zu, p,
                                               mu_min if o.mu_target > 0 else 0.,
                                               lbw, ubw, free))
            if err_target <= o.tol:
                success = True
                status = 'solved'
                break
            if err_target <= max(1e2 * o.tol, 1e-6) and mu <= mu_min * 1.01:
                acceptable_streak += 1
                if acceptable_streak >= 15:
                    success = True
                    status = 'solved_acceptable'
                    break
            else:
                acceptable_streak = 0

            # barrier subproblem convergence -> decrease mu
            err_mu = float(self._kkt_error(w, s, y, lam, zl, zu, p, mu, lbw, ubw, free))
            if err_mu <= o.kappa_eps * mu and mu > mu_min + 1e-16:
                mu = max(mu_min, min(o.mu_linear_decrease * mu,
                                     mu ** o.mu_superlinear_power))
                filter_list = []
                best_err = np.inf  # err is measured per-barrier-level

            # soft watchdog: restore the best iterate of this barrier level if
            # the iteration has catastrophically diverged (dual blow-ups near
            # degenerate active sets have no other recovery path)
            if err_mu < best_err:
                best_err = err_mu
                best_state = (w, s, y, lam, zl, zu)
                bad_streak = 0
            elif err_mu > max(100. * best_err, best_err + 1e2):
                bad_streak += 1
                if bad_streak >= 8 and best_state is not None:
                    w, s, y, lam, zl, zu = best_state
                    y = 0.5 * y
                    lam = jnp.maximum(0.5 * lam, 1e-8)
                    delta_w_last = max(delta_w_last, 1e-2)
                    filter_list = []
                    bad_streak = 0
                    if o.verbose:
                        awelogger.info(f'  [watchdog] restored best iterate '
                              f'(err {best_err:.2e}), damped duals')
                    continue

            # KKT solve with primal regularization ladder
            delta_w = 0.0
            ladder_hist = []
            # iterate-relative step cap (see IPOptions.dw_cap)
            cap = o.dw_cap * max(1.0, float(np.max(np.abs(np.asarray(w)))))
            if self._block is not None:
                # the block path self-escalates in-jit; start from the decayed
                # last delta and let its internal ladder do the work. The
                # host-side retry loop additionally enforces the step-norm
                # guard (see IPOptions.dw_cap).
                delta_w = max(delta_w_last / 3., 0.0)
                delta_ce = o.delta_c * max(mu, 1e-6) ** 0.25
                for trial in range(8):
                    dw, dy, dlam, ds, dzl, dzu, ok_j, info = self._block_solve(
                        blocks, w, s, y, lam, zl, zu, lbw, ubw, free, mu,
                        delta_w, o.delta_c, delta_ce)
                    ok = bool(ok_j)
                    delta_w = float(info['delta_used'])
                    dir_finite = np.all(np.isfinite(np.asarray(dw))) \
                        and np.all(np.isfinite(np.asarray(dy))) \
                        and np.all(np.isfinite(np.asarray(dlam)))
                    dw_norm = float(np.max(np.abs(np.asarray(dw)))) \
                        if dir_finite else np.inf
                    if ok and dir_finite and dw_norm <= cap:
                        break
                    delta_w = min(max(delta_w * 8., o.delta_w_init * 100.),
                                  o.delta_w_max)
                    if o.verbose and dir_finite and dw_norm > cap:
                        awelogger.info(f'  [step cap] |dw|={dw_norm:.1e} > '
                                       f'{cap:g}, delta_w -> {delta_w:.1e}')
                kdiag = (0., True, 0., 0.)
                if not (ok and dir_finite and dw_norm <= cap):
                    # over-cap exhaustion is a factorization failure too
                    # (dw_cap contract): a chol-ok factorization of a
                    # near-singular system returns a finite but absurd
                    # step, and silently using it defeats the guard
                    status = 'regularization_failed'
                    if o.verbose:
                        awelogger.info(f'  [block ladder exhausted] ok={ok} '
                              f'|dw|={dw_norm:.1e} delta={delta_w:.1e}')
                    break
            else:
                ladder_failed = False
                for trial in range(12):
                    delta_ce = 0.0 if trial == 0 else o.delta_c * max(mu, 1e-6) ** 0.25
                    dw, dy, dlam, ds, dzl, dzu, ok, kdiag = self._kkt_solve(
                        gradf, cE, cI, JE, JI, H, w, s, y, lam, zl, zu,
                        lbw, ubw, free, mu, delta_w, o.delta_c, delta_ce)
                    dir_finite = np.all(np.isfinite(np.asarray(dw))) \
                        and np.all(np.isfinite(np.asarray(dy))) \
                        and np.all(np.isfinite(np.asarray(dlam)))
                    dw_norm = float(np.max(np.abs(np.asarray(dw)))) \
                        if dir_finite else np.inf
                    ladder_hist.append((delta_w, bool(ok), bool(dir_finite)))
                    if bool(ok) and dir_finite and dw_norm <= cap:
                        break
                    if bool(ok) and dir_finite and o.verbose:
                        awelogger.info(f'  [step cap] |dw|={dw_norm:.1e} > '
                                       f'{cap:g}, raising delta_w')
                    if delta_w == 0.0:
                        delta_w = min(max(o.delta_w_init, delta_w_last / 3.), 1e4)
                    else:
                        delta_w *= 100. if delta_w_last == 0 else 8.
                    if delta_w > o.delta_w_max:
                        break
                else:
                    ladder_failed = True
                if ladder_failed:
                    status = 'regularization_failed'
                    if o.verbose:
                        awelogger.info(f'  [ladder exhausted] ok={bool(ok)} '
                              f'|dw|={float(jnp.max(jnp.abs(dw))):.2e} '
                              f'|H|={float(jnp.max(jnp.abs(H))):.2e} '
                              f'|y|={float(jnp.max(jnp.abs(y), initial=0.)):.2e} '
                              f'|lam|={float(jnp.max(lam, initial=0.)):.2e} '
                              f'min_s={float(jnp.min(s, initial=1.)):.2e}')
                    break
                if delta_w > o.delta_w_max:
                    status = 'regularization_failed'
                    if o.verbose:
                        awelogger.info(f'  [ladder overflow] ok={bool(ok)} '
                              f'|H|={float(jnp.max(jnp.abs(H))):.2e} '
                              f'|y|={float(jnp.max(jnp.abs(y), initial=0.)):.2e} '
                              f'|lam|={float(jnp.max(lam, initial=0.)):.2e} '
                              f'|M|={float(kdiag[0]):.2e} Mfin={bool(kdiag[1])} '
                              f'|A|={float(kdiag[2]):.2e} sig={float(kdiag[3]):.2e}')
                        awelogger.info('  ladder history: %s',
                                       [(f'{d:.1e}', o2, f2)
                                        for (d, o2, f2) in ladder_hist])
                        Habs = np.abs(np.asarray(H))
                        im = np.unravel_index(np.argmax(Habs), Habs.shape)
                        awelogger.info(
                            f'  H argmax at {im}; top rows: '
                            f'{np.argsort(-Habs.max(axis=1))[:6].tolist()}')
                    break
            if delta_w > 0:
                delta_w_last = min(delta_w, o.delta_w_max)
            else:
                delta_w_last = delta_w_last / 3.  # decay when no damping needed

            # fraction-to-boundary
            tau = max(o.tau_min, 1. - mu)
            alpha_max = 1.0

            def ftb(val, dval):
                neg = dval < 0
                ratios = jnp.where(neg, -tau * val / jnp.where(neg, dval, -1.), jnp.inf)
                return float(jnp.min(ratios, initial=1.0))

            dl = w - lbw
            du = ubw - w
            alpha_max = min(alpha_max, ftb(dl, dw), ftb(du, -dw))
            if self.n_ineq:
                alpha_max = min(alpha_max, ftb(s, ds))
            alpha_z = 1.0
            alpha_z = min(alpha_z, ftb(jnp.maximum(zl, 1e-300), dzl),
                          ftb(jnp.maximum(zu, 1e-300), dzu))
            if self.n_ineq:
                alpha_z = min(alpha_z, ftb(lam, dlam))

            # filter line search (Waechter-Biegler style, lean variant)
            phi0_j, theta0_j = self._barrier_phi_theta(w, s, p, mu, lbw, ubw)
            phi_c, theta_c = float(phi0_j), float(theta0_j)
            if theta_init is None:
                theta_init = max(theta_c, 1e-8)
            theta_min = 1e-4 * max(1., theta_init)
            # Waechter-Biegler theta_max: never accept a trial point whose
            # constraint violation exceeds a multiple of the initial one.
            # Without this cap the phi-improvement branch can accept steps
            # that explode feasibility by 1e4 (observed on the 6-DOF n_k=20
            # initial step), trapping the solve in a watchdog-restore loop.
            theta_max = 1e2 * max(1., theta_init)

            # barrier directional derivative
            ddphi = float(gradf @ dw
                          - mu * jnp.sum(jnp.where(jnp.isfinite(lbw), dw / jnp.maximum(dl, 1e-300), 0.))
                          + mu * jnp.sum(jnp.where(jnp.isfinite(ubw), dw / jnp.maximum(du, 1e-300), 0.)))
            if self.n_ineq:
                ddphi += float(-mu * jnp.sum(ds / jnp.maximum(s, 1e-300)))

            gamma_theta, gamma_phi = 1e-5, 1e-8
            alpha = alpha_max
            accepted = False
            for _ in range(o.max_ls):
                w_new = w + alpha * dw
                s_new = s + alpha * ds if self.n_ineq else s
                phi_a_j, theta_a_j = self._barrier_phi_theta(w_new, s_new, p, mu, lbw, ubw)
                phi_a, theta_a = float(phi_a_j), float(theta_a_j)
                if np.isfinite(phi_a) and theta_a <= theta_max:
                    in_filter = any(theta_a >= th_f and phi_a >= ph_f
                                    for (th_f, ph_f) in filter_list)
                    if not in_filter:
                        if theta_c <= theta_min and ddphi < 0:
                            # f-type: Armijo on the barrier objective
                            if phi_a <= phi_c + o.armijo_eta * alpha * ddphi:
                                accepted = True
                                break
                        if (theta_a <= (1. - gamma_theta) * theta_c
                                or phi_a <= phi_c - gamma_phi * theta_c):
                            # h-type: progress on feasibility or objective
                            if not (theta_c <= theta_min and ddphi < 0):
                                accepted = True
                                filter_list.append((
                                    (1. - gamma_theta) * theta_c,
                                    phi_c - gamma_phi * theta_c))
                                if len(filter_list) > 60:
                                    filter_list.pop(0)
                                break
                alpha *= 0.5
            if not accepted:
                # watchdog: take a tiny step to escape, with more regularization
                # next time (growth capped: compounding here once inflated the
                # ladder start past delta_w_max and aborted whole solves)
                alpha = min(1e-4, alpha_max)
                delta_w_last = min(max(delta_w_last, o.delta_w_init) * 10., 1e5)

            w = w + alpha * dw
            dy_step = jnp.clip(alpha * dy, -1e4, 1e4)
            y = y + dy_step
            y_norm = float(jnp.max(jnp.abs(y), initial=0.))
            if y_norm > 1e6:
                y = y * (1e6 / y_norm)
            lam = jnp.maximum(lam + alpha_z * dlam, 1e-16) if self.n_ineq else lam
            if self.n_ineq:
                s = jnp.maximum(s + alpha * ds, 1e-16)
            zl = zl + alpha_z * dzl
            zu = zu + alpha_z * dzu
            # keep bound duals in IPOPT's safeguard corridor
            dl = jnp.maximum(w - lbw, 1e-20)
            du = jnp.maximum(ubw - w, 1e-20)
            kappa_sigma = 1e10
            zl = jnp.clip(zl, mu / (kappa_sigma * dl), kappa_sigma * mu / dl)
            zu = jnp.clip(zu, mu / (kappa_sigma * du), kappa_sigma * mu / du)
            zl = jnp.where(jnp.isfinite(lbw), zl, 0.)
            zu = jnp.where(jnp.isfinite(ubw), zu, 0.)

            if callback is not None and it % callback_step == 0:
                callback(it=it, w=np.asarray(w), mu=float(mu),
                         err=float(err_mu), f=float(fval),
                         alpha=float(alpha), delta_w=float(delta_w))

            if o.verbose and (it % 10 == 0 or it <= 30):
                awelogger.info(f'  ip iter {it:4d}: mu={mu:9.2e} err={err_mu:9.2e} '
                      f'alpha={alpha:8.1e} dw={delta_w:8.1e} f={float(fval):13.6e}')

        # return the best iterate of the last barrier level if the final
        # iterate is worse (watchdog cycling can end on a bad step)
        if best_state is not None:
            err_now = float(self._kkt_error(w, s, y, lam, zl, zu, p, mu, lbw, ubw, free))
            if best_err < err_now:
                w, s, y, lam, zl, zu = best_state
        err_final = float(self._kkt_error(w, s, y, lam, zl, zu, p,
                                          mu_min if o.mu_target > 0 else 0., lbw, ubw, free))
        return IPResult(w=w, y=y, lam=lam, s=s, zl=zl, zu=zu, mu=mu,
                        kkt_error=err_final, iterations=it,
                        success=success or err_final <= o.tol * 100,
                        status=status)
