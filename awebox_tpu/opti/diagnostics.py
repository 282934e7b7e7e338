"""KKT health check: LICQ, SOSC, conditioning, dependent constraints.

Counterpart of /root/reference/awebox/tools/debug_operations.py:53-152 and
opti/diagnostics.py:76+ (wired at opti/optimization.py:372-374): given a
solved (or attempted) NLP iterate, analyse the active-set KKT system —

- **LICQ**: rank of the active-constraint Jacobian (equalities + active
  inequalities + active variable bounds) equals its row count
  (debug_operations.py:93-98);
- **SOSC**: the reduced Hessian (null-space projection of the Lagrangian
  Hessian) is positive definite at the solution;
- **conditioning**: condition number of the full KKT matrix against a
  threshold (reference option solver.health_check.cond_threshold);
- **dependent constraints**: rows aligned with the small singular values of
  the active Jacobian are named, to point at redundant/conflicting
  constraint groups (debug_operations.py:120-152).

This runs dense (numpy SVD/eig) on the host — it is a diagnostic/test
harness, not a hot path; sizes are the test-problem sizes. The block
factorization (ocp/blockkkt.py) is the production solve; this module is how
its inertia decisions are audited.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np


@dataclass
class HealthReport:
    licq_ok: bool
    sosc_ok: bool
    cond_ok: bool
    kkt_cond: float
    jac_rank: int
    jac_rows: int
    min_reduced_eig: float
    n_active_ineq: int
    n_active_bounds: int
    dependent_constraints: List[str] = field(default_factory=list)
    notes: Dict[str, float] = field(default_factory=dict)

    @property
    def healthy(self) -> bool:
        return self.licq_ok and self.sosc_ok and self.cond_ok

    def summary(self) -> str:
        lines = [
            f"LICQ: rank {self.jac_rank}/{self.jac_rows} active rows "
            f"({'ok' if self.licq_ok else 'RANK DEFICIENT'})",
            f"SOSC: min reduced-Hessian eig {self.min_reduced_eig:.3e} "
            f"({'ok' if self.sosc_ok else 'NOT POSITIVE DEFINITE'})",
            f"KKT condition number {self.kkt_cond:.3e} "
            f"({'ok' if self.cond_ok else 'ILL-CONDITIONED'})",
            f"active inequalities: {self.n_active_ineq}, "
            f"active bounds: {self.n_active_bounds}",
        ]
        if self.dependent_constraints:
            lines.append('dependent constraint rows: '
                         + ', '.join(self.dependent_constraints[:10]))
        return '\n'.join(lines)


def _row_names(ocp, n_eq, n_ineq):
    """Human-readable name per equality/inequality row from the OCP's slice
    maps (used for dependent-constraint identification)."""
    eq_names = [''] * n_eq
    for name, sl in ocp.eq_slices.items():
        for i in range(sl.start, sl.stop):
            eq_names[i] = f'eq:{name}[{i - sl.start}]'
    ineq_names = [''] * n_ineq
    for name, sl in ocp.ineq_slices.items():
        for i in range(sl.start, sl.stop):
            ineq_names[i] = f'ineq:{name}[{i - sl.start}]'
    return eq_names, ineq_names


def health_check(ocp, w, P, lb, ub, y=None, lam=None,
                 active_tol: float = 1e-6,
                 cond_threshold: float = 1e12,
                 sosc_tol: float = -1e-7,
                 dependent_sv_ratio: float = 1e-10) -> HealthReport:
    """Analyse the active-set KKT system at iterate ``w``.

    ``y``/``lam`` (equality / inequality multipliers) sharpen the Lagrangian
    Hessian; if omitted the check degrades to an objective-Hessian SOSC,
    which is still a meaningful conditioning probe on the test problems.
    """
    import jax
    import jax.numpy as jnp

    w = jnp.asarray(w)
    n = w.shape[0]
    n_eq, n_ineq = ocp.n_eq, ocp.n_ineq
    y = jnp.zeros(n_eq) if y is None else jnp.asarray(y)
    lam = jnp.zeros(n_ineq) if lam is None else jnp.asarray(lam)

    cI = np.asarray(ocp.ineq_fn(w, P)) if n_ineq else np.zeros(0)
    JE = np.asarray(jax.jacfwd(ocp.eq_fn)(w, P)) if n_eq else np.zeros((0, n))
    JI = np.asarray(jax.jacfwd(ocp.ineq_fn)(w, P)) if n_ineq else np.zeros((0, n))

    def lagrangian(wv):
        L = ocp.f_fn(wv, P)
        if n_eq:
            L = L + y @ ocp.eq_fn(wv, P)
        if n_ineq:
            L = L + lam @ ocp.ineq_fn(wv, P)
        return L

    H = np.asarray(jax.hessian(lagrangian)(w))

    lb = np.asarray(lb)
    ub = np.asarray(ub)
    wn = np.asarray(w)

    # active set: pinned/binding bounds and near-zero inequalities
    # (debug_operations.py collects the same three row groups)
    active_ineq = np.where(cI > -active_tol)[0] if n_ineq else np.zeros(0, int)
    lb_active = np.where(wn - lb < active_tol * np.maximum(1., np.abs(wn)))[0]
    ub_active = np.where(ub - wn < active_tol * np.maximum(1., np.abs(wn)))[0]
    bound_rows = []
    bound_names = []
    seen = set()
    for i in np.concatenate([lb_active, ub_active]):
        i = int(i)
        if i in seen:
            continue
        seen.add(i)
        row = np.zeros(n)
        row[i] = 1.
        bound_rows.append(row)
        bound_names.append(f'bound:w[{i}]')
    B = np.stack(bound_rows) if bound_rows else np.zeros((0, n))

    eq_names, ineq_names = _row_names(ocp, n_eq, n_ineq)
    J_active = np.concatenate([JE, JI[active_ineq], B], axis=0)
    names_active = (eq_names + [ineq_names[i] for i in active_ineq]
                    + bound_names)

    rows = J_active.shape[0]
    if rows:
        sv = np.linalg.svd(J_active, compute_uv=False)
        rank = int(np.sum(sv > max(n, rows) * np.finfo(float).eps * sv[0])) \
            if sv[0] > 0 else 0
    else:
        sv = np.zeros(0)
        rank = 0
    licq_ok = (rank == rows) and rows <= n

    # dependent constraints: rows with large components in the left singular
    # vectors of the (near-)zero singular values (debug_operations.py:120-152)
    dependent = []
    if rows and rank < rows:
        U, s_full, _ = np.linalg.svd(J_active)
        for j in range(rank, rows):
            contrib = np.abs(U[:, j])
            for i in np.argsort(contrib)[::-1][:3]:
                if contrib[i] > 0.1:
                    dependent.append(names_active[i])
        dependent = sorted(set(dependent))

    # reduced Hessian on the null space of the active Jacobian (SOSC)
    if rows:
        _, s_full, Vt = np.linalg.svd(J_active, full_matrices=True)
        Z = Vt[rank:].T                      # (n, n - rank)
    else:
        Z = np.eye(n)
    if Z.shape[1]:
        red = Z.T @ H @ Z
        red_eigs = np.linalg.eigvalsh(0.5 * (red + red.T))
        min_red = float(red_eigs[0])
    else:
        min_red = np.inf
    sosc_ok = bool(min_red > sosc_tol * max(1., abs(min_red)))

    # KKT matrix conditioning: [[H, J_activeᵀ], [J_active, 0]]
    kkt = np.block([
        [H, J_active.T],
        [J_active, np.zeros((rows, rows))],
    ])
    kkt_sv = np.linalg.svd(kkt, compute_uv=False)
    kkt_cond = float(kkt_sv[0] / max(kkt_sv[-1], 1e-300))
    cond_ok = kkt_cond < cond_threshold

    return HealthReport(
        licq_ok=bool(licq_ok), sosc_ok=sosc_ok, cond_ok=bool(cond_ok),
        kkt_cond=kkt_cond, jac_rank=rank, jac_rows=int(rows),
        min_reduced_eig=min_red,
        n_active_ineq=int(len(active_ineq)), n_active_bounds=int(len(bound_names)),
        dependent_constraints=dependent,
        notes={'min_jac_sv': float(sv[-1]) if len(sv) else np.inf,
               'max_jac_sv': float(sv[0]) if len(sv) else 0.0})


def trial_health_check(trial, **kwargs) -> HealthReport:
    """Health check on a solved Trial using the final solver state's
    multipliers (optimization.py:372 analog)."""
    sol = trial.solution
    if sol is None:
        raise RuntimeError('trial has no solution; call optimize() first')
    st = sol.final_state or {}
    return health_check(trial.ocp, sol.V_opt, sol.P,
                        trial.lb_nominal, trial.ub_nominal,
                        y=st.get('y'), lam=st.get('lam'), **kwargs)
