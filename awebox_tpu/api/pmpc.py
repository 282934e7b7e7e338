"""Periodic tracking NMPC built from a solved trial.

Counterpart of /root/reference/awebox/pmpc.py:41-353: an N-interval tracking
OCP over the optimized periodic orbit, with theta frozen to the optimum, the
initial state pinned to the measured x0 (exactly eliminated by the solver's
pinned-variable treatment), and the tracking reference obtained by evaluating
the periodic collocation interpolant of the optimal orbit at the shifted time
grid. Each feedback step is a warm-started bounded-iteration interior-point
solve of the same compiled NLP — the analog of the reference's 2-iteration
relaxed-barrier presolve + tracking solve (pmpc.py:208-217, 251-261).
"""
from __future__ import annotations

import copy
import time
from typing import Dict, Optional

import numpy as np

from ..model.system import PHI_NAMES
from ..ocp.bounds import build_v_bounds
from ..ocp.transcription import build_ocp
from ..opti import homotopy as hm
from ..opti.ipsolver import InteriorPointSolver, IPOptions


class Pmpc:
    def __init__(self, trial, N: int = 10, d: int = None, ts: float = None,
                 max_iter: int = 60, mu_mpc: float = 1e-3,
                 cost_type: str = 'tracking'):
        """trial: an optimized Trial (the periodic orbit to track).

        cost_type: 'tracking' follows the reference orbit (pmpc.py:326-353);
        'economic' keeps the power objective live over the horizon with a
        light tracking regularization (reference pmpc.py:141-151 economic
        solver: power economics + Q/R/P deviation weights)."""
        self.trial = trial
        mpc_opts = trial.options['mpc']
        self.N = int(N or mpc_opts['N'])
        self.d = int(d or mpc_opts['d'])
        self.max_iter = max_iter
        self.mu_mpc = mu_mpc
        if cost_type not in ('tracking', 'economic'):
            raise ValueError(f'unknown mpc cost_type {cost_type!r}')
        self.cost_type = cost_type

        self.T = trial.global_outputs()['time_period']
        self.ts = float(ts) if ts is not None else self.T / (trial.ocp.n_k)

        # --- build the mpc ocp: same model, receding-horizon 'mpc' type
        # (NOT 'tracking', which is periodic: the horizon must stay open,
        # reference pmpc.py:68-84 sets trajectory.type='mpc') -------------
        options = copy.deepcopy(trial.options)
        options['user_options']['trajectory']['type'] = 'mpc'
        options['nlp']['n_k'] = self.N
        options['nlp']['collocation']['d'] = self.d
        options['user_options']['trajectory']['lift_mode']['phase_fix'] = 'simple'

        self.model = trial.model  # same physics model
        self.ocp = build_ocp(self.model, options)
        self.lb_nominal, self.ub_nominal = build_v_bounds(self.ocp)

        # horizon time: t_f pinned so each interval spans ts
        self.tf_horizon = self.ts * self.N

        # reference interpolant of the optimal orbit
        self._setup_reference_interpolant()

        # parameter template + solver
        V_ref0 = self.reference_V(0.)
        self.P = hm.build_p_fix(self.ocp, V_ref0)
        # mpc costs: pure tracking (pmpc.py:326-353), or economic power
        # objective with light deviation regularization (pmpc.py:141-151)
        import jax.numpy as jnp
        for name in self.P['cost']:
            self.P['cost'][name] = jnp.asarray(0.)
        if self.cost_type == 'economic':
            # psi is pinned at 1/2 (see _bounds_for): the homotopy blend
            # (1-psi)*power + psi*tracking then carries BOTH terms; weights
            # are doubled so the effective weights are power=1, tracking=1e-2
            self.P['cost']['power'] = jnp.asarray(2.)
            self.P['cost']['tracking'] = jnp.asarray(2e-2)
        else:
            self.P['cost']['tracking'] = jnp.asarray(1.)
        self.P['cost']['u_regularisation'] = jnp.asarray(1e-6)
        self.P['cost']['xdot_regularisation'] = jnp.asarray(1e-8)

        # dense autodiff derivatives: the structured per-node assembly
        # assumes path rows at every shooting node, which the 'mpc' type
        # violates (k=0 rows dropped)
        derivs = None
        self.solver = InteriorPointSolver(
            self.ocp.f_fn, self.ocp.eq_fn, self.ocp.ineq_fn,
            n=self.ocp.vstruct.total, n_eq=self.ocp.n_eq,
            n_ineq=self.ocp.n_ineq,
            options=IPOptions(tol=1e-4, mu_init=self.mu_mpc,
                              mu_target=self.mu_mpc, max_iter=max_iter),
            derivs_fn=derivs)

        self._state = None
        self._V_prev = None
        self._prev_res = None
        self.t_current = 0.
        self.stats = []

    # ------------------------------------------------------------------
    def _setup_reference_interpolant(self):
        trial = self.trial
        tocp = trial.ocp
        V = np.asarray(trial.solution.V_opt)
        tvs = tocp.vstruct
        tf_k = np.asarray(tocp.tf_per_k_fn(V))
        self._orbit_t_x = np.concatenate([[0.], np.cumsum(tf_k / tocp.n_k)])
        self._orbit_X = np.asarray(tvs.get_x_all(V))
        self._orbit_CX = np.asarray(tvs.get_coll_x(V))
        self._orbit_CZ = np.asarray(tvs.get_coll_z(V))
        if tvs.u_param == 'poly':
            # quadrature-averaged per-interval control of the source orbit
            qw = np.asarray(tocp.coll.quad_weights)
            self._orbit_U = np.einsum('j,kju->ku', qw,
                                      np.asarray(tvs.get_coll_u(V)))
        else:
            self._orbit_U = np.asarray(tvs.get_u_all(V))
        self._orbit_nk = tocp.n_k
        self._orbit_coll = tocp.coll
        self._orbit_tfk = tf_k

    def _orbit_at(self, t):
        """(x, z, u) scaled on the periodic orbit at absolute time t."""
        t = np.mod(t, self.T)
        t_x = self._orbit_t_x
        k = min(int(np.searchsorted(t_x, t, side='right')) - 1, self._orbit_nk - 1)
        k = max(k, 0)
        tau = (t - t_x[k]) / (self._orbit_tfk[k] / self._orbit_nk)
        tau = min(max(tau, 0.), 1.)
        lx = self._orbit_coll.interp_x(tau)
        lu = self._orbit_coll.interp_u(tau)
        stack = np.concatenate([self._orbit_X[k][None, :], self._orbit_CX[k]], axis=0)
        x = lx @ stack
        z = lu @ self._orbit_CZ[k]
        u = self._orbit_U[k]
        return x, z, u

    def reference_V(self, t0: float) -> np.ndarray:
        """V-shaped reference: the orbit over [t0, t0 + N*ts]."""
        ocp = self.ocp
        vs = ocp.vstruct
        V_ref = np.zeros(vs.total)

        # theta frozen from the trial optimum (pmpc.py:68-84)
        trial_vs = self.trial.ocp.vstruct
        V_opt = np.asarray(self.trial.solution.V_opt)
        for name in vs.theta_names:
            if name == 't_f':
                V_ref[vs.theta_slice(name)] = self.tf_horizon
            else:
                val = V_opt[trial_vs.theta_slice(name)]
                V_ref[vs.theta_slice(name)] = val
        V_ref[vs.phi_slice] = 1.

        poly = vs.u_param == 'poly'
        for k in range(self.N + 1):
            t = t0 + k * self.ts
            x, z, u = self._orbit_at(t)
            V_ref[vs.x_slice(k)] = x
            if k < self.N:
                if not poly:
                    V_ref[vs.u_slice(k)] = u
                    V_ref[vs.z_slice(k)] = z
                for j in range(self.d):
                    tc = t + self.ocp.coll.tau_root[1 + j] * self.ts
                    xc, zc, uc = self._orbit_at(tc)
                    V_ref[vs.coll_x_slice(k, j)] = xc
                    V_ref[vs.coll_z_slice(k, j)] = zc
                    if poly:
                        V_ref[vs.coll_u_slice(k, j)] = uc
        return V_ref

    # ------------------------------------------------------------------
    def _bounds_for(self, x0_scaled):
        vs = self.ocp.vstruct
        lb = self.lb_nominal.copy()
        ub = self.ub_nominal.copy()
        # pin phi at its FINAL homotopy values: gamma/tau/iota = 0 (real
        # dynamics — gamma=1 would re-enable the fictitious forces, which
        # the zero-weight mpc cost then exploits and the plant cannot
        # realize), tracking blend psi*eta*nu*upsilon = 1
        psi_pin = 0.5 if self.cost_type == 'economic' else 1.
        phi_final = {'gamma': 0., 'tau': 0., 'iota': 0.,
                     'psi': psi_pin, 'eta': 1., 'nu': 1., 'upsilon': 1.}
        for i, name in enumerate(PHI_NAMES):
            lb[vs.phi_slice.start + i] = phi_final[name]
            ub[vs.phi_slice.start + i] = phi_final[name]
        # fictitious controls stay at zero (the homotopy's 'release_fict'
        # end state for a physical trajectory)
        layout = self.model.layout
        for name in layout.names('u'):
            if 'fict' in name:
                rel = layout.slices['u'][name]
                for k in range(self.N):
                    s = vs.u_slice(k)
                    lb[s.start + rel.start:s.start + rel.stop] = 0.
                    ub[s.start + rel.start:s.start + rel.stop] = 0.
        # pin theta (frozen design, fixed horizon)
        for name in vs.theta_names:
            sl = vs.theta_slice(name)
            if name == 't_f':
                lb[sl] = self.tf_horizon
                ub[sl] = self.tf_horizon
            else:
                trial_vs = self.trial.ocp.vstruct
                val = np.asarray(self.trial.solution.V_opt)[trial_vs.theta_slice(name)]
                lb[sl] = val
                ub[sl] = val
        # pin the initial state (pmpc.py:119-131: delete initial-state path
        # constraints, impose x(0) = x0)
        sl = vs.x_slice(0)
        lb[sl] = x0_scaled
        ub[sl] = x0_scaled
        return lb, ub

    def step(self, x0_scaled: np.ndarray, verbose: bool = False):
        """One MPC feedback step: returns the scaled control u0 (zoh).

        (pmpc.py:221-302)"""
        vs = self.ocp.vstruct
        V_ref = self.reference_V(self.t_current)
        self.P['ref'] = np.asarray(V_ref)

        lb, ub = self._bounds_for(np.asarray(x0_scaled))

        if self._V_prev is not None:
            V_init = self._shift_solution(self._V_prev)
        else:
            V_init = V_ref.copy()
        V_init[vs.x_slice(0)] = x0_scaled

        t0 = time.time()
        # warm-start duals from the previous feedback solve (the role of
        # the reference's 2-iteration relaxed-barrier presolve,
        # pmpc.py:208-217: keep the solver near its barrier trajectory)
        ws_state = None
        if self._prev_res is not None:
            ws_state = self.solver.init_state(
                V_init, self.P, lb, ub, y0=self._prev_res.y,
                lam0=self._prev_res.lam, mu=self.mu_mpc)
        res = self.solver.solve(V_init, self.P, lb, ub, state=ws_state,
                                tol=1e-4, mu_init=self.mu_mpc,
                                mu_target=self.mu_mpc,
                                max_iter=self.max_iter, verbose=verbose)
        self.stats.append({'iterations': res.iterations,
                           'kkt_error': res.kkt_error,
                           'wall_time': time.time() - t0})

        V_sol = np.asarray(res.w)
        self._V_prev = V_sol
        self._prev_res = res
        self.t_current += self.ts
        if vs.u_param == 'poly':
            # quadrature-averaged first-interval control
            # (reference pmpc.py:286-292 poly extraction)
            qw = np.asarray(self.ocp.coll.quad_weights)
            CU = np.stack([V_sol[vs.coll_u_slice(0, j)]
                           for j in range(self.d)])
            u0 = qw @ CU
        else:
            u0 = V_sol[vs.u_slice(0)]
        return u0, V_sol

    def _shift_solution(self, V_prev):
        """Shift the horizon by one interval (pmpc.py:300-302)."""
        vs = self.ocp.vstruct
        V = V_prev.copy()
        poly = vs.u_param == 'poly'
        for k in range(self.N - 1):
            V[vs.x_slice(k)] = V_prev[vs.x_slice(k + 1)]
            if not poly:
                V[vs.u_slice(k)] = V_prev[vs.u_slice(k + 1)]
                V[vs.z_slice(k)] = V_prev[vs.z_slice(k + 1)]
                V[vs.xdot_slice(k)] = V_prev[vs.xdot_slice(k + 1)]
            for j in range(self.d):
                V[vs.coll_x_slice(k, j)] = V_prev[vs.coll_x_slice(k + 1, j)]
                V[vs.coll_z_slice(k, j)] = V_prev[vs.coll_z_slice(k + 1, j)]
                if poly:
                    V[vs.coll_u_slice(k, j)] = V_prev[vs.coll_u_slice(k + 1, j)]
        V[vs.x_slice(self.N)] = V_prev[vs.x_slice(self.N)]
        return V
