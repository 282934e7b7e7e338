"""Open/closed-loop simulation of the optimized system.

Counterpart of /root/reference/awebox/sim.py:44-233: the plant is the
optimized model's implicit DAE integrated with rk4root (RK4 with a Newton
rootfinder per stage); closed loop wraps a Pmpc controller. Algebraic
consistency at every sample comes from the same rootfinder
(sim.py:202-216).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..model.dae import dae_from_trial


class Simulation:
    def __init__(self, trial, sim_type: str = 'closed_loop', ts: float = None,
                 mpc_options: Optional[dict] = None):
        if sim_type not in ('open_loop', 'closed_loop'):
            raise ValueError('sim_type must be open_loop or closed_loop')
        self.trial = trial
        self.sim_type = sim_type
        self.dae = dae_from_trial(trial)
        self.T = trial.global_outputs()['time_period']
        self.ts = float(ts) if ts is not None else self.T / trial.ocp.n_k
        self.n_fe = trial.options['sim']['number_of_finite_elements']
        self.integrator = trial.options['sim'].get('integrator', 'collocation')

        # plant integrator: implicit Radau collocation substeps by default —
        # A-stable, so the sampling interval need not resolve the Baumgarte
        # mode (-2*kappa, ~0.1 s); explicit rk4root at ts/n_fe would leave
        # the stability region on coarse sampling grids (the reference's
        # integrator options, mdl/dae.py:103-136)
        import jax

        if self.integrator == 'collocation':
            step_fn = self.dae.make_collocation_step(d=3, scheme='radau',
                                                     iters=10)
            n_sub = self.n_fe

            def plant(x, u, zd, theta0):
                def body(carry, _):
                    return step_fn(carry[0], u, carry[1],
                                   self.ts / n_sub, theta0), None
                (xf, zdf), _ = jax.lax.scan(body, (x, zd), None, length=n_sub)
                return xf, zdf
            self._plant = jax.jit(plant)
        elif self.integrator == 'rk4root':
            def plant(x, u, zd, theta0):
                return self.dae.integrate(x, u, zd, self.ts, self.n_fe,
                                          theta0)
            self._plant = plant
        else:
            raise ValueError(f'unknown sim integrator {self.integrator!r}')

        if sim_type == 'closed_loop':
            from .pmpc import Pmpc
            self.mpc = Pmpc(trial, ts=self.ts, **(mpc_options or {}))
        else:
            self.mpc = None

        self.results: Dict[str, list] = {'t': [], 'x': [], 'u': [], 'zd': []}

    # ------------------------------------------------------------------
    def _orbit_u_at(self, t):
        """Open-loop control: the optimized zoh control at time t."""
        trial = self.trial
        tocp = trial.ocp
        V = np.asarray(trial.solution.V_opt)
        tf_k = np.asarray(tocp.tf_per_k_fn(V))
        t_x = np.concatenate([[0.], np.cumsum(tf_k / tocp.n_k)])
        tm = np.mod(t, self.T)
        k = min(int(np.searchsorted(t_x, tm, side='right')) - 1, tocp.n_k - 1)
        return np.asarray(tocp.vstruct.get_u_all(V)[max(k, 0)])

    def run(self, n_sim: int, x0_scaled=None, verbose=False):
        """sim.py:114-140: per sample, controller -> plant integration."""
        import jax.numpy as jnp
        trial = self.trial
        theta0 = trial.solution.P['theta0']
        vs = trial.ocp.vstruct
        if x0_scaled is None:
            x0_scaled = np.asarray(vs.get_x_all(trial.solution.V_opt)[0])

        x = jnp.asarray(x0_scaled)
        zd = self.dae.consistent_zd(x, jnp.zeros(self.dae.nu), theta0)
        t = 0.
        for i in range(n_sim):
            if self.sim_type == 'closed_loop':
                u0, _ = self.mpc.step(np.asarray(x), verbose=verbose)
            else:
                u0 = self._orbit_u_at(t)
            u0 = jnp.asarray(u0)
            self.results['t'].append(t)
            self.results['x'].append(np.asarray(x))
            self.results['u'].append(np.asarray(u0))
            self.results['zd'].append(np.asarray(zd))
            x, zd = self._plant(x, u0, zd, theta0)
            t += self.ts
        self.results['t'].append(t)
        self.results['x'].append(np.asarray(x))
        return self

    # ------------------------------------------------------------------
    def tracking_error(self):
        """RMS scaled deviation of the simulated states from the orbit."""
        trial = self.trial
        errs = []
        for t, x in zip(self.results['t'], self.results['x']):
            if self.mpc is not None:
                x_ref, _, _ = self.mpc._orbit_at(t)
            else:
                continue
            errs.append(np.linalg.norm(x - x_ref) / np.sqrt(x.size))
        return np.asarray(errs)

    def position_error_si(self):
        """Per-sample worst kite-position deviation from the reference orbit
        in METERS (the physically meaningful closed-loop tracking metric;
        reference mpc_closed_loop.py plots q vs q_ref in SI)."""
        trial = self.trial
        layout = trial.model.layout
        arch = trial.arch
        scaling = trial.model.scaling['x']
        errs = []
        for t, x in zip(self.results['t'], self.results['x']):
            if self.mpc is None:
                continue
            x_ref, _, _ = self.mpc._orbit_at(t)
            worst = 0.
            for kite in arch.kite_nodes:
                sl = layout.slices['x']['q' + arch.node_label(kite)]
                dq = (np.asarray(x)[sl] - np.asarray(x_ref)[sl]) * scaling[sl]
                worst = max(worst, float(np.linalg.norm(dq)))
            errs.append(worst)
        return np.asarray(errs)

    def latency_report(self):
        """MPC step wall time vs the real-time sampling budget ts
        (BASELINE.md MPC target; reference pmpc.py:208-217). The first step
        carries compilation and is reported separately."""
        if self.mpc is None or not self.mpc.stats:
            return None
        lat = [s['wall_time'] for s in self.mpc.stats]
        steady = sorted(lat[1:])[len(lat[1:]) // 2] if len(lat) > 1 else lat[0]
        return {'ts': self.ts, 'first_step_s': lat[0],
                'steady_median_s': steady,
                'latency_over_ts': steady / self.ts,
                'real_time_capable': steady < self.ts}
