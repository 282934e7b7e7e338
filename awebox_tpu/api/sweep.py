"""Sweep: parametric studies over trials.

Counterpart of /root/reference/awebox/sweep.py:51-202. Two execution paths:

* serial with warm-start chaining (reference parity,
  sweep.py:117-172): each parametric point re-optimizes starting from the
  previous solution;
* batched: because theta0 (wind, aero, tether parameters) is a pytree input
  of every compiled function, a parameter sweep is one vmapped fixed-
  iteration solve over the scenario axis (parallel/batch.py) — the TPU-native
  replacement for the serial loop.
"""
from __future__ import annotations

import copy
import time
from typing import Dict, List

import numpy as np

from .trial import Trial


class Sweep:
    def __init__(self, options_seed, param_options: List[Dict], name='sweep'):
        """param_options: list of dotted-path override dicts, one per case,
        e.g. [{'user_options.wind.u_ref': 5.}, {...: 6.}, ...]."""
        self.base_seed = options_seed
        self.param_options = param_options
        self.name = name
        self.sweep_dict: Dict = {}
        self.plot_dict: Dict = {}

    def run(self, final_homotopy_step='final', verbose=False, warmstart_chain=True):
        """Serial sweep with warm-start chaining."""
        previous_V = None
        for idx, overrides in enumerate(self.param_options):
            seed = copy.deepcopy(self.base_seed)
            if hasattr(seed, 'as_dict'):
                trial = Trial(copy.deepcopy(seed), f'{self.name}_{idx}')
                for key, val in overrides.items():
                    trial.options_raw[key] = val
            else:
                seed = dict(seed)
                seed.update(overrides)
                trial = Trial(seed, f'{self.name}_{idx}')
            trial.build()
            t0 = time.time()
            trial.optimize(final_homotopy_step=final_homotopy_step,
                           verbose=verbose,
                           warmstart=previous_V if warmstart_chain else None)
            label = '_'.join(str(v) for v in overrides.values())
            self.sweep_dict[label] = {
                'success': trial.solve_succeeded,
                'global_outputs': trial.global_outputs(),
                'theta_opt': trial.theta_opt(),
                'wall_time': time.time() - t0,
                'iterations': trial.solution.stats['iterations'],
            }
            self.plot_dict[label] = trial.interpolate() if trial.solve_succeeded else None
            if trial.solve_succeeded and warmstart_chain:
                previous_V = np.asarray(trial.solution.V_opt)
        return self

    # ------------------------------------------------------------------
    def run_batched(self, anchor_trial=None, n_iter: int = 200, mesh=None,
                    verbose=False, tol: float = 1e-7):
        """Batched sweep: ONE jitted vmapped fixed-iteration solve refines
        every parametric case simultaneously (the TPU replacement for the
        serial warmstart chain, reference sweep.py:117-172).

        The anchor is a single fully-homotopy-solved trial on the base
        options; each scenario then continues from the anchor's converged
        state with its own theta0 (e.g. per-scenario wind u_ref), final-step
        bounds and final cost weights. Only dotted paths that map onto theta0
        leaves can be swept this way (wind/atmosphere/aero parameters);
        structural overrides need the serial path.
        """
        import copy as _copy

        import jax
        import jax.numpy as jnp

        from ..opti import homotopy as homotopy_mod
        from ..parallel import batch as batch_mod

        if anchor_trial is None:
            anchor_trial = Trial(_copy.deepcopy(self.base_seed),
                                 f'{self.name}_anchor').build()
            anchor_trial.optimize(verbose=verbose)
        if not anchor_trial.solve_succeeded:
            raise RuntimeError('anchor trial failed; cannot batch-continue')
        self.anchor_trial = anchor_trial
        ocp = anchor_trial.ocp

        # final-step bounds and cost weights (replayed, not re-solved)
        lbf, ubf = homotopy_mod.final_bounds(
            ocp, anchor_trial.lb_nominal, anchor_trial.ub_nominal,
            np.asarray(anchor_trial.V_init))
        # the anchor solution sits ON the host solver's (relaxed) bounds;
        # refine under the same relaxation or the barrier terms blow up at
        # the active set (ipsolver.solve applies the identical recipe)
        relax = 1e-8
        fin_l = np.isfinite(lbf) & (lbf != ubf)
        fin_u = np.isfinite(ubf) & (lbf != ubf)
        lbf = np.where(fin_l, lbf - relax * np.maximum(1., np.abs(lbf)), lbf)
        ubf = np.where(fin_u, ubf + relax * np.maximum(1., np.abs(ubf)), ubf)
        base_P = anchor_trial.solution.P
        final_costs = homotopy_mod.final_cost_values(ocp)

        # per-scenario P: overrides mapped onto theta0 leaves
        p_list = []
        for overrides in self.param_options:
            P_i = {
                'cost': {k: jnp.asarray(final_costs[k]) for k in final_costs},
                'ref': base_P['ref'],
                'weights': base_P['weights'],
                'theta0': _override_theta0(base_P['theta0'], overrides),
            }
            p_list.append(P_i)
        P_batch = batch_mod.stack_p(p_list)

        # every scenario starts from the anchor's converged state
        st = anchor_trial.solution.final_state
        n_cases = len(self.param_options)
        state = {k: jnp.stack([jnp.asarray(st[k])] * n_cases)
                 for k in ('w', 's', 'y', 'lam', 'zl', 'zu')}
        state['mu'] = jnp.full((n_cases,), 1e-5)
        state['err'] = jnp.full((n_cases,), jnp.inf)

        # convergence-gated continuation: each scenario iterates until its
        # KKT error clears tol (n_iter is only the cap), replacing the
        # fixed-iteration budget that under-converged perturbed scenarios
        solver = batch_mod.make_batched_solver(
            ocp, lbf, ubf, n_iter=n_iter, mesh=mesh, batch_p=True, tol=tol)
        out = solver(state, P_batch)
        W = np.asarray(out['w'])

        # per-scenario outputs + convergence check against the final-step KKT
        for idx, overrides in enumerate(self.param_options):
            V = W[idx]
            T = float(ocp.time_period_fn(V))
            P_i = jax.tree_util.tree_map(lambda x, i=idx: x[i], P_batch)
            e_end = float(ocp.e_final_si_fn(V, P_i))
            eq_res = float(np.max(np.abs(np.asarray(ocp.eq_fn(V, P_i)))))
            label = '_'.join(str(v) for v in overrides.values())
            self.sweep_dict[label] = {
                'success': bool(np.isfinite(W[idx]).all() and eq_res < 1e-4),
                'global_outputs': {'time_period': T,
                                   'e_final_joules': e_end,
                                   'avg_power_watts': e_end / T},
                'eq_residual': eq_res,
                'V_opt': V,
            }
        return self

    # ------------------------------------------------------------------
    def plot_comparison(self, save_prefix=None):
        """Sweep comparison plots (viz/comparison.py analog): power curve and
        per-case trajectory overlay (when interpolants were stored)."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        labels, powers = self.power_curve()
        fig, axes = plt.subplots(1, 2, figsize=(12, 5))
        axes[0].plot(range(len(labels)), np.asarray(powers) / 1e3, 'o-')
        axes[0].set_xticks(range(len(labels)))
        axes[0].set_xticklabels(labels, rotation=30, fontsize=7)
        axes[0].set_ylabel('avg power [kW]')
        axes[0].grid(True)

        for label, pd in self.plot_dict.items():
            if pd is None:
                continue
            q = next((v for k, v in pd['x'].items() if k.startswith('q')), None)
            if q is not None:
                axes[1].plot(q[1], q[2], label=label)
        axes[1].set_xlabel('y [m]')
        axes[1].set_ylabel('z [m]')
        axes[1].grid(True)
        axes[1].legend(fontsize=7)
        fig.suptitle(f'sweep comparison: {self.name}')
        if save_prefix:
            fig.savefig(f'{save_prefix}_comparison.png', dpi=100)
        return fig

    # ------------------------------------------------------------------
    def power_curve(self):
        """(labels, avg_power_watts) across the sweep."""
        labels = list(self.sweep_dict.keys())
        powers = [self.sweep_dict[l]['global_outputs']['avg_power_watts']
                  for l in labels]
        return labels, powers


def _override_theta0(theta0, overrides):
    """Map dotted option overrides onto theta0 leaves (the batchable subset:
    user_options.wind.u_ref and params.* paths that exist in theta0)."""
    import copy as _copy

    import jax

    out = _copy.deepcopy(jax.tree_util.tree_map(np.asarray, theta0))
    for key, val in overrides.items():
        parts = key.split('.')
        if key == 'user_options.wind.u_ref':
            out['wind']['u_ref'] = np.asarray(float(val))
            continue
        if parts[0] == 'params' and len(parts) >= 3:
            node = out
            ok = True
            for p in parts[1:-1]:
                if p in node:
                    node = node[p]
                else:
                    ok = False
                    break
            if ok and parts[-1] in node:
                node[parts[-1]] = np.asarray(float(val))
                continue
        raise ValueError(
            f'override {key!r} does not map onto a theta0 leaf; '
            'use the serial Sweep.run path for structural options')
    return out
