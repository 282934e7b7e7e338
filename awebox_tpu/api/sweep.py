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
    def power_curve(self):
        """(labels, avg_power_watts) across the sweep."""
        labels = list(self.sweep_dict.keys())
        powers = [self.sweep_dict[l]['global_outputs']['avg_power_watts']
                  for l in labels]
        return labels, powers
