"""Trial: one OCP from options to optimized solution.

Counterpart of /root/reference/awebox/trial.py:50-513: build chains
architecture -> options.build -> model -> transcription -> bounds; optimize
runs the homotopy; post-processing exposes the interpolated SI solution,
global performance numbers (avg power, time period) and the quality checks.
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

from ..arch import Architecture
from ..model.builder import make_model
from ..ocp.bounds import build_v_bounds
from ..ocp.transcription import build_ocp
from ..opti import homotopy as homotopy_mod
from ..opti.initialization import build_initial_guess, build_reference
from ..options.options import Options


class Trial:
    def __init__(self, options_seed, name: str = 'trial'):
        if isinstance(options_seed, Options):
            self.options_raw = options_seed
        elif isinstance(options_seed, dict):
            self.options_raw = Options(options_seed)
        else:
            raise TypeError('options seed must be an Options or a dict')
        self.name = name
        self.timings: Dict[str, float] = {}
        self.solution: Optional[homotopy_mod.HomotopySolution] = None
        self._solver_cache: dict = {}

    # ------------------------------------------------------------------
    def build(self):
        t0 = time.time()
        arch_seed = self.options_raw['user_options.system_model.architecture']
        self.arch = Architecture(dict(arch_seed))
        self.options = self.options_raw.build(self.arch)
        self.model = make_model(self.options, self.arch)
        self.ocp = build_ocp(self.model, self.options)
        self.lb_nominal, self.ub_nominal = build_v_bounds(self.ocp)
        self.timings['build'] = time.time() - t0
        return self

    # ------------------------------------------------------------------
    def optimize(self, final_homotopy_step: str = 'final', verbose: bool = True,
                 warmstart=None):
        t0 = time.time()
        V_init = build_initial_guess(self.ocp)
        V_ref = build_reference(self.ocp, V_init)
        self.V_init = V_init
        self.V_ref = V_ref
        if warmstart is not None:
            V_init = np.asarray(warmstart)
        self.solution = homotopy_mod.solve_homotopy(
            self.ocp, V_init, V_ref, self.lb_nominal, self.ub_nominal,
            final_homotopy_step=final_homotopy_step,
            solver_cache=self._solver_cache, verbose=verbose)
        self.timings['optimize'] = time.time() - t0
        return self

    # ------------------------------------------------------------------
    @property
    def solve_succeeded(self) -> bool:
        return self.solution is not None and self.solution.success

    def global_outputs(self) -> Dict[str, float]:
        """time period, final energy, average power (ocp_outputs.py:42-115)."""
        V = self.solution.V_opt
        vs = self.ocp.vstruct
        layout = self.model.layout
        T = float(self.ocp.time_period_fn(V))
        e_sl = layout.slices['x']['e']
        e_scale = self.model.scaling['x'][e_sl][0]
        e_end = float(vs.get_x_all(V)[self.ocp.n_k][e_sl][0]) * e_scale
        return {'time_period': T,
                'e_final_joules': e_end,
                'avg_power_watts': e_end / T}

    def theta_opt(self) -> Dict[str, np.ndarray]:
        V = self.solution.V_opt
        vs = self.ocp.vstruct
        layout = self.model.layout
        out = {}
        for name in vs.theta_names:
            scale = self.model.scaling['theta'][layout.slices['theta'][name]]
            val = np.asarray(V[vs.theta_slice(name)])
            if name == 't_f' and val.shape[0] == 2:
                out[name] = val * scale[0]
            else:
                out[name] = val * scale
        return out

    def x_traj_si(self, name: str) -> np.ndarray:
        """(n_k+1, dim) SI trajectory of state `name` at shooting nodes."""
        V = self.solution.V_opt
        vs = self.ocp.vstruct
        sl = self.model.layout.slices['x'][name]
        scale = self.model.scaling['x'][sl]
        return np.asarray(vs.get_x_all(V)[:, sl]) * scale

    def outputs_on_coll(self):
        return self.ocp.outputs_on_coll_fn(self.solution.V_opt, self.solution.P)

    def outputs_on_shooting(self):
        """Outputs at shooting nodes — where path inequalities bind under zoh."""
        return self.ocp.outputs_on_shooting_fn(self.solution.V_opt, self.solution.P)

    # ------------------------------------------------------------------
    def interpolate(self, n_points: int = 100):
        from . import postprocessing
        return postprocessing.interpolate_solution(self, n_points)

    def plot(self, flags, n_points: int = 100, save_prefix=None):
        from . import postprocessing
        from ..viz import visualization
        plot_dict = postprocessing.interpolate_solution(self, n_points)
        return visualization.plot(plot_dict, self.arch, flags,
                                  save_prefix=save_prefix)

    def write_to_csv(self, filename, n_points: int = 100):
        from . import postprocessing
        return postprocessing.write_csv(self, filename, n_points)

    def check_quality(self, raise_exception=None):
        from . import quality
        return quality.check_quality(self, raise_exception)

    # ------------------------------------------------------------------
    def save(self, filename):
        """Pickle the reloadable solution seed (trial.py:284-322 analog)."""
        import pickle
        payload = {
            'name': self.name,
            'options_dict': None,  # raw options are not always picklable
            'V_opt': np.asarray(self.solution.V_opt),
            'V_init': np.asarray(self.V_init),
            'stats': self.solution.stats,
            'success': self.solution.success,
            'global_outputs': self.global_outputs(),
            'theta_opt': self.theta_opt(),
        }
        with open(filename, 'wb') as fh:
            pickle.dump(payload, fh)
        return filename
