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
from ..utils.logging import awelogger


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
    @staticmethod
    def _peak_rss_mb():
        """Peak resident set size [MB] (reference optimization.py:90-92
        resource.getrusage tracking)."""
        try:
            import resource
            return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.
        except Exception:
            return float('nan')

    def build(self):
        """Per-stage build timings mirror the reference's timings dicts
        (mdl/model.py:56-68, ocp/nlp.py:95)."""
        t0 = time.time()
        arch_seed = self.options_raw['user_options.system_model.architecture']
        self.arch = Architecture(dict(arch_seed))
        self.options = self.options_raw.build(self.arch)
        self.timings['build_options'] = time.time() - t0
        t1 = time.time()
        self.model = make_model(self.options, self.arch)
        self.timings['build_model'] = time.time() - t1
        t1 = time.time()
        self.ocp = build_ocp(self.model, self.options)
        self.lb_nominal, self.ub_nominal = build_v_bounds(self.ocp)
        self.timings['build_nlp'] = time.time() - t1
        self.timings['build'] = time.time() - t0
        self.timings['peak_rss_mb'] = self._peak_rss_mb()
        return self

    # ------------------------------------------------------------------
    def optimize(self, final_homotopy_step: str = 'final', verbose: bool = True,
                 warmstart=None, warmstart_schedule: str = 'auto'):
        """warmstart_schedule (reference optimization.py
        modify_schedule_for_warmstart): 'resume' starts the homotopy after
        the step the warmstart source recorded as completed (a fully solved
        source gets one final refinement solve); 'full' re-walks the whole
        schedule with V_ref re-aimed at the warm point. 'auto' resumes for
        saved-payload warmstarts that recorded their final step and re-walks
        for everything else (Trial chaining keeps sweep semantics)."""
        t0 = time.time()
        V_init = build_initial_guess(self.ocp)
        V_ref = build_reference(self.ocp, V_init)
        self.V_init = V_init
        self.V_ref = V_ref
        skip_through = None
        if warmstart is not None:
            if isinstance(warmstart, str):
                # warmstart from a saved solution file, remapping the stored
                # grid onto this trial's (n_k, d) discretization
                # (struct_operations.py:992; optimization.py:463-512)
                import pickle
                from . import warmstart as ws
                with open(warmstart, 'rb') as fh:
                    payload = pickle.load(fh)
                V_init = ws.remap_to_v(payload['remap'], self.ocp)
                if warmstart_schedule in ('auto', 'resume'):
                    skip_through = payload.get('final_homotopy_step')
            elif isinstance(warmstart, Trial):
                from . import warmstart as ws
                V_init = ws.remap_to_v(ws.solution_payload(warmstart), self.ocp)
                if warmstart_schedule == 'resume':
                    skip_through = getattr(warmstart,
                                           '_final_homotopy_step', None)
            else:
                V_init = np.asarray(warmstart)
            # the tracking reference follows the warmstart (sweep warmstart
            # semantics, reference sweep_funcs.py/optimization.py:463-512):
            # early homotopy steps then pull toward the warm solution, not
            # back to the cold circular guess
            V_ref = build_reference(self.ocp, V_init)
            self.V_init = V_init
            self.V_ref = V_ref
        self._final_homotopy_step = final_homotopy_step
        self.solution = homotopy_mod.solve_homotopy(
            self.ocp, V_init, V_ref, self.lb_nominal, self.ub_nominal,
            final_homotopy_step=final_homotopy_step,
            solver_cache=self._solver_cache, verbose=verbose,
            skip_through=skip_through)
        self.timings['optimize'] = time.time() - t0
        self.timings['peak_rss_mb'] = self._peak_rss_mb()

        # post-solve KKT health gate (reference opti/optimization.py:372-374)
        hc_opts = self.options['solver']['health_check']
        if hc_opts['when'] in ('final', 'success'):
            report = self.health_check()
            if verbose:
                awelogger.info('[health]\n' + report.summary())
            if hc_opts['raise_exception'] and not report.healthy:
                raise RuntimeError('KKT health check failed:\n' + report.summary())
        return self

    def health_check(self, **kwargs):
        """KKT health analysis of the solved NLP: LICQ rank, reduced-Hessian
        SOSC, conditioning (tools/debug_operations.py:53-152 analog)."""
        from ..opti.diagnostics import trial_health_check
        thresh = self.options['solver']['health_check']['thresh']
        kwargs.setdefault('cond_threshold', thresh['condition_number'])
        kwargs.setdefault('sosc_tol', -thresh['reduced_hessian_eig'])
        return trial_health_check(self, **kwargs)

    # ------------------------------------------------------------------
    @property
    def solve_succeeded(self) -> bool:
        return self.solution is not None and self.solution.success

    def global_outputs(self) -> Dict[str, float]:
        """time period, final energy, average power (ocp_outputs.py:42-115);
        energy comes from the e state or, under integral_outputs=True, from
        the collocation quadrature of the power output."""
        V = self.solution.V_opt
        T = float(self.ocp.time_period_fn(V))
        e_end = float(self.ocp.e_final_si_fn(V, self.solution.P))
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

    def solution_table(self) -> str:
        """Post-solve summary table (reference trial.py:244-282): headline
        performance, optimized design parameters, per-step iterations/wall
        time, and the cost-component breakdown (trial.py:367-390)."""
        go = self.global_outputs()
        lines = [f'===== solution: {self.name} =====',
                 f'  average power      {go["avg_power_watts"] / 1e3:10.3f} kW',
                 f'  time period        {go["time_period"]:10.2f} s',
                 f'  final energy       {go["e_final_joules"] / 1e3:10.2f} kJ']
        for name, val in self.theta_opt().items():
            flat = np.ravel(val)
            txt = ', '.join(f'{v:.4g}' for v in flat)
            lines.append(f'  theta {name:12s} [{txt}]')
        stats = self.solution.stats
        total_it = sum(stats['iterations'].values())
        total_t = sum(stats['t_wall'].values())
        lines.append(f'  homotopy           {total_it} iterations, '
                     f'{total_t:.1f} s wall')
        for key in stats['iterations']:
            lines.append(f'    {key:22s} {stats["iterations"][key]:5d} it '
                         f'{stats["t_wall"][key]:8.1f} s')
        if self.ocp.cost_components_fn is not None:
            comp = self.ocp.cost_components_fn(self.solution.V_opt,
                                               self.solution.P)
            lines.append('  cost components:')
            for name in sorted(comp):
                val = float(np.asarray(comp[name]))
                if abs(val) > 1e-12 and not name.endswith('problem_cost'):
                    lines.append(f'    {name:28s} {val: .4e}')
        if 'peak_rss_mb' in self.timings:
            lines.append(f'  peak RSS           {self.timings["peak_rss_mb"]:.0f} MB')
        return '\n'.join(lines)

    def print_solution_table(self):
        awelogger.info(self.solution_table())

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
                                  save_prefix=save_prefix, trial=self)

    def write_to_csv(self, filename, n_points: int = 100):
        from . import postprocessing
        return postprocessing.write_csv(self, filename, n_points)

    def check_quality(self, raise_exception=None):
        from . import quality
        return quality.check_quality(self, raise_exception)

    # ------------------------------------------------------------------
    def save(self, filename):
        """Pickle the reloadable solution seed (trial.py:284-322 analog):
        the full options tree, the optimal V, the remap payload for
        dimension-changing warmstarts, and the final solver state."""
        import pickle
        from . import warmstart as ws
        st = self.solution.final_state or {}
        payload = {
            'name': self.name,
            'options_tree': self.options_raw.as_dict(),
            'V_opt': np.asarray(self.solution.V_opt),
            'V_init': np.asarray(self.V_init),
            'stats': self.solution.stats,
            'success': self.solution.success,
            'global_outputs': self.global_outputs(),
            'theta_opt': self.theta_opt(),
            'remap': ws.solution_payload(self),
            'duals': {k: np.asarray(st[k]) for k in st},
            # recorded so a reloaded warmstart can RESUME the homotopy at
            # the right step instead of re-walking relaxation steps
            # (reference optimization.py modify_schedule_for_warmstart)
            'final_homotopy_step': getattr(self, '_final_homotopy_step',
                                           'final'),
        }
        with open(filename, 'wb') as fh:
            pickle.dump(payload, fh)
        return filename

    @classmethod
    def load(cls, filename, name=None, rebuild=True):
        """Reload a pickled solution into a Trial (reference trial.py:62-92:
        seed = saved dict -> visualization-capable trial). With
        rebuild=True the model/OCP are reconstructed from the stored options
        tree, so plotting/CSV/quality all work on the reloaded solution."""
        import pickle
        with open(filename, 'rb') as fh:
            payload = pickle.load(fh)
        options = Options.from_tree(payload['options_tree'])
        trial = cls(options, name or payload.get('name', 'reloaded'))
        trial._loaded_payload = payload
        if rebuild:
            trial.build()
            trial.V_init = payload['V_init']
            trial.solution = homotopy_mod.HomotopySolution(
                V_opt=payload['V_opt'], P=None, stats=payload['stats'],
                success=payload['success'], step_results={},
                final_state=payload.get('duals'))
            # P is needed by outputs/cost evaluators; rebuild from V_init
            V_ref = build_reference(trial.ocp, np.asarray(payload['V_init']))
            trial.solution.P = homotopy_mod.build_p_fix(trial.ocp, V_ref)
        return trial
