#!/usr/bin/env python
"""Generate the committed bench anchor: a fully homotopy-solved benchmark
configuration (Ampyx AP2 3-DOF, n_k=8, d=3, simple phase fix) whose converged
primal-dual state seeds the batched wind-sweep throughput benchmark
(bench.py). Runs the robust host-driven solver on CPU f64; the artifact is
committed so the TPU benchmark never pays the serial solve.
"""
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ.setdefault('JAX_ENABLE_X64', 'true')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache')
jax.config.update('jax_compilation_cache_dir', cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from awebox_tpu.api.trial import Trial
from awebox_tpu.options.options import Options
from awebox_tpu.options.kite_data import ampyx_ap2_settings

N_K = int(os.environ.get('BENCH_NK', '4'))
D = int(os.environ.get('BENCH_D', '3'))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'tests', 'artifacts', f'bench_anchor_nk{N_K}_d{D}.npz')


def bench_options(n_k=None, d=None):
    options = Options()
    ampyx_ap2_settings.set_ampyx_ap2_settings(options)
    options['user_options.system_model.architecture'] = {1: 0}
    options['user_options.system_model.kite_dof'] = 3
    options['user_options.trajectory.type'] = 'power_cycle'
    options['user_options.wind.model'] = 'power'
    options['user_options.wind.u_ref'] = 10.
    options['params.wind.z_ref'] = 100.0
    options['user_options.trajectory.lift_mode.phase_fix'] = 'simple'
    options['nlp.n_k'] = n_k if n_k is not None else N_K
    options['nlp.collocation.d'] = d if d is not None else D
    return options


def main():
    trial = Trial(bench_options(), 'bench_anchor').build()
    trial.optimize(verbose=True)
    assert trial.solve_succeeded, trial.solution.step_results
    st = trial.solution.final_state
    go = trial.global_outputs()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        w=np.asarray(st['w']), s=np.asarray(st['s']), y=np.asarray(st['y']),
        lam=np.asarray(st['lam']), zl=np.asarray(st['zl']),
        zu=np.asarray(st['zu']),
        V_init=np.asarray(trial.V_init),
        avg_power_watts=go['avg_power_watts'],
        time_period=go['time_period'],
        kkt_error=trial.solution.step_results['final_0']['kkt_error'],
    )
    print(f'anchor saved to {OUT}: P_avg={go["avg_power_watts"]:.1f} W, '
          f'T={go["time_period"]:.2f} s')


if __name__ == '__main__':
    main()
