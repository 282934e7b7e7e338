#!/usr/bin/env python
"""Flagship single-OCP wall-time artifact (VERDICT r3 item 10).

Solves the reference-grade Ampyx AP2 6-DOF pumping cycle on the grid of
/root/reference/examples/ampyx_ap2_trajectory.py (n_k=40, d=4) and commits
the headline numbers the reference community asks first: total wall time,
per-step wall/iterations, power, period, and the stored controls for the
1e-3 drift guard.

Strategy: coarse-to-fine continuation. The full homotopy runs on the proven
n_k=20 d=3 grid (the committed parity grid); the n_k=40 d=4 solve is then
warmstarted from the coarse solution through the dimension-remapping
interpolation (api/warmstart.py — the reference's setup_warmstart_data role,
tools/struct_operations.py:992). This mirrors reference practice: the
Energies-2023 paper cases warmstart fine grids from coarse ones rather than
cold-starting n_k=100 problems.

Writes tests/artifacts/flagship_nk40_d4_timing.json. Run on CPU (f64):
    JAX_PLATFORMS=cpu python benchmarks/flagship_walltime.py [n_k] [d]
"""
import json
import os
import sys
import time

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ.setdefault('JAX_ENABLE_X64', 'true')

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, 'examples'))

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', os.path.join(ROOT, '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np  # noqa: E402

OUT = os.path.join(ROOT, 'tests', 'artifacts', 'flagship_nk40_d4_timing.json')


def step_summary(trial):
    t_wall = trial.solution.stats.get('t_wall', {})
    steps = {}
    for key, rec in trial.solution.step_results.items():
        steps[key] = {'iterations': int(rec.get('iterations', -1)),
                      'kkt_error': float(rec.get('kkt_error', float('nan'))),
                      'wall_s': round(float(t_wall.get(key, -1.)), 2)}
    return steps


def main():
    n_k = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from ampyx_ap2_trajectory import make_options
    from awebox_tpu.api.trial import Trial

    t0 = time.time()
    coarse_ckpt = os.path.join(ROOT, 'tests', 'artifacts',
                               'flagship_coarse_nk20_d3.pkl')
    coarse = Trial(make_options(n_k=20, d=3, kite_dof=6), 'flagship_coarse')
    coarse.build()
    if os.path.exists(coarse_ckpt):
        # resume: reuse a previously solved coarse stage (Trial warmstart
        # file semantics resume the homotopy at its recorded final step)
        coarse.optimize(verbose=True, warmstart=coarse_ckpt)
    else:
        coarse.optimize(verbose=True)
    coarse_wall = time.time() - t0
    assert coarse.solve_succeeded, coarse.solution.step_results
    coarse.save(coarse_ckpt)
    # checkpoint the coarse timing immediately: a budget-killed fine stage
    # must not lose the coarse evidence
    go_c = coarse.global_outputs()
    coarse_payload = {
        'n_k': 20, 'd': 3, 'kite_dof': 6,
        'avg_power_kw': float(go_c['avg_power_watts'] / 1e3),
        'winding_period_s': float(go_c['time_period']),
        'coarse_wall_s': round(coarse_wall, 1),
        'platform': jax.devices()[0].platform,
        'coarse_steps': step_summary(coarse),
    }
    with open(os.path.join(ROOT, 'tests', 'artifacts',
                           'flagship_coarse_nk20_d3_timing.json'), 'w') as fh:
        json.dump(coarse_payload, fh, indent=1)
    print(f'# coarse n_k=20 d=3 done in {coarse_wall:.0f}s '
          f'({go_c["avg_power_watts"]/1e3:.2f} kW)', flush=True)

    t1 = time.time()
    trial = Trial(make_options(n_k=n_k, d=d, kite_dof=6), 'flagship')
    trial.build()
    trial.optimize(verbose=True, warmstart=coarse)
    fine_wall = time.time() - t1
    wall = time.time() - t0
    assert trial.solve_succeeded, trial.solution.step_results

    go = trial.global_outputs()
    u = np.asarray(trial.ocp.vstruct.get_u_all(trial.solution.V_opt))
    payload = {
        'n_k': n_k, 'd': d, 'kite_dof': 6,
        'n_vars': int(trial.ocp.vstruct.total),
        'avg_power_kw': float(go['avg_power_watts'] / 1e3),
        'winding_period_s': float(go['time_period']),
        'total_wall_s': round(wall, 1),
        'coarse_wall_s': round(coarse_wall, 1),
        'fine_wall_s': round(fine_wall, 1),
        'platform': jax.devices()[0].platform,
        'coarse_steps': step_summary(coarse),
        'homotopy_steps': step_summary(trial),
        'controls_norm': float(np.linalg.norm(u)),
        'controls': u.tolist(),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, 'w') as fh:
        json.dump(payload, fh, indent=1)
    print(f'flagship artifact saved to {OUT}: '
          f'{payload["avg_power_kw"]:.2f} kW / '
          f'{payload["winding_period_s"]:.1f} s in {wall:.0f} s wall '
          f'(coarse {coarse_wall:.0f}s + fine {fine_wall:.0f}s)')


if __name__ == '__main__':
    main()
