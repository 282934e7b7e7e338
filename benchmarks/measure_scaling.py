#!/usr/bin/env python
"""Scaling evidence for BASELINE.md: solves/s at 1 device vs the full mesh,
plus a single-chip batch-size sweep when a TPU is reachable.

Writes benchmarks/scaling_r05.json:
  {"virtual_cpu": {"devices", "wall_1", "wall_n", "speedup"},
   "batch_sweep": [{"B", "per_iter_ms", "lane_iters_per_s"}, ...],
   "platform": ...}

Run modes:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/measure_scaling.py          # virtual-device curve
  python benchmarks/measure_scaling.py              # adds TPU batch sweep

The virtual-CPU curve validates the sharding path end-to-end (the mesh is
real, the collectives are real, only the silicon is shared); the TPU batch
sweep measures how scenario throughput amortizes per-iteration latency on
one real chip. Multi-chip ICI hardware is not reachable in this environment
— the mesh code is identical, only device count changes
(parallel/fleet.py, SURVEY section 5.8).
"""
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
OUT = os.path.join(HERE, 'scaling_r05.json')


def virtual_cpu_curve():
    import jax
    import jax.numpy as jnp

    from awebox_tpu.api.trial import Trial
    from awebox_tpu.opti.homotopy import (build_p_fix, define_schedule,
                                          set_initial_bounds)
    from awebox_tpu.opti.initialization import (build_initial_guess,
                                                build_reference)
    from awebox_tpu.parallel import fleet
    from awebox_tpu.parallel.batch import init_batched_state, stack_p
    from awebox_tpu.options.options import Options
    from awebox_tpu.options.kite_data import ampyx_ap2_settings

    options = Options()
    ampyx_ap2_settings.set_ampyx_ap2_settings(options)
    options['user_options.system_model.architecture'] = {1: 0}
    options['user_options.system_model.kite_dof'] = 3
    options['user_options.trajectory.type'] = 'power_cycle'
    options['user_options.wind.model'] = 'power'
    options['user_options.wind.u_ref'] = 10.
    options['params.wind.z_ref'] = 100.0
    options['user_options.trajectory.lift_mode.phase_fix'] = 'simple'
    options['nlp.n_k'] = 3
    options['nlp.collocation.d'] = 2

    trial = Trial(options, 'scaling').build()
    ocp = trial.ocp
    V0 = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V0))
    schedule = define_schedule(ocp)
    lb, ub = set_initial_bounds(ocp, trial.lb_nominal, trial.ub_nominal, V0,
                                schedule)
    n_dev = len(jax.devices())
    B = max(n_dev, 8)
    rng = np.random.default_rng(7)
    batch = [V0 + 1e-4 * rng.normal(size=V0.shape) for _ in range(B)]
    state = init_batched_state(ocp, batch, P, lb, ub)
    P_batch = stack_p([P] * B)
    return fleet.measure_scaling(ocp, lb, ub, state, P_batch, n_iter=30)


def tpu_batch_sweep():
    """Per-iteration wall of the bench step at several batch sizes on the one
    real chip: lane-iterations/s shows how batching amortizes latency (the
    single-chip axis of the BASELINE scaling ask)."""
    import subprocess
    rows = []
    for B in (32, 64, 128):
        env = dict(os.environ, BENCH_B=str(B), BENCH_DEADLINE_S='560')
        t0 = time.time()
        out = subprocess.run([sys.executable, os.path.join(ROOT, 'bench.py')],
                             env=env, capture_output=True, text=True,
                             timeout=600)
        line = [l for l in out.stdout.splitlines() if l.startswith('{')]
        if not line:
            rows.append({'B': B, 'error': 'no output'})
            continue
        rec = json.loads(line[-1])
        wl = rec.get('workload', {})
        per_iter_ms = wl.get('ms_per_iter')
        row = {'B': B, 'solves_per_s': rec.get('value'),
               'n_converged': wl.get('n_converged'),
               'n_iters': wl.get('n_iters'),
               'unit': rec.get('unit', ''),
               'wall_s': round(time.time() - t0, 1)}
        if per_iter_ms:
            row['per_iter_ms'] = per_iter_ms
            row['lane_iters_per_s'] = round(B / (per_iter_ms / 1e3), 1)
        rows.append(row)
    return rows


def main():
    import jax
    # the axon site hook overrides JAX_PLATFORMS at import; honor an
    # explicit CPU request (virtual-device curve) by forcing it back —
    # otherwise the "cpu" run silently lands on the TPU branch
    if os.environ.get('JAX_PLATFORMS', '') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    platform = jax.devices()[0].platform
    report = {'platform_' + platform: True}
    if platform == 'cpu':
        report['virtual_cpu'] = virtual_cpu_curve()
    else:
        report['batch_sweep'] = tpu_batch_sweep()
    existing = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as fh:
                existing = json.load(fh)
        except Exception:
            existing = {}
    existing.update(report)
    with open(OUT, 'w') as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps(existing))


if __name__ == '__main__':
    main()
