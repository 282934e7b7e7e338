#!/usr/bin/env python
"""Benchmark: batched scenario interior-point throughput on one chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The north-star target (BASELINE.md) is >= 1000 batched scenario solves/s on a
v5p host. A converged homotopy solve costs on the order of 150 IP iterations,
so the equivalent iteration-throughput target is ~150k iter/s; vs_baseline
reports measured batched iterations/s against that.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax

    # prefer f64 for the solver core; fall back transparently if the backend
    # rejects it
    try:
        jax.config.update('jax_enable_x64', True)
        _ = (jax.numpy.zeros(1, dtype='float64') + 1.).block_until_ready()
        dtype = 'float64'
    except Exception:
        jax.config.update('jax_enable_x64', False)
        dtype = 'float32'

    try:
        cpu = jax.devices('cpu')[0]
    except Exception:
        cpu = jax.devices()[0]
    accel = jax.devices()[0]

    sys.path.insert(0, '.')
    from awebox_tpu.api.trial import Trial
    from awebox_tpu.options.options import Options
    from awebox_tpu.options.kite_data import ampyx_ap2_settings
    from awebox_tpu.opti.homotopy import build_p_fix, define_schedule, set_initial_bounds
    from awebox_tpu.opti.initialization import build_initial_guess, build_reference
    from awebox_tpu.parallel.batch import init_batched_state, make_batched_solver

    options = Options()
    ampyx_ap2_settings.set_ampyx_ap2_settings(options)
    options['user_options.system_model.architecture'] = {1: 0}
    options['user_options.system_model.kite_dof'] = 3
    options['user_options.trajectory.type'] = 'power_cycle'
    options['user_options.wind.model'] = 'power'
    options['user_options.wind.u_ref'] = 10.
    options['params.wind.z_ref'] = 100.0
    options['user_options.trajectory.lift_mode.phase_fix'] = 'simple'
    options['nlp.n_k'] = 8
    options['nlp.collocation.d'] = 3

    # construction (structural scans, initial guesses) runs on host CPU; the
    # benchmark computation itself runs on the accelerator
    with jax.default_device(cpu):
        trial = Trial(options, 'bench').build()
        ocp = trial.ocp
        V0 = build_initial_guess(ocp)
        P = build_p_fix(ocp, build_reference(ocp, V0))
        schedule = define_schedule(ocp)
        lb, ub = set_initial_bounds(ocp, trial.lb_nominal, trial.ub_nominal, V0, schedule)

        B = 16
        n_iter = 10
        rng = np.random.default_rng(0)
        batch = [V0 + 1e-3 * rng.normal(size=V0.shape) for _ in range(B)]
        state = init_batched_state(ocp, batch, P, lb, ub)

    state = jax.device_put(state, accel)
    P = jax.device_put(P, accel)
    solve = make_batched_solver(ocp, lb, ub, n_iter=n_iter)

    # compile + warm up
    print('# compiling...', file=sys.stderr, flush=True)
    t_c = time.time()
    out = solve(state, P)
    jax.block_until_ready(out)
    print(f'# compile {time.time() - t_c:.1f}s', file=sys.stderr, flush=True)

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = solve(out, P)
    jax.block_until_ready(out)
    elapsed = time.time() - t0

    iters_per_s = B * n_iter * reps / elapsed
    target = 150_000.0
    print(json.dumps({
        'metric': 'batched_scenario_ip_iter_per_s',
        'value': round(float(iters_per_s), 2),
        'unit': f'iter/s (B={B}, ampyx 3dof n_k=8, {dtype})',
        'vs_baseline': round(float(iters_per_s) / target, 5),
    }))


if __name__ == '__main__':
    main()
