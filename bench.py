#!/usr/bin/env python
"""Benchmark: batched scenario interior-point throughput on one chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The north-star target (BASELINE.md) is >= 1000 batched scenario solves/s on a
v5p host. A converged homotopy solve costs on the order of 150 IP iterations,
so the equivalent iteration-throughput target is ~150k iter/s; vs_baseline
reports measured batched iterations/s against that.

Robustness contract: a JSON line is printed even if compilation exceeds the
driver budget (SIGALRM fallback) — the fallback carries value 0 so a timeout
is recorded as a measurement, not an rc=124.
"""
import json
import os
import signal
import sys
import time

import numpy as np

DEADLINE_S = int(os.environ.get('BENCH_DEADLINE_S', '1500'))
_progress = {'stage': 'startup'}


def _emit(payload):
    print(json.dumps(payload), flush=True)


def _fallback(signum, frame):
    _emit({
        'metric': 'batched_scenario_ip_iter_per_s',
        'value': 0.0,
        'unit': f"iter/s (deadline {DEADLINE_S}s hit at stage: {_progress['stage']})",
        'vs_baseline': 0.0,
    })
    os._exit(0)


def main():
    signal.signal(signal.SIGALRM, _fallback)
    signal.alarm(DEADLINE_S)

    import jax

    # Persistent compilation cache: the model's Lagrangian autodiff chains are
    # expensive to compile (3rd/4th-order AD); repeat runs on this host reuse
    # the compiled executables.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    # The fixed-iteration batched path is the TPU throughput path: f32 feeds
    # the MXU natively (f64 on TPU is software-emulated and not viable for
    # production throughput; the robust host-driven solver runs f64 on CPU).
    accel = jax.devices()[0]
    on_tpu = accel.platform != 'cpu'
    if not on_tpu:
        jax.config.update('jax_enable_x64', True)
    dtype = 'float32' if on_tpu else 'float64'

    try:
        cpu = jax.devices('cpu')[0]
    except Exception:
        cpu = accel

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
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
    _progress['stage'] = 'trial build'
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
        _progress['stage'] = 'batched state init'
        state = init_batched_state(ocp, batch, P, lb, ub)

    def to_accel(x):
        return jax.device_put(x, accel)

    state = jax.tree_util.tree_map(to_accel, state)
    P = jax.tree_util.tree_map(to_accel, P)
    solve = make_batched_solver(ocp, lb, ub, n_iter=n_iter)

    # compile + warm up
    _progress['stage'] = 'XLA compile of batched solver'
    print('# compiling...', file=sys.stderr, flush=True)
    t_c = time.time()
    out = solve(state, P)
    jax.block_until_ready(out)
    compile_s = time.time() - t_c
    print(f'# compile {compile_s:.1f}s', file=sys.stderr, flush=True)

    _progress['stage'] = 'timed iterations'
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = solve(out, P)
    jax.block_until_ready(out)
    elapsed = time.time() - t0

    finite = bool(np.isfinite(np.asarray(out['w'])).all())
    iters_per_s = B * n_iter * reps / elapsed if finite else 0.0
    target = 150_000.0
    signal.alarm(0)
    _emit({
        'metric': 'batched_scenario_ip_iter_per_s',
        'value': round(float(iters_per_s), 2),
        'unit': f'iter/s (B={B}, ampyx 3dof n_k=8, {dtype}, '
                f'compile {compile_s:.0f}s, finite={finite})',
        'vs_baseline': round(float(iters_per_s) / target, 5),
    })


if __name__ == '__main__':
    main()
