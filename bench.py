#!/usr/bin/env python
"""Benchmark: batched converged wind-sweep solves/s on one chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The north-star target (BASELINE.md) is >= 1000 batched scenario solves/s on a
v5p host. The measured workload is the production sweep pattern
(SURVEY section 2.10.5): B wind scenarios (u_ref spread +-5%) continue from
a committed fully-homotopy-solved anchor (tests/artifacts/, produced by
benchmarks/make_bench_anchor.py on CPU f64) to their own converged optima at
final homotopy weights. A scenario counts as SOLVED when its in-jit KKT error
(primal + barrier-dual infeasibility, parallel/batch.py) clears TOL and its
dynamics residual verifies below VERIFY_TOL in a separate full-horizon check.
vs_baseline = converged solves/s / 1000.

Robustness contract: bench.py is a thin parent that runs the measurement in a
child process and ALWAYS prints exactly one JSON line — the child's if it
emits one before the deadline, otherwise a value-0 fallback carrying the
child's last reported stage. A SIGALRM in the measuring process cannot fire
while the interpreter is blocked inside a native XLA compile RPC
(judge-verified, round 3); a separate watchdog process always can act.

Compile strategy (the round-3 failure mode was a >10-minute XLA compile on
the shared axon compile service): the interior-point iteration is split into
TWO separately-jitted modules (derivatives / KKT-direction, parallel/batch.py
split=True) chained host-side, and the derivative module defaults to the
Gauss-Newton Hessian (structured.py) whose traced graph carries no
third-order AD through the Euler-Lagrange dynamics. Smaller modules compile
in minutes, land in the persistent cache independently, and a retried run
resumes from whatever already compiled.
"""
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
DEADLINE_S = int(os.environ.get('BENCH_DEADLINE_S', '450'))
# B=256 exceeds HBM on this 16G chip: the direction module's compile fails
# with "Ran out of memory in memory space hbm. Used 17.04G of 15.75G"
# (axon remote_compile HTTP 500; root-caused round 4 — this was round 3's
# mystery "kernel fault"). B=128 fits with ~50% headroom.
B = int(os.environ.get('BENCH_B', '128'))
N_ITER_CAP = int(os.environ.get('BENCH_N_ITER', '200'))
ANCHOR = os.path.join(HERE, 'tests', 'artifacts', 'bench_anchor_nk4_d3.npz')
PEAK_FLOPS = 197e12    # TPU v5e bf16 peak; f32 runs below this — MFU is a floor


def _emit(payload):
    print(json.dumps(payload), flush=True)


def _fallback(stage):
    _emit({
        'metric': 'batched_converged_solves_per_s',
        'value': 0.0,
        'unit': f'solves/s (deadline {DEADLINE_S}s hit at stage: {stage})',
        'vs_baseline': 0.0,
    })


# ---------------------------------------------------------------------------
# parent: watchdog process
# ---------------------------------------------------------------------------

def parent():
    import select

    fd, stage_path = tempfile.mkstemp(prefix='bench_stage_')
    os.close(fd)
    env = dict(os.environ, BENCH_INNER='1', BENCH_STAGE_FILE=stage_path)
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)], env=env,
        stdout=subprocess.PIPE, text=True, start_new_session=True)

    deadline = time.time() + DEADLINE_S
    json_line = None
    while time.time() < deadline:
        ready, _, _ = select.select([child.stdout], [], [], 1.0)
        if ready:
            line = child.stdout.readline()
            if not line:          # EOF: child exited without a JSON line
                break
            if line.lstrip().startswith('{'):
                json_line = line.strip()
                break
            sys.stderr.write(line)
            sys.stderr.flush()

    if json_line is None:
        try:
            with open(stage_path) as fh:
                stage = fh.read().strip() or 'startup'
        except OSError:
            stage = 'startup'
        _fallback(stage)
    else:
        print(json_line, flush=True)

    try:
        os.killpg(child.pid, signal.SIGKILL)   # exactly the child we started
    except (ProcessLookupError, PermissionError):
        pass
    try:
        os.unlink(stage_path)
    except OSError:
        pass


# ---------------------------------------------------------------------------
# child: the measurement
# ---------------------------------------------------------------------------

def _stage(name):
    path = os.environ.get('BENCH_STAGE_FILE')
    if path:
        try:
            with open(path, 'w') as fh:
                fh.write(name)
        except OSError:
            pass
    print(f'# stage: {name}', file=sys.stderr, flush=True)


def inner():
    _stage('startup')
    import numpy as np
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(HERE, '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    # the axon site hook overrides JAX_PLATFORMS at import; honor an explicit
    # CPU request (local validation runs) by forcing it back
    if os.environ.get('JAX_PLATFORMS', '') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    # The solve runs in f64 on every backend (emulated on TPU): the condensed
    # KKT matrix carries cond ~ 1e13 (delta_ce=1e-8 equality condensation x
    # near-dependent trivial-dynamics/continuity/periodicity row chains,
    # sigma_min(A_eq) ~ 3.5e-4 measured on the anchor) — beyond f32
    # Cholesky's ~1e7 reach. The all-f32 path spins the regularization ladder
    # with ok=False every iteration and can never converge (round-4
    # root-cause; this also masked as round 3's "kernel fault" at B=256,
    # which was an HBM OOM at compile). f64-emulated matmuls still ride the
    # MXU; convergence semantics match the green CPU sweep test exactly.
    accel = jax.devices()[0]
    on_tpu = accel.platform != 'cpu'
    jax.config.update('jax_enable_x64', True)
    # mixed precision: derivative modules trace under a scoped x64-off
    # context (pure f32 — the f64-emulation penalty on this backend is
    # ~100-200x for elementwise-heavy graphs); only the direction module's
    # condensed assembly + factorization run in f64 (solve_dtype below).
    # Prototype-validated: f32 derivatives + f64 solve converge to
    # eq ~ 4e-8; tol reflects the f32-residual noise floor.
    dtype = 'f32 derivs + f64 KKT'
    tol = float(os.environ.get('BENCH_TOL', '1e-5'))
    verify_tol = 1e-4
    kkt = os.environ.get('BENCH_KKT', 'dense')
    # exact Lagrangian Hessian: gauss_newton compiles ~3x smaller but
    # oscillates on this workload (constraint curvature IS the physics here)
    hess = os.environ.get('BENCH_HESS', 'exact')

    try:
        cpu = jax.devices('cpu')[0]
    except Exception:
        cpu = accel

    sys.path.insert(0, HERE)
    from awebox_tpu.api.trial import Trial
    from awebox_tpu.opti.homotopy import (build_p_fix, final_bounds,
                                          final_cost_values)
    from awebox_tpu.opti.initialization import build_initial_guess, build_reference
    from awebox_tpu.opti.ipsolver import InteriorPointSolver
    from awebox_tpu.parallel.batch import make_ip_step, stack_p

    _stage('trial build')
    sys.path.insert(0, os.path.join(HERE, 'benchmarks'))
    from make_bench_anchor import bench_options

    with jax.default_device(cpu):
        trial = Trial(bench_options(), 'bench').build()
        ocp = trial.ocp

        if not os.path.exists(ANCHOR):
            _emit({'metric': 'batched_converged_solves_per_s', 'value': 0.0,
                   'unit': 'solves/s (missing committed anchor artifact '
                           'tests/artifacts/bench_anchor_nk4_d3.npz; run '
                           'benchmarks/make_bench_anchor.py)',
                   'vs_baseline': 0.0})
            return
        anchor = np.load(ANCHOR)

        V0 = build_initial_guess(ocp)
        base_P = build_p_fix(ocp, build_reference(ocp, V0))
        lbf, ubf = final_bounds(ocp, trial.lb_nominal, trial.ub_nominal,
                                np.asarray(V0))
        # refine under the same bound relaxation the host solver used at the
        # anchor (active-set iterates sit ON the relaxed bounds)
        relax = 1e-8
        fin_l = np.isfinite(lbf) & (lbf != ubf)
        fin_u = np.isfinite(ubf) & (lbf != ubf)
        lbf = np.where(fin_l, lbf - relax * np.maximum(1., np.abs(lbf)), lbf)
        ubf = np.where(fin_u, ubf + relax * np.maximum(1., np.abs(ubf)), ubf)
        fc = final_cost_values(ocp)

        _stage('scenario setup')
        import copy as _copy
        # +-5% wind spread: the validated basin of the direct (non-homotopy)
        # batched continuation from the committed anchor (the green sweep
        # test's semantics); +-10% needs per-lane parameter ramping, left as
        # the documented next step
        u_refs = 10.0 * (1.0 + 0.05 * np.linspace(-1., 1., B))
        p_list = []
        for u in u_refs:
            theta0 = _copy.deepcopy(jax.tree_util.tree_map(
                np.asarray, base_P['theta0']))
            theta0['wind']['u_ref'] = np.asarray(float(u))
            p_list.append({'cost': {k: jnp.asarray(fc[k]) for k in fc},
                           'ref': base_P['ref'], 'weights': base_P['weights'],
                           'theta0': theta0})
        P_batch = stack_p(p_list)

        state = {k: jnp.stack([jnp.asarray(anchor[k])] * B)
                 for k in ('w', 's', 'y', 'lam', 'zl', 'zu')}
        state['mu'] = jnp.full((B,), 1e-5)
        state['err'] = jnp.full((B,), np.inf)

        lbw_np, ubw_np, free_np, _ = InteriorPointSolver.split_pins(lbf, ubf)

    def to_accel(x):
        x = jnp.asarray(x)
        if x.dtype == jnp.float64:
            x = x.astype(jnp.float32)
        return jax.device_put(x, accel)

    state = jax.tree_util.tree_map(to_accel, state)
    P_batch = jax.tree_util.tree_map(to_accel, P_batch)
    lbw = to_accel(lbw_np)
    ubw = to_accel(ubw_np)
    free = to_accel(free_np)

    if kkt == 'block':
        # the block-structured path (ocp/blockkkt.py) never materializes the
        # dense (n, n) system — per-interval frames + one reduced bordered
        # factor — so its working set fits where the dense direction module
        # OOMs; the whole iteration is one fused module
        step = make_ip_step(ocp, kkt='block')
        step_jit = jax.jit(jax.vmap(
            lambda st, p: step(st, p, lbw, ubw, free), in_axes=(0, 0)))

        def one_iter(st):
            return step_jit(st, P_batch)

        _stage('XLA compile: block step module')
        t_c = time.time()
        state1 = one_iter(state)
        jax.block_until_ready(state1)
        compile_s = {'block': time.time() - t_c}
        print(f'# block step module ready {compile_s["block"]:.1f}s',
              file=sys.stderr, flush=True)
        compile_jobs = ((step_jit, (state, P_batch)),)
        return _run_loop(one_iter, state1, compile_s, compile_jobs, ocp,
                         P_batch, B, dtype, kkt, hess, tol, verify_tol)

    # four separately-jitted modules chained host-side (see module docstring)
    from awebox_tpu.ocp.structured import make_structured_derivs
    vals_fn, jac_fn, hess_fn = make_structured_derivs(ocp, hessian=hess,
                                                      parts=True)
    _, direction = make_ip_step(ocp, kkt=kkt, hessian=hess, split=True,
                                solve_dtype='float64')

    def f32_module(jitted):
        # trace + run the derivative modules with x64 scoped OFF so every
        # internal constant stays f32; the jit cache key includes the flag,
        # so always call through this wrapper
        def call(*args):
            with jax.enable_x64(False):
                return jitted(*args)

        def lower(*args):
            with jax.enable_x64(False):
                return jitted.lower(*args)
        call.lower = lower
        return call

    vals_jit = f32_module(jax.jit(jax.vmap(vals_fn, in_axes=(0, 0, 0, 0))))
    jac_jit = f32_module(jax.jit(jax.vmap(jac_fn, in_axes=(0, 0))))
    hess_jit = f32_module(jax.jit(jax.vmap(hess_fn, in_axes=(0, 0, 0, 0))))
    dir_jit = jax.jit(jax.vmap(
        lambda st, dv: direction(st, dv, lbw, ubw, free), in_axes=(0, 0)))

    def one_iter(st):
        fval, gradf, cE, cI = vals_jit(st['w'], st['y'], st['lam'], P_batch)
        JE, JI = jac_jit(st['w'], P_batch)
        H = hess_jit(st['w'], st['y'], st['lam'], P_batch)
        return dir_jit(st, (fval, gradf, cE, cI, JE, JI, H))

    # The compile service is remote (shared axon backend): submit all three
    # derivative modules CONCURRENTLY so total compile wall approaches
    # max(module) instead of sum(module); each lands in the persistent cache
    # independently, so a deadline-killed run still leaves its finished
    # modules cached for the retry. BENCH_COMPILE=seq restores serial order.
    compile_s = {}
    w0, y0, l0 = state['w'], state['y'], state['lam']
    jobs = (('vals', vals_jit, (w0, y0, l0, P_batch)),
            ('jac', jac_jit, (w0, P_batch)),
            ('hess', hess_jit, (w0, y0, l0, P_batch)))

    def _compile_one(name, prog, args):
        t_c = time.time()
        jax.block_until_ready(prog(*args))
        compile_s[name] = time.time() - t_c
        print(f'# {name} module ready {compile_s[name]:.1f}s',
              file=sys.stderr, flush=True)

    if os.environ.get('BENCH_COMPILE', 'par') == 'seq':
        for name, prog, args in jobs:
            _stage(f'XLA compile: {name} module')
            _compile_one(name, prog, args)
    else:
        from concurrent.futures import ThreadPoolExecutor
        _stage('XLA compile: vals+jac+hess modules (concurrent)')
        t_c = time.time()
        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [pool.submit(_compile_one, *job) for job in jobs]
            for f in futs:
                f.result()
        print(f'# derivative modules ready {time.time() - t_c:.1f}s wall',
              file=sys.stderr, flush=True)
    _stage('XLA compile: direction module')
    t_c = time.time()
    state1 = one_iter(state)
    jax.block_until_ready(state1)
    compile_s['dir'] = time.time() - t_c
    print(f'# direction module ready {compile_s["dir"]:.1f}s',
          file=sys.stderr, flush=True)

    dv0 = (tuple(vals_jit(w0, y0, l0, P_batch))
           + tuple(jac_jit(w0, P_batch))
           + (hess_jit(w0, y0, l0, P_batch),))
    compile_jobs = ((vals_jit, (w0, y0, l0, P_batch)),
                    (jac_jit, (w0, P_batch)),
                    (hess_jit, (w0, y0, l0, P_batch)),
                    (dir_jit, (state, dv0)))
    return _run_loop(one_iter, state1, compile_s, compile_jobs, ocp, P_batch,
                     B, dtype, kkt, hess, tol, verify_tol)


def _run_loop(one_iter, state1, compile_s, compile_jobs, ocp, P_batch, B,
              dtype, kkt, hess, tol, verify_tol):
    import numpy as np
    import jax

    # FLOP estimate per iteration from XLA cost analysis (best effort)
    flops_per_iter = 0.0
    try:
        for prog, args in compile_jobs:
            cost = prog.lower(*args).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops_per_iter += float(cost.get('flops', 0.))
    except Exception:
        flops_per_iter = 0.0

    _stage('timed solve loop')
    # the loop breaks early when the remaining wall budget cannot fit
    # another burst, so a slow backend still reports whatever converged
    # instead of losing the whole run to the parent deadline
    loop_budget = float(os.environ.get('BENCH_LOOP_BUDGET_S', '240'))
    state = state1
    n_iter = 1
    t0 = time.time()
    while n_iter < N_ITER_CAP:
        burst = min(10, N_ITER_CAP - n_iter)
        for _ in range(burst):
            state = one_iter(state)
        n_iter += burst
        err = np.asarray(state['err'])
        elapsed_so_far = time.time() - t0
        if np.all(err <= tol):
            break
        if elapsed_so_far + burst * (elapsed_so_far / (n_iter - 1)) > loop_budget:
            print(f'# loop budget {loop_budget:.0f}s reached at iter {n_iter}',
                  file=sys.stderr, flush=True)
            break
    jax.block_until_ready(state)
    elapsed = time.time() - t0          # loop time only, compiles excluded
    per_iter = elapsed / max(n_iter - 1, 1)

    # convergence accounting: in-jit KKT error + full-horizon verification
    _stage('verification')
    err = np.asarray(state['err'])
    W = np.asarray(state['w'])
    import jax as _jax
    with _jax.enable_x64(False):   # f32 check: noise ~1e-6 << verify_tol
        eq_batched = _jax.jit(_jax.vmap(ocp.eq_fn, in_axes=(0, 0)))
        eq_res = np.max(np.abs(np.asarray(eq_batched(state['w'], P_batch))),
                        axis=1)
    finite = np.isfinite(W).all(axis=1)
    converged = finite & (err <= tol * 1.01) & (eq_res <= verify_tol)
    n_conv = int(converged.sum())

    total_wall = elapsed
    solves_per_s = n_conv / total_wall if total_wall > 0 else 0.0
    achieved_flops = flops_per_iter / per_iter if per_iter > 0 else 0.0
    mfu = achieved_flops / PEAK_FLOPS

    # converged-scenario powers for sanity (watts)
    powers = []
    for i in range(0, B, max(B // 8, 1)):
        if converged[i]:
            P_i = jax.tree_util.tree_map(lambda x, i=i: x[i], P_batch)
            T = float(ocp.time_period_fn(W[i]))
            powers.append(float(ocp.e_final_si_fn(W[i], P_i)) / T)
    p_lo = min(powers) if powers else float('nan')
    p_hi = max(powers) if powers else float('nan')

    target = 1000.0
    _emit({
        'metric': 'batched_converged_solves_per_s',
        'value': round(float(solves_per_s), 2),
        'unit': (f'solves/s (B={B}, converged {n_conv}/{B} to kkt<={tol:g} '
                 f'+ eq<={verify_tol:g} in {n_iter} iters, ampyx 3dof n_k=4 '
                 f'd=3 wind sweep +-5%, {dtype}, kkt={kkt}, hess={hess}, '
                 f'{per_iter*1e3:.1f} ms/iter, '
                 f'compile {"+".join(f"{compile_s[k]:.0f}" for k in compile_s)}s, '
                 f'{achieved_flops/1e12:.2f} TFLOP/s, MFU~{mfu*100:.2f}% of '
                 f'bf16 peak, P_avg {p_lo/1e3:.1f}..{p_hi/1e3:.1f} kW)'),
        'vs_baseline': round(float(solves_per_s) / target, 5),
    })


def _inner_guarded():
    try:
        inner()
    except BaseException as exc:   # device faults must still emit a line
        _emit({
            'metric': 'batched_converged_solves_per_s',
            'value': 0.0,
            'unit': f'solves/s (failed: {type(exc).__name__}: '
                    f'{str(exc)[:160]})',
            'vs_baseline': 0.0,
        })


if __name__ == '__main__':
    if os.environ.get('BENCH_INNER'):
        _inner_guarded()
    else:
        parent()
