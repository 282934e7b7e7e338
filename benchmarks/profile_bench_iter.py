#!/usr/bin/env python
"""Per-module timing of one bench iteration on the accelerator (VERDICT r4
Next #2): times the exact modules bench.py chains host-side — f32 vals /
jac / hess, the auglu direction, the f64 polish values module, and the
fused-vs-split comparison — at the bench workload (B lanes refined from the
committed anchor).

Run (TPU):  python benchmarks/profile_bench_iter.py
Run (CPU):  JAX_PLATFORMS=cpu B=8 python benchmarks/profile_bench_iter.py
"""
import copy
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', os.path.join(ROOT, '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
if os.environ.get('JAX_PLATFORMS', '') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_default_matmul_precision', 'highest')

from awebox_tpu.api.trial import Trial
from awebox_tpu.opti.homotopy import build_p_fix, final_bounds, final_cost_values
from awebox_tpu.opti.initialization import build_initial_guess, build_reference
from awebox_tpu.opti.ipsolver import InteriorPointSolver
from awebox_tpu.parallel.batch import make_ip_step, stack_p
from awebox_tpu.ocp.structured import make_structured_derivs
from make_bench_anchor import bench_options

B = int(os.environ.get('B', '128'))
accel = jax.devices()[0]
try:
    cpu = jax.devices('cpu')[0]
except Exception:
    cpu = accel

with jax.default_device(cpu):
    trial = Trial(bench_options(), 'prof_bench').build()
    ocp = trial.ocp
    anchor = np.load(os.path.join(ROOT, 'tests', 'artifacts',
                                  'bench_anchor_nk4_d3.npz'))
    V0 = build_initial_guess(ocp)
    base_P = build_p_fix(ocp, build_reference(ocp, V0))
    lbf, ubf = final_bounds(ocp, trial.lb_nominal, trial.ub_nominal,
                            np.asarray(V0))
    relax = 1e-8
    fin_l = np.isfinite(lbf) & (lbf != ubf)
    fin_u = np.isfinite(ubf) & (lbf != ubf)
    lbf = np.where(fin_l, lbf - relax * np.maximum(1., np.abs(lbf)), lbf)
    ubf = np.where(fin_u, ubf + relax * np.maximum(1., np.abs(ubf)), ubf)
    fc = final_cost_values(ocp)
    u_refs = 10.0 * (1.0 + 0.05 * np.linspace(-1., 1., B))
    p_list = []
    for u in u_refs:
        th = copy.deepcopy(jax.tree_util.tree_map(np.asarray, base_P['theta0']))
        th['wind']['u_ref'] = np.asarray(float(u))
        p_list.append({'cost': {k: jnp.asarray(fc[k]) for k in fc},
                       'ref': base_P['ref'], 'weights': base_P['weights'],
                       'theta0': th})
    P_batch = stack_p(p_list)
    state = {k: jnp.stack([jnp.asarray(anchor[k])] * B)
             for k in ('w', 's', 'y', 'lam', 'zl', 'zu')}
    state['mu'] = jnp.full((B,), 1e-5)
    state['err'] = jnp.full((B,), np.inf)
    lbw, ubw, free, _ = InteriorPointSolver.split_pins(lbf, ubf)

to_a = lambda t: jax.tree_util.tree_map(
    lambda x: jax.device_put(jnp.asarray(x), accel), t)
state = to_a(state)
P64 = to_a(P_batch)
P32 = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x, P64)
lbw, ubw, free = to_a(lbw), to_a(ubw), to_a(free)

print(f'# backend={accel.platform} B={B} n={ocp.vstruct.total} '
      f'n_eq={ocp.n_eq} n_ineq={ocp.n_ineq}', flush=True)

vals_fn, jac_fn, hess_fn = make_structured_derivs(ocp, hessian='exact',
                                                  parts=True)
_, direction = make_ip_step(ocp, kkt='auglu', hessian='exact', split=True,
                            kappa_mu=0.4)


def f32_module(jitted):
    def call(*a):
        with jax.enable_x64(False):
            return jitted(*a)
    return call


vals_jit = f32_module(jax.jit(jax.vmap(vals_fn, in_axes=(0, 0, 0, 0))))
jac_jit = f32_module(jax.jit(jax.vmap(jac_fn, in_axes=(0, 0))))
hess_jit = f32_module(jax.jit(jax.vmap(hess_fn, in_axes=(0, 0, 0, 0))))
vals64_jit = jax.jit(jax.vmap(vals_fn, in_axes=(0, 0, 0, 0)))
dir_jit = jax.jit(jax.vmap(
    lambda st, dv: direction(st, dv, lbw, ubw, free), in_axes=(0, 0)))
cast3 = jax.jit(lambda w, y, lam: (w.astype(jnp.float32),
                                   y.astype(jnp.float32),
                                   lam.astype(jnp.float32)))


def timeit(name, fn, *args, reps=10):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    per = (time.time() - t0) / reps
    print(f'{name:26s} compile {compile_s:7.1f}s   run {per * 1e3:9.2f} ms',
          flush=True)
    return out


w, y, lam = state['w'], state['y'], state['lam']
w32, y32, l32 = cast3(w, y, lam)
jax.block_until_ready((w32, y32, l32))

timeit('cast3', cast3, w, y, lam)
dv32_vals = timeit('vals (f32)', vals_jit, w32, y32, l32, P32)
dv_jac = timeit('jac (f32)', jac_jit, w32, P32)
dv_hess = timeit('hess (f32)', hess_jit, w32, y32, l32, P32)
dv64_vals = timeit('vals64 (f64 emulated)', vals64_jit, w, y, lam, P64)

dv32 = tuple(dv32_vals) + tuple(dv_jac) + (dv_hess,)
timeit('direction (auglu)', dir_jit, state, dv32)
dv_mixed = tuple(dv64_vals) + tuple(dv_jac) + (dv_hess,)
timeit('direction (polish mix)', dir_jit, state, dv_mixed)


def one_iter(st):
    a, b, c = cast3(st['w'], st['y'], st['lam'])
    fval, gradf, cE, cI = vals_jit(a, b, c, P32)
    JE, JI = jac_jit(a, P32)
    H = hess_jit(a, b, c, P32)
    return dir_jit(st, (fval, gradf, cE, cI, JE, JI, H))


timeit('full iter (host-chained)', one_iter, state)

# fused single-module iteration (dispatch-overhead comparison)
def fused(st):
    a, b, c = (st['w'].astype(jnp.float32), st['y'].astype(jnp.float32),
               st['lam'].astype(jnp.float32))
    with jax.enable_x64(False):
        fval, gradf, cE, cI = jax.vmap(vals_fn, in_axes=(0, 0, 0, 0))(
            a, b, c, P32)
        JE, JI = jax.vmap(jac_fn, in_axes=(0, 0))(a, P32)
        H = jax.vmap(hess_fn, in_axes=(0, 0, 0, 0))(a, b, c, P32)
    return jax.vmap(lambda s_, d_: direction(s_, d_, lbw, ubw, free),
                    in_axes=(0, 0))(st, (fval, gradf, cE, cI, JE, JI, H))


try:
    fused_jit = jax.jit(fused)
    timeit('full iter (fused 1 module)', fused_jit, state)
except Exception as exc:
    print(f'# fused module failed: {type(exc).__name__}: {str(exc)[:140]}',
          flush=True)
