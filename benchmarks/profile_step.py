#!/usr/bin/env python
"""Per-part timing of one batched block-KKT IP iteration on the accelerator.

Splits the step into (derivs, kkt_solve, advance) and times each jitted piece
separately, plus the fused step, to locate the bottleneck flagged in
VERDICT r2 Weak 1.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache')
jax.config.update('jax_compilation_cache_dir', cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

accel = jax.devices()[0]
on_tpu = accel.platform != 'cpu'
if not on_tpu:
    jax.config.update('jax_enable_x64', True)
try:
    cpu = jax.devices('cpu')[0]
except Exception:
    cpu = accel

from awebox_tpu.api.trial import Trial
from awebox_tpu.options.options import Options
from awebox_tpu.options.kite_data import ampyx_ap2_settings
from awebox_tpu.opti.homotopy import build_p_fix, define_schedule, set_initial_bounds
from awebox_tpu.opti.initialization import build_initial_guess, build_reference
from awebox_tpu.parallel.batch import init_batched_state
from awebox_tpu.ocp.blockkkt import make_block_kkt
from awebox_tpu.opti.ipsolver import InteriorPointSolver

options = Options()
ampyx_ap2_settings.set_ampyx_ap2_settings(options)
options['user_options.system_model.architecture'] = {1: 0}
options['user_options.system_model.kite_dof'] = 3
options['user_options.trajectory.type'] = 'power_cycle'
options['user_options.wind.model'] = 'power'
options['user_options.wind.u_ref'] = 10.
options['params.wind.z_ref'] = 100.0
options['user_options.trajectory.lift_mode.phase_fix'] = 'simple'
options['nlp.n_k'] = int(os.environ.get('NK', '8'))
options['nlp.collocation.d'] = 3

with jax.default_device(cpu):
    trial = Trial(options, 'prof').build()
    ocp = trial.ocp
    V0 = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V0))
    schedule = define_schedule(ocp)
    lb, ub = set_initial_bounds(ocp, trial.lb_nominal, trial.ub_nominal, V0, schedule)
    B = int(os.environ.get('B', '16'))
    rng = np.random.default_rng(0)
    batch = [V0 + 1e-3 * rng.normal(size=V0.shape) for _ in range(B)]
    state = init_batched_state(ocp, batch, P, lb, ub)

print(f'n={ocp.vstruct.total} n_eq={ocp.n_eq} n_ineq={ocp.n_ineq} '
      f'n_k={ocp.n_k} d={ocp.d} nx={ocp.vstruct.nx} B={B}', flush=True)

lbw, ubw, free_np, _ = InteriorPointSolver.split_pins(lb, ub)
lbw_j, ubw_j, free_j = jnp.asarray(lbw), jnp.asarray(ubw), jnp.asarray(free_np)

derivs_fn, kkt_solve, maps = make_block_kkt(ocp)
print(f'nloc={maps.nloc} ni={maps.ni} nb={maps.nb} m_rows={maps.m_rows}', flush=True)

to_a = lambda t: jax.tree_util.tree_map(lambda x: jax.device_put(x, accel), t)
state = to_a(state)
P_a = to_a(P)


def timeit(name, fn, *args, reps=20):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    per = (time.time() - t0) / reps
    print(f'{name:28s} compile {compile_s:7.1f}s   run {per*1e3:9.3f} ms', flush=True)
    return out


w, y, lam = state['w'], state['y'], state['lam']
s, zl, zu, mu = state['s'], state['zl'], state['zu'], state['mu']

vd = jax.jit(jax.vmap(derivs_fn, in_axes=(0, 0, 0, None)))
blocks = timeit('derivs (vmapped B)', vd, w, y, lam, P_a)

vk = jax.jit(jax.vmap(
    lambda bl, w_, s_, y_, lam_, zl_, zu_, mu_: kkt_solve(
        bl, w_, s_, y_, lam_, zl_, zu_, lbw_j, ubw_j, free_j, mu_,
        1e-8, 1e-8, 1e-8),
    in_axes=(0, 0, 0, 0, 0, 0, 0, 0)))
_ = timeit('kkt_solve (vmapped B)', vk, blocks, w, s, y, lam, zl, zu, mu)

# sub-pieces of derivs
theta0 = P_a['theta0']
kit = maps.kit
coll_idx_j = jnp.asarray(kit.coll_idx)
sh_idx_j = jnp.asarray(kit.sh_idx)
c_rows_j = jnp.asarray(kit.c_rows)
sel_rows_j = jnp.asarray(kit.sel_rows)
phase_ws_j = jnp.asarray(kit.phase_ws)
sh_phase_ws_j = jnp.asarray(kit.sh_phase_ws)
int_ws_j = jnp.asarray(kit.int_ws)
eq_slices = ocp.eq_slices
n_k, d = maps.n_k, maps.d
n_eq_m, n_sh = maps.n_eq_m, maps.n_sh

f_grad = jax.jit(jax.vmap(lambda w_, : jax.value_and_grad(ocp.f_fn)(w_, P_a)))
timeit('  global f+grad', f_grad, w)
eq_v = jax.jit(jax.vmap(lambda w_: ocp.eq_fn(w_, P_a)))
timeit('  global eq_fn', eq_v, w)
ineq_v = jax.jit(jax.vmap(lambda w_: ocp.ineq_fn(w_, P_a)))
timeit('  global ineq_fn', ineq_v, w)

Jc = jax.jit(jax.vmap(lambda w_: jax.vmap(jax.jacfwd(kit.coll_eq_local),
    in_axes=(0, 0, 0, 0, None))(w_[coll_idx_j], c_rows_j, sel_rows_j, phase_ws_j, theta0)))
timeit('  J_coll', Jc, w)
Js = jax.jit(jax.vmap(lambda w_: jax.vmap(jax.jacfwd(kit.sh_eq_local),
    in_axes=(0, 0, None))(w_[sh_idx_j], sh_phase_ws_j, theta0)))
timeit('  J_sh', Js, w)

def hc_one(w_, y_, lam_):
    lam_coll = y_[eq_slices['collocation']].reshape(n_k * d, n_eq_m)
    ref_vecs = kit.ref_nodes_from_P(P_a)
    return jax.vmap(jax.hessian(kit.coll_scalar),
                    in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))(
        w_[coll_idx_j], c_rows_j, sel_rows_j, phase_ws_j, int_ws_j,
        ref_vecs, lam_coll, P_a, theta0)
Hc = jax.jit(jax.vmap(hc_one))
timeit('  H_coll', Hc, w, y, lam)

def hs_one(w_, y_, lam_):
    lam_sh = y_[eq_slices['shooting']].reshape(n_k, n_sh)
    if maps.n_ineq_m:
        lam_path = lam_[ocp.ineq_slices['path'].start:
                        ocp.ineq_slices['path'].stop].reshape(n_k, maps.n_ineq_m)
    else:
        lam_path = jnp.zeros((n_k, 0))
    return jax.vmap(jax.hessian(kit.sh_scalar), in_axes=(0, 0, 0, 0, None))(
        w_[sh_idx_j], sh_phase_ws_j, lam_sh, lam_path, theta0)
Hs = jax.jit(jax.vmap(hs_one))
timeit('  H_sh', Hs, w, y, lam)
