"""Multiple-shooting transcription: embedded integrators instead of
collocation stage variables.

Counterpart of /root/reference/awebox/ocp/multiple_shooting.py:38-164: the
NLP decision vector drops the collocation blocks and keeps
[theta, phi, x[0..n_k], u_k, xdot_k, z_k]; the model equalities at each
shooting node pin (xdot_k, z_k) to DAE-consistency (the role the reference's
rootfinder map plays for ms_z0, multiple_shooting.py:116-152), and
continuity embeds an explicit RK4 integrator whose stage derivatives come
from Newton corrections of the implicit DAE warm-started at the node's own
(xdot_k, z_k) — the rk4root integrator (tools/integrator_routines.py:33-96)
with the per-stage rootfinder truncated to a fixed Newton iteration count so
the whole constraint stays a static jit graph.

The per-interval integrators evaluate under one vmap over intervals
(replacing casadi's F.map, multiple_shooting.py:76-79). Multiple shooting
always uses the dense KKT path: without collocation blocks the
block-tridiagonal interior structure of blockkkt does not apply.

Collocation remains the production transcription (as in the reference);
multiple shooting exists for cross-discretization verification and for
stiff-dynamics experimentation on small grids.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..model.builder import Model
from ..model.system import PHI_NAMES
from .collocation import Collocation
from .transcription import OCP, REG_CATEGORIES
from .vstruct import VStruct


def build_ms_ocp(model: Model, options: dict) -> OCP:
    nlp_opts = options['nlp']
    n_k = int(nlp_opts['n_k'])
    d = int(nlp_opts['collocation']['d'])
    coll = Collocation.build(d, nlp_opts['collocation']['scheme'])
    layout = model.layout
    arch = model.arch

    traj = options['user_options']['trajectory']
    lift_mode = traj['system_type'] == 'lift_mode'
    phase_fix = traj['lift_mode']['phase_fix'] if lift_mode else 'simple'
    single_reelout = lift_mode and phase_fix == 'single_reelout' \
        and traj['type'] == 'power_cycle'
    periodic = traj['type'] in ('power_cycle', 'tracking')
    if options['model']['integral_outputs']:
        raise NotImplementedError(
            'multiple shooting integrates energy as a state; set '
            'model.integral_outputs = False')

    vstruct = VStruct.build(layout, n_k, d, single_reelout, u_param='ms')
    switch_kdx = round(n_k * nlp_opts['phase_fix_reelout']) if single_reelout else n_k
    phase_idx = np.array([0 if k < switch_kdx else 1 for k in range(n_k)])

    nx, nu, nxd, nz = vstruct.nx, vstruct.nu, vstruct.nxd, vstruct.nz
    if nxd != nx:
        raise NotImplementedError('rk4root embedding assumes nxd == nx')
    ntheta_model = layout.dims['theta']
    tf_model_slice = layout.slices['theta']['t_f']
    h = 1. / n_k

    n_steps = int(nlp_opts.get('ms_integrator_steps', 1))
    newton_iters = int(nlp_opts.get('ms_newton_iters', 1))

    def tf_per_k(V):
        tf = vstruct.get_theta(V, 't_f')
        if single_reelout:
            return tf[jnp.asarray(phase_idx)]
        return jnp.broadcast_to(tf, (n_k,))

    def time_period(V):
        tf = vstruct.get_theta(V, 't_f')
        if single_reelout:
            return tf[0] * switch_kdx / n_k + tf[1] * (n_k - switch_kdx) / n_k
        return tf[0]

    model_theta_slices = {name: layout.slices['theta'][name]
                          for name in layout.names('theta')}

    def model_theta_all(V):
        base = jnp.zeros(ntheta_model)
        for name in layout.names('theta'):
            if name == 't_f':
                continue
            base = base.at[model_theta_slices[name]].set(vstruct.get_theta(V, name))
        tfk = tf_per_k(V)
        out = jnp.broadcast_to(base, (n_k, ntheta_model))
        out = out.at[:, tf_model_slice.start].set(tfk)
        return out

    def assemble_nodes(V):
        X = vstruct.get_x_all(V)
        U = vstruct.get_u_all(V)
        XD = vstruct.get_xdot_all(V)
        Z = vstruct.get_z_all(V)
        TH = model_theta_all(V)
        return jnp.concatenate([X[:n_k], XD, U, Z, TH], axis=1)

    # --- embedded rk4root integrator over one interval --------------------
    def dae_residual(x, zd, u, theta_model, phi, theta0):
        v = jnp.concatenate([x, zd[:nxd], u, zd[nxd:], theta_model])
        return model.eq_fn(v, phi, theta0)

    def newton_correct(x, zd, u, theta_model, phi, theta0):
        def body(_, zd_):
            r = dae_residual(x, zd_, u, theta_model, phi, theta0)
            J = jax.jacfwd(lambda z_: dae_residual(
                x, z_, u, theta_model, phi, theta0))(zd_)
            step = jnp.linalg.solve(J, r)
            step = jnp.where(jnp.isfinite(step), step, 0.)
            return zd_ - step
        out = zd
        for i in range(newton_iters):     # static unroll: AD-friendly
            out = body(i, out)
        return out

    def integrate_interval(x0, u, zd0, dt, theta_model, phi, theta0):
        def xdot_of(x, zd):
            zd = newton_correct(x, zd, u, theta_model, phi, theta0)
            return zd[:nxd], zd

        def substep(carry, _):
            x, zd = carry
            ddt = dt / n_steps
            k1, zd = xdot_of(x, zd)
            k2, zd = xdot_of(x + 0.5 * ddt * k1, zd)
            k3, zd = xdot_of(x + 0.5 * ddt * k2, zd)
            k4, zd = xdot_of(x + ddt * k3, zd)
            return (x + ddt / 6. * (k1 + 2. * k2 + 2. * k3 + k4), zd), None

        (xf, _), _ = jax.lax.scan(substep, (x0, zd0), None, length=n_steps)
        return xf

    # periodicity mask (operation.py:245-267)
    periodic_keep = np.ones(nx, dtype=bool)
    e_sl = layout.slices['x']['e']
    periodic_keep[e_sl] = False
    for name in layout.names('x'):
        if name.startswith('w') or name.startswith('dw'):
            periodic_keep[layout.slices['x'][name]] = False
    periodic_idx = np.where(periodic_keep)[0]
    periodic_idx_j = jnp.asarray(periodic_idx)

    n_eq_m = model.n_eq
    n_ineq_m = model.n_ineq
    keep_rows = np.arange(n_eq_m)     # all model rows pin (xdot, z)

    eq_slices: Dict[str, slice] = {}
    cursor = 0

    def add_eq(name, dim):
        nonlocal cursor
        eq_slices[name] = slice(cursor, cursor + dim)
        cursor += dim

    add_eq('initial_e', 1)
    add_eq('shooting', n_k * n_eq_m)
    add_eq('continuity', n_k * nx)
    if periodic:
        add_eq('periodic', int(periodic_keep.sum()))
    n_eq_total = cursor

    def eq_fn(V, P):
        phi = vstruct.get_phi(V)
        theta0 = P['theta0']
        X = vstruct.get_x_all(V)
        U = vstruct.get_u_all(V)
        XD = vstruct.get_xdot_all(V)
        Z = vstruct.get_z_all(V)
        TH = model_theta_all(V)
        shooting = jnp.concatenate([X[:n_k], XD, U, Z, TH], axis=1)

        res = []
        ref_x0 = vstruct.get_x_all(P['ref'])[0]
        res.append(X[0][e_sl] - ref_x0[e_sl])

        eq_sh = jax.vmap(model.eq_fn, in_axes=(0, None, None))(
            shooting, phi, theta0)
        res.append(eq_sh.reshape(-1))

        tfk = tf_per_k(V)
        ZD = jnp.concatenate([XD, Z], axis=1)
        XF = jax.vmap(integrate_interval,
                      in_axes=(0, 0, 0, 0, 0, None, None))(
            X[:n_k], U, ZD, h * tfk, TH, phi, theta0)
        res.append((X[1:] - XF).reshape(-1))

        if periodic:
            res.append((X[0] - X[n_k])[periodic_idx_j])
        return jnp.concatenate(res)

    # --- inequalities ------------------------------------------------------
    ineq_slices: Dict[str, slice] = {}
    icursor = 0

    def add_ineq(name, dim):
        nonlocal icursor
        ineq_slices[name] = slice(icursor, icursor + dim)
        icursor += dim

    add_ineq('path', n_k * n_ineq_m)
    if single_reelout:
        add_ineq('t_f_bounds', 2)
    n_ineq_total = icursor
    tf_bounds = options['model']['system_bounds']['theta']['t_f']

    def ineq_fn(V, P):
        phi = vstruct.get_phi(V)
        theta0 = P['theta0']
        shooting = assemble_nodes(V)
        res = []
        if n_ineq_m:
            path = jax.vmap(model.ineq_fn, in_axes=(0, None, None))(
                shooting, phi, theta0)
            res.append(path.reshape(-1))
        else:
            res.append(jnp.zeros(0))
        if single_reelout:
            T = time_period(V)
            scale = nlp_opts['phase_fix_reelout']
            res.append(jnp.array([(T - tf_bounds[1]) / scale,
                                  (tf_bounds[0] - T) / scale]))
        return jnp.concatenate(res)

    # --- objective (shooting-node regularization + power/time/phi costs) ---
    nv_model = layout.total_dim
    cat_masks = {c: np.zeros(nv_model) for c in REG_CATEGORIES}
    for t, cat in (('x', 'tracking'), ('xdot', 'xdot_regularisation'),
                   ('u', 'u_regularisation'), ('z', 'tracking'),
                   ('theta', 'theta_regularisation')):
        off = layout.type_offsets[t]
        for name, dim in layout.entries[t]:
            sl = layout.slices[t][name]
            use_cat = cat
            if t == 'x' and name == 'e':
                use_cat = None
            if t == 'theta' and name == 't_f':
                use_cat = None
            if t == 'u' and ('f_fict' in name or 'm_fict' in name):
                use_cat = 'fictitious'
            if use_cat is not None:
                cat_masks[use_cat][off + sl.start:off + sl.stop] = 1.0
    cat_mask_matrix = np.stack([cat_masks[c] for c in REG_CATEGORIES])
    cat_mask_j = jnp.asarray(cat_mask_matrix)

    N_nodes = arch.number_of_nodes
    N_kites = arch.number_of_kites
    normalization = {
        'tracking': n_k * N_nodes,
        'u_regularisation': n_k * N_kites,
        'theta_regularisation': n_k,
        'xdot_regularisation': n_k * N_nodes,
        'fictitious': n_k * N_kites,
        'beta': n_k * N_kites,
    }

    e_state_scale = float(model.scaling['x'][e_sl][0])
    traj_type = traj['type']
    psi_i = PHI_NAMES.index('psi')

    def assemble_ref_nodes(Vref):
        X = vstruct.get_x_all(Vref)
        U = vstruct.get_u_all(Vref)
        Z = vstruct.get_z_all(Vref)
        TH = model_theta_all(Vref)
        XD0 = jnp.zeros((n_k, nxd))
        return jnp.concatenate([X[:n_k], XD0, U, Z, TH], axis=1)

    def e_final_scaled(V, P):
        return vstruct.get_x_all(V)[n_k][e_sl][0]

    def e_final_si(V, P):
        return e_final_scaled(V, P) * e_state_scale

    def cost_components(V, P):
        phi = vstruct.get_phi(V)
        nodes = assemble_nodes(V)
        refs = assemble_ref_nodes(P['ref'])
        diffsq = P['weights'][None, :] * (nodes - refs) ** 2
        per_cat = diffsq @ cat_mask_j.T                 # (n_k, ncat)
        cat_sums = per_cat.sum(axis=0)                  # uniform node weights

        comp = {}
        for i, cat in enumerate(REG_CATEGORIES):
            comp[cat + '_cost'] = P['cost'][cat] / normalization[cat] * cat_sums[i]
        for i, name in enumerate(PHI_NAMES):
            comp[name + '_cost'] = P['cost'][name] * phi[i]
        T = time_period(V)
        T_ref = time_period(P['ref'])
        comp['time_cost'] = P['cost']['t_f'] * (T - T_ref) ** 2
        comp['power_cost'] = P['cost']['power'] * (-1.) * e_final_scaled(V, P) / T
        comp['beta_cost'] = 0.
        comp['tracking_problem_cost'] = comp['tracking_cost']
        comp['power_problem_cost'] = comp['power_cost']
        comp['general_problem_cost'] = (
            comp['fictitious_cost'] + comp['u_regularisation_cost']
            + comp['xdot_regularisation_cost'] + comp['theta_regularisation_cost']
            + comp['beta_cost'] + comp['time_cost'])
        comp['homotopy_cost'] = sum(comp[name + '_cost'] for name in PHI_NAMES)
        return comp

    def f_fn(V, P):
        comp = cost_components(V, P)
        phi = vstruct.get_phi(V)
        psi = phi[psi_i]
        if traj_type == 'power_cycle':
            return psi * comp['tracking_problem_cost'] \
                + (1. - psi) * comp['power_problem_cost'] \
                + comp['general_problem_cost'] + comp['homotopy_cost']
        if traj_type in ('tracking', 'mpc'):
            upsilon = phi[PHI_NAMES.index('upsilon')]
            nu_h = phi[PHI_NAMES.index('nu')]
            eta = phi[PHI_NAMES.index('eta')]
            return upsilon * nu_h * eta * psi * comp['tracking_problem_cost'] \
                + (1. - psi) * comp['power_problem_cost'] \
                + comp['general_problem_cost'] + comp['homotopy_cost']
        raise NotImplementedError(f'trajectory type {traj_type}')

    def outputs_on_shooting(V, P):
        phi = vstruct.get_phi(V)
        theta0 = P['theta0']
        nodes = assemble_nodes(V)
        return jax.vmap(model.outputs_fn, in_axes=(0, None, None))(
            nodes, phi, theta0)

    def ms_xf(V, P):
        """Per-interval integrator endpoints (the reference's ms_xf,
        multiple_shooting.py:82-84); exposed for cross-checks."""
        phi = vstruct.get_phi(V)
        theta0 = P['theta0']
        X = vstruct.get_x_all(V)
        U = vstruct.get_u_all(V)
        XD = vstruct.get_xdot_all(V)
        Z = vstruct.get_z_all(V)
        TH = model_theta_all(V)
        tfk = tf_per_k(V)
        ZD = jnp.concatenate([XD, Z], axis=1)
        return jax.vmap(integrate_interval,
                        in_axes=(0, 0, 0, 0, 0, None, None))(
            X[:n_k], U, ZD, h * tfk, TH, phi, theta0)

    ocp = OCP(model=model, vstruct=vstruct, coll=coll, options=options,
               n_k=n_k, d=d, phase_idx=phase_idx, switch_kdx=switch_kdx,
               f_fn=f_fn, eq_fn=eq_fn, ineq_fn=ineq_fn,
               eq_slices=eq_slices, ineq_slices=ineq_slices,
               n_eq=n_eq_total, n_ineq=n_ineq_total,
               time_period_fn=time_period, tf_per_k_fn=tf_per_k,
               e_final_si_fn=e_final_si,
               outputs_on_coll_fn=outputs_on_shooting,
               outputs_on_shooting_fn=outputs_on_shooting,
               cost_components_fn=cost_components,
               keep_rows=keep_rows, periodic_idx=periodic_idx,
               cat_mask_matrix=cat_mask_matrix,
               normalization=normalization,
               single_reelout=single_reelout, periodic=periodic,
               assemble_nodes_fn=lambda V: (assemble_nodes(V), None))
    ocp.ms_xf_fn = ms_xf
    return ocp
