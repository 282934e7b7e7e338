"""Direct-collocation transcription: model -> NLP functions over a flat V.

TPU-native counterpart of /root/reference/awebox/ocp/{discretization,
constraints, objective, operation}.py: the per-node model residuals are
evaluated with a single vmap over all collocation/shooting nodes (replacing
casadi Function.map, ocp/constraints.py:239-278), the objective's
regularization sums are one vmapped weighted-square pass over nodes
(objective.py:173-245), and continuity/periodicity are static linear maps.

Everything returned is a pure function of (V, P) where
P = {'cost': {...}, 'ref': V-like vector, 'weights': model-var vector,
'theta0': parameter pytree}, so the entire homotopy reuses one compilation.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..model.builder import Model
from ..model.system import PHI_NAMES
from .collocation import Collocation
from .vstruct import VStruct

REG_CATEGORIES = ('tracking', 'xdot_regularisation', 'u_regularisation',
                  'fictitious', 'theta_regularisation')


@dataclass
class OCP:
    model: Model
    vstruct: VStruct
    coll: Collocation
    options: dict
    n_k: int
    d: int
    phase_idx: np.ndarray          # (n_k,) 0/1 phase of each interval
    switch_kdx: int
    f_fn: Callable                 # (V, P) -> scalar
    eq_fn: Callable                # (V, P) -> vector
    ineq_fn: Callable              # (V, P) -> vector (<= 0)
    eq_slices: Dict[str, slice]
    ineq_slices: Dict[str, slice]
    n_eq: int
    n_ineq: int
    time_period_fn: Callable       # (V) -> scalar SI seconds
    tf_per_k_fn: Callable          # (V) -> (n_k,)
    e_final_si_fn: Callable = None  # (V, P) -> final energy [J]
    outputs_on_coll_fn: Callable = None   # (V, P) -> pytree over (n_k*d) nodes
    outputs_on_shooting_fn: Callable = None  # (V, P) -> pytree over n_k nodes
    cost_components_fn: Callable = None   # (V, P) -> dict of scalars
    keep_rows: np.ndarray = None          # shooting-eq model rows kept
    periodic_idx: np.ndarray = None       # x entries in the periodicity map
    cat_mask_matrix: np.ndarray = None    # (ncat, nv_model) regularization masks
    normalization: dict = None            # per-category cost normalization
    single_reelout: bool = False
    periodic: bool = False
    assemble_nodes_fn: Callable = None    # V -> (shooting, coll_vecs)


def _model_node_order(layout):
    """model variables vector order: [x, xdot, u, z, theta]."""
    return [layout.dims[t] for t in ('x', 'xdot', 'u', 'z', 'theta')]


def build_ocp(model: Model, options: dict) -> OCP:
    nlp_opts = options['nlp']
    if nlp_opts.get('discretization', 'direct_collocation') == 'multiple_shooting':
        from .multiple_shooting import build_ms_ocp
        return build_ms_ocp(model, options)
    n_k = int(nlp_opts['n_k'])
    d = int(nlp_opts['collocation']['d'])
    scheme = nlp_opts['collocation']['scheme']
    u_param = nlp_opts['collocation']['u_param']
    if u_param not in ('zoh', 'poly'):
        raise ValueError(f'unknown u_param {u_param!r}')
    poly_u = (u_param == 'poly')
    coll = Collocation.build(d, scheme)
    layout = model.layout
    arch = model.arch

    traj = options['user_options']['trajectory']
    lift_mode = traj['system_type'] == 'lift_mode'
    phase_fix = traj['lift_mode']['phase_fix'] if lift_mode else 'simple'
    single_reelout = lift_mode and phase_fix == 'single_reelout' \
        and traj['type'] == 'power_cycle'

    # trajectory-type boundary-condition families (ocp/operation.py)
    from . import operation as op
    conds = op.conditions(options)
    periodic = conds['periodic']
    with_xi = conds['param_initial'] or conds['param_terminal']

    table_init = table_term = None
    table_T_src = None
    if with_xi:
        src = traj['transition']
        if conds['param_initial']:
            if src['initial_trajectory'] is None:
                raise ValueError(
                    f"trajectory type {traj['type']!r} needs user_options."
                    "trajectory.transition.initial_trajectory (saved trial)")
            tab, table_T_src = op.load_boundary_table(
                src['initial_trajectory'], model)
            table_init = jnp.asarray(tab)
        if conds['param_terminal']:
            if src['terminal_trajectory'] is None:
                raise ValueError(
                    f"trajectory type {traj['type']!r} needs user_options."
                    "trajectory.transition.terminal_trajectory (saved trial)")
            tab, T_term = op.load_boundary_table(
                src['terminal_trajectory'], model)
            table_term = jnp.asarray(tab)
            if table_T_src is None:
                table_T_src = T_term
    param_keep = jnp.asarray(np.where(op.param_blacklist(options, model))[0])

    vstruct = VStruct.build(layout, n_k, d, single_reelout, u_param,
                            with_xi=with_xi)

    switch_kdx = round(n_k * nlp_opts['phase_fix_reelout']) if single_reelout else n_k
    phase_idx = np.array([0 if k < switch_kdx else 1 for k in range(n_k)])

    nx, nu, nxd, nz = vstruct.nx, vstruct.nu, vstruct.nxd, vstruct.nz
    ntheta_model = layout.dims['theta']
    tf_model_slice = layout.slices['theta']['t_f']

    C = coll.coeff_collocation             # (d+1, d+1); [j, r]
    C_deriv = jnp.asarray(C[:, 1:])        # derivative at coll nodes 1..d
    cont = jnp.asarray(coll.coeff_continuity)
    int_w = jnp.asarray(coll.quad_weights)  # (d,)
    h = 1. / n_k

    theta_model_template_idx = []
    # map from V theta entries to the model theta vector (t_f handled apart)
    model_theta_slices = {name: layout.slices['theta'][name]
                         for name in layout.names('theta')}

    def tf_per_k(V):
        tf = vstruct.get_theta(V, 't_f')
        if single_reelout:
            return tf[jnp.asarray(phase_idx)]
        return jnp.broadcast_to(tf, (n_k,))

    def time_period(V):
        """SI time period (theta t_f is unit-scaled);
        ocp/ocp_outputs.py:118-141."""
        tf = vstruct.get_theta(V, 't_f')
        if single_reelout:
            return tf[0] * switch_kdx / n_k + tf[1] * (n_k - switch_kdx) / n_k
        return tf[0]

    def model_theta_all(V):
        """(n_k, ntheta_model) model theta vector per interval."""
        base = jnp.zeros(ntheta_model)
        for name in layout.names('theta'):
            if name == 't_f':
                continue
            base = base.at[model_theta_slices[name]].set(vstruct.get_theta(V, name))
        tfk = tf_per_k(V)  # (n_k,)
        out = jnp.broadcast_to(base, (n_k, ntheta_model))
        out = out.at[:, tf_model_slice.start].set(tfk)
        return out

    def assemble_nodes(V):
        """Returns (shooting_vecs (n_k, nv) or None under poly controls,
        coll_vecs (n_k*d, nv))."""
        X = vstruct.get_x_all(V)             # (n_k+1, nx)
        CX = vstruct.get_coll_x(V)           # (n_k, d, nx)
        CZ = vstruct.get_coll_z(V)           # (n_k, d, nz)
        TH = model_theta_all(V)              # (n_k, nt)

        # polynomial state derivative at collocation nodes
        X_stack = jnp.concatenate([X[:n_k, None, :], CX], axis=1)  # (n_k, d+1, nx)
        tfk = tf_per_k(V)
        Xdot_coll = jnp.einsum('rj,krn->kjn', C_deriv, X_stack) / (h * tfk[:, None, None])

        TH_c = jnp.broadcast_to(TH[:, None, :], (n_k, d, ntheta_model))
        if poly_u:
            U_c = vstruct.get_coll_u(V)      # (n_k, d, nu)
            shooting = None
        else:
            U = vstruct.get_u_all(V)         # (n_k, nu)
            XD = vstruct.get_xdot_all(V)     # (n_k, nxd)
            Z = vstruct.get_z_all(V)         # (n_k, nz)
            shooting = jnp.concatenate([X[:n_k], XD, U, Z, TH], axis=1)
            U_c = jnp.broadcast_to(U[:, None, :], (n_k, d, nu))
        coll_vecs = jnp.concatenate([CX, Xdot_coll, U_c, CZ, TH_c], axis=2)
        return shooting, coll_vecs.reshape(n_k * d, -1)

    def assemble_ref_nodes(Vref):
        """Same as assemble_nodes but with zero xdot at the reference
        (objective.py:187: coll_refs use Xdot(0.0))."""
        X = vstruct.get_x_all(Vref)
        CX = vstruct.get_coll_x(Vref)
        CZ = vstruct.get_coll_z(Vref)
        TH = model_theta_all(Vref)
        if poly_u:
            U_c = vstruct.get_coll_u(Vref)
        else:
            U = vstruct.get_u_all(Vref)
            U_c = jnp.broadcast_to(U[:, None, :], (n_k, d, nu))
        TH_c = jnp.broadcast_to(TH[:, None, :], (n_k, d, ntheta_model))
        XD0 = jnp.zeros((n_k, d, nxd))
        coll_vecs = jnp.concatenate([CX, XD0, U_c, CZ, TH_c], axis=2)
        return coll_vecs.reshape(n_k * d, -1)

    # --- structural row selection for shooting equalities ------------------
    # drop model equalities that depend only on x (would duplicate
    # continuity and break LICQ; ocp/constraints.py:170-207). Poly controls
    # place no model equalities at shooting nodes at all
    # (var_struct.py:59-81: no u/xdot/z live there).
    n_eq_model = model.n_eq
    if poly_u:
        keep_rows = np.zeros(0, dtype=int)
    else:
        rng = np.random.default_rng(0)
        v_test = jnp.asarray(rng.normal(size=layout.total_dim) * 0.1 + 0.8)
        phi_test = jnp.ones(len(PHI_NAMES))
        J_test = np.asarray(jax.jacfwd(model.eq_fn)(v_test, phi_test, model.theta0_init))
        non_x = np.ones(layout.total_dim, dtype=bool)
        non_x[layout.type_offsets['x']:layout.type_offsets['x'] + layout.dims['x']] = False
        keep_rows = np.where(np.abs(J_test[:, non_x]).sum(axis=1) > 1e-12)[0]
    n_sh = len(keep_rows)
    keep_rows_j = jnp.asarray(keep_rows)

    # periodicity mask over x entries (operation.py:245-267)
    periodic_keep = np.ones(nx, dtype=bool)
    integral_names = [] if options['model']['integral_outputs'] else ['e']
    for name in integral_names:
        sl = layout.slices['x'][name]
        periodic_keep[sl] = False
    for name in layout.names('x'):
        if name.startswith('w') or name.startswith('dw'):
            periodic_keep[layout.slices['x'][name]] = False
    periodic_idx = jnp.asarray(np.where(periodic_keep)[0])

    n_ineq_model = model.n_ineq

    # --- equality constraint layout ---------------------------------------
    eq_slices: Dict[str, slice] = {}
    cursor = 0

    def add_eq(name, dim):
        nonlocal cursor
        eq_slices[name] = slice(cursor, cursor + dim)
        cursor += dim

    if not options['model']['integral_outputs']:
        add_eq('initial_e', len(integral_names))
    add_eq('shooting', n_k * n_sh)
    add_eq('collocation', n_k * d * n_eq_model)
    add_eq('continuity', n_k * nx)
    if periodic:
        add_eq('periodic', int(periodic_keep.sum()))
    if conds['param_initial']:
        add_eq('param_initial', int(param_keep.shape[0]))
    if conds['param_terminal']:
        add_eq('param_terminal', nx)
    if conds['initial'] and traj['type'] == 'launch':
        add_eq('initial_conditions', nx)
    averaged_induction = model.cfg.get('induction_model') == 'averaged'
    if averaged_induction:
        # trajectory-averaged momentum balance F_avg/T = 4a(1-a) WdA_int
        # (ocp/constraints.py:108-124 + induction_dir/averaged.py)
        add_eq('avg_induction', 1)
        # row scale: the constraint is dominated by the WdA integral
        # (dynamic pressure x swept area over the reelout); scaling by its
        # build-time estimate keeps the residual O(1) for the IP solver
        from ..options import derived as _derived
        _gs = float(options['solver']['initialization']['groundspeed'])
        _u_ref = float(options['user_options']['wind']['u_ref'])
        _b_ref = float(np.asarray(options['processed']['geometry']['b_ref']))
        _T_est = float(_derived.estimate_time_period(options, arch))
        avg_row_scale = max(
            0.5 * _b_ref * _gs * 1.225 * _u_ref ** 2 * _T_est
            * arch.number_of_kites,
            float(_derived.estimate_aero_force(options)))
        a_theta_slice = layout.slices['theta']['a']
        a_scale = float(model.scaling['theta'][a_theta_slice][0])
        reelout_mask = jnp.asarray((phase_idx == 0).astype(float)) \
            if single_reelout else jnp.ones(n_k)
    n_eq_total = cursor

    radau = (scheme == 'radau')

    def terminal_x(V):
        if radau:
            return vstruct.get_coll_x(V)[n_k - 1, d - 1]
        return vstruct.get_x_all(V)[n_k]

    def eq_fn(V, P):
        phi = vstruct.get_phi(V)
        theta0 = P['theta0']
        shooting, coll_vecs = assemble_nodes(V)

        res = []
        X = vstruct.get_x_all(V)
        if integral_names:
            ref_x0 = vstruct.get_x_all(P['ref'])[0]
            rows = []
            for name in integral_names:
                sl = layout.slices['x'][name]
                rows.append(X[0][sl] - ref_x0[sl])
            res.append(jnp.concatenate(rows))

        if not poly_u:
            eq_sh = jax.vmap(model.eq_fn, in_axes=(0, None, None))(shooting, phi, theta0)
            res.append(eq_sh[:, keep_rows_j].reshape(-1))

        eq_coll = jax.vmap(model.eq_fn, in_axes=(0, None, None))(coll_vecs, phi, theta0)
        res.append(eq_coll.reshape(-1))

        # continuity: x_{k+1} = sum_j cont_j * Xstack[k, j]
        CX = vstruct.get_coll_x(V)
        X_stack = jnp.concatenate([X[:n_k, None, :], CX], axis=1)
        xf = jnp.einsum('j,kjn->kn', cont, X_stack)
        res.append((X[1:] - xf).reshape(-1))

        if periodic:
            diff = X[0] - terminal_x(V)
            res.append(diff[periodic_idx])

        # xi-parameterized boundary pins (operation.py:122-160, 326-356)
        if conds['param_initial']:
            xi_0 = vstruct.get_xi(V)[0]
            x_pin = op.interp_table(table_init, xi_0)
            res.append((X[0] - x_pin)[param_keep])
        if conds['param_terminal']:
            xi_f = vstruct.get_xi(V)[1]
            x_pin = op.interp_table(table_term, xi_f)
            res.append(terminal_x(V) - x_pin)
        if conds['initial'] and traj['type'] == 'launch':
            ref_x0 = vstruct.get_x_all(P['ref'])[0]
            res.append(X[0] - ref_x0)

        if averaged_induction:
            F_nodes, WdA_nodes = jax.vmap(
                model.avg_induction_fn, in_axes=(0, None, None))(
                    coll_vecs, phi, theta0)
            tfk = tf_per_k(V)
            # per-interval quadrature over the reelout phase
            # (Integral_outputs at the switch node, ocp/constraints.py:113-115)
            Fk = (F_nodes.reshape(n_k, d) @ int_w) * h * tfk * reelout_mask
            Wk = (WdA_nodes.reshape(n_k, d) @ int_w) * h * tfk * reelout_mask
            T = time_period(V)
            a_scaled = vstruct.get_theta(V, 'a')[0]
            a = a_scaled * a_scale
            expr = (Fk.sum() / T - 4. * a * (1. - a) * Wk.sum()) / avg_row_scale
            # gamma-homotopy blend: while the fictitious-force relaxation is
            # active (gamma=1) the constraint just pins a at its initial
            # guess; the physical momentum balance takes over as gamma -> 0
            # (the iota pattern of induction.py:76-101, needed because the
            # early homotopy trajectory is physically meaningless)
            gamma_h = phi[PHI_NAMES.index('gamma')]
            trivial = a_scaled - 1.0
            res.append(jnp.array([gamma_h * trivial + (1. - gamma_h) * expr]))

        return jnp.concatenate(res)

    # --- inequality layout --------------------------------------------------
    ineq_slices: Dict[str, slice] = {}
    icursor = 0

    def add_ineq(name, dim):
        nonlocal icursor
        ineq_slices[name] = slice(icursor, icursor + dim)
        icursor += dim

    # zoh: path inequalities bind at the n_k shooting nodes; poly: at the
    # n_k*d collocation nodes (ocp/constraints.py:263-268). Receding-horizon
    # 'mpc' problems drop the k=0 rows: the initial state is PINNED to the
    # measurement, which may sit on/over a path limit — keeping those rows
    # would make the NLP infeasible (reference pmpc.py:119-131 deletes them)
    mpc_skip_k0 = (traj_type_is_mpc := traj['type'] == 'mpc') and not poly_u
    n_path_nodes = n_k * d if poly_u else (n_k - 1 if mpc_skip_k0 else n_k)
    add_ineq('path', n_path_nodes * n_ineq_model)
    if single_reelout:
        add_ineq('t_f_bounds', 2)
    if conds['terminal_inequalities']:
        add_ineq('terminal_position', 1 + arch.number_of_kites)
    n_ineq_total = icursor

    tf_bounds = options['model']['system_bounds']['theta']['t_f']

    def ineq_fn(V, P):
        phi = vstruct.get_phi(V)
        theta0 = P['theta0']
        shooting, coll_vecs = assemble_nodes(V)
        path_nodes = coll_vecs if poly_u else (
            shooting[1:] if mpc_skip_k0 else shooting)
        res = []
        if n_ineq_model:
            path = jax.vmap(model.ineq_fn, in_axes=(0, None, None))(path_nodes, phi, theta0)
            res.append(path.reshape(-1))
        else:
            res.append(jnp.zeros(0))
        if single_reelout:
            T = time_period(V)
            scale = nlp_opts['phase_fix_reelout']
            res.append(jnp.array([(T - tf_bounds[1]) / scale,
                                  (tf_bounds[0] - T) / scale]))
        if conds['terminal_inequalities']:
            # eta-homotopy blend: the landing radii start VIOLATED by the
            # orbit-shaped initial guess (the feasible set of the 'initial'
            # step would be empty); the rows switch on as eta walks 1 -> 0
            # (the iota pattern of induction.py:76-101)
            eta = phi[PHI_NAMES.index('eta')]
            rows = op.terminal_position_inequality(
                options, model, terminal_x(V))
            res.append((1. - eta) * rows)
        return jnp.concatenate(res)

    # --- objective ----------------------------------------------------------
    # category id per model-variable entry (objective.py:119-142)
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
    cat_mask_matrix = jnp.asarray(np.stack([cat_masks[c] for c in REG_CATEGORIES]))

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

    e_slice_in_x = layout.slices['x']['e'] if layout.has('x', 'e') else None
    kite_dof = model.cfg['kite_dof']
    traj_type = traj['type']

    # energy bookkeeping: as a state (integral_outputs=False, the reference
    # 'constraints' integration path) or as a collocation quadrature of the
    # instantaneous power output (integral_outputs=True,
    # ocp/collocation.py:349 + discretization.py:351-353)
    e_scale_proc = options['processed']['scaling']['x'].get('e')
    e_quad_scale = float(np.asarray(e_scale_proc).ravel()[0]) \
        if e_scale_proc is not None else 1.0

    def e_final_scaled(V, P):
        if e_slice_in_x is not None:
            return vstruct.get_x_all(V)[n_k][e_slice_in_x][0]
        phi = vstruct.get_phi(V)
        _, coll_vecs = assemble_nodes(V)
        p_nodes = jax.vmap(model.power_fn, in_axes=(0, None, None))(
            coll_vecs, phi, P['theta0'])             # SI watts per node
        tfk = tf_per_k(V)
        ek = (p_nodes.reshape(n_k, d) @ int_w) * h * tfk
        return ek.sum() / e_quad_scale

    e_state_scale = float(model.scaling['x'][e_slice_in_x][0]) \
        if e_slice_in_x is not None else e_quad_scale

    def e_final_si(V, P):
        return e_final_scaled(V, P) * e_state_scale

    # beta extraction per collocation node for the beta cost (6-DOF only)
    if kite_dof == 6:
        from ..model.aero import kite_aero as _ka

        def beta_at_node(vec, theta0):
            si = model.to_si(vec)
            betas = []
            for kite in arch.kite_nodes:
                label = arch.node_label(kite)
                kite_dcm = si['x']['r' + label].reshape(3, 3)
                vec_u = _ka.get_u_eff_earth(model.cfg, si, theta0, arch, kite)
                betas.append(_ka.get_beta(vec_u, kite_dcm))
            return jnp.stack(betas)

    int_w_tiled = jnp.tile(int_w, n_k)   # (n_k*d,) quadrature weight per node

    def cost_components(V, P):
        phi = vstruct.get_phi(V)
        theta0 = P['theta0']
        _, coll_vecs = assemble_nodes(V)
        coll_refs = assemble_ref_nodes(P['ref'])

        weights = P['weights']
        diffsq = weights[None, :] * (coll_vecs - coll_refs) ** 2   # (N, nv)
        per_cat_per_node = diffsq @ cat_mask_matrix.T               # (N, ncat)
        cat_sums = int_w_tiled @ per_cat_per_node                   # (ncat,)

        comp = {}
        for i, cat in enumerate(REG_CATEGORIES):
            comp[cat + '_cost'] = P['cost'][cat] / normalization[cat] * cat_sums[i]

        for i, name in enumerate(PHI_NAMES):
            comp[name + '_cost'] = P['cost'][name] * phi[i]

        T = time_period(V)
        T_ref = time_period(P['ref'])
        comp['time_cost'] = P['cost']['t_f'] * (T - T_ref) ** 2

        comp['power_cost'] = P['cost']['power'] * (-1.) * e_final_scaled(V, P) / T

        if kite_dof == 6:
            betas = jax.vmap(beta_at_node, in_axes=(0, None))(coll_vecs, theta0)
            beta_sq = jnp.sum(betas ** 2, axis=1)
            comp['beta_cost'] = P['cost']['beta'] / normalization['beta'] \
                * (int_w_tiled @ beta_sq)
        else:
            comp['beta_cost'] = 0.

        comp['tracking_problem_cost'] = comp['tracking_cost']
        comp['power_problem_cost'] = comp['power_cost']
        comp['general_problem_cost'] = (
            comp['fictitious_cost'] + comp['u_regularisation_cost']
            + comp['xdot_regularisation_cost'] + comp['theta_regularisation_cost']
            + comp['beta_cost'] + comp['time_cost'])
        comp['homotopy_cost'] = sum(comp[name + '_cost'] for name in PHI_NAMES)

        # landing/transition terminal costs (objective.py:301-337)
        x_term = terminal_x(V)
        vel_sq = 0.
        pos_sq = 0.
        n_q = 0
        for name in layout.names('x'):
            if name.startswith('q'):
                sl = layout.slices['x'][name]
                s_val = model.scaling['x'][sl]
                pos_sq = pos_sq + jnp.sum((x_term[sl] * s_val) ** 2)
                n_q += 1
            elif name.startswith('dq'):
                sl = layout.slices['x'][name]
                s_val = model.scaling['x'][sl]
                vel_sq = vel_sq + jnp.sum((x_term[sl] * s_val) ** 2)
        form_nl = options['formulation']['nominal_landing']
        comp['nominal_landing_cost'] = P['cost']['nominal_landing'] * (
            form_nl['velocity_weight'] * vel_sq / max(n_q, 1)
            + form_nl['position_weight'] * pos_sq / max(n_q, 1))
        comp['transition_cost'] = P['cost']['transition'] * (
            comp['xdot_regularisation_cost'] + comp['u_regularisation_cost'])
        return comp

    def f_fn(V, P):
        comp = cost_components(V, P)
        phi = vstruct.get_phi(V)
        psi = phi[PHI_NAMES.index('psi')]
        if traj_type == 'power_cycle':
            objective = psi * comp['tracking_problem_cost'] \
                + (1. - psi) * comp['power_problem_cost'] \
                + comp['general_problem_cost'] + comp['homotopy_cost']
        elif traj_type in ('tracking', 'mpc', 'transition', 'nominal_landing',
                           'compromised_landing', 'launch'):
            # homotopy blend of objective.py:445-450: tracking fades out
            # through upsilon*nu*eta*psi, the landing/transition costs fade
            # in through (1-eta) / (1-upsilon)
            upsilon = phi[PHI_NAMES.index('upsilon')]
            nu_h = phi[PHI_NAMES.index('nu')]
            eta = phi[PHI_NAMES.index('eta')]
            objective = upsilon * nu_h * eta * psi * comp['tracking_problem_cost'] \
                + (1. - psi) * comp['power_problem_cost'] \
                + (1. - eta) * comp['nominal_landing_cost'] \
                + (1. - upsilon) * comp['transition_cost'] \
                + comp['general_problem_cost'] + comp['homotopy_cost']
        else:
            raise NotImplementedError(f'trajectory type {traj_type}')
        return objective

    def outputs_on_coll(V, P):
        phi = vstruct.get_phi(V)
        theta0 = P['theta0']
        _, coll_vecs = assemble_nodes(V)
        return jax.vmap(model.outputs_fn, in_axes=(0, None, None))(
            coll_vecs, phi, theta0)

    def outputs_on_shooting(V, P):
        """Model outputs at the nodes where path inequalities are enforced:
        the n_k shooting nodes under zoh, the collocation nodes under poly
        (ocp/constraints.py:263-268)."""
        phi = vstruct.get_phi(V)
        theta0 = P['theta0']
        shooting, coll_vecs = assemble_nodes(V)
        nodes = coll_vecs if poly_u else shooting
        return jax.vmap(model.outputs_fn, in_axes=(0, None, None))(
            nodes, phi, theta0)

    ocp = OCP(model=model, vstruct=vstruct, coll=coll, options=options,
              n_k=n_k, d=d, phase_idx=phase_idx, switch_kdx=switch_kdx,
              f_fn=f_fn, eq_fn=eq_fn, ineq_fn=ineq_fn,
              eq_slices=eq_slices, ineq_slices=ineq_slices,
              n_eq=n_eq_total, n_ineq=n_ineq_total,
              time_period_fn=time_period, tf_per_k_fn=tf_per_k,
              e_final_si_fn=e_final_si,
              outputs_on_coll_fn=outputs_on_coll,
              outputs_on_shooting_fn=outputs_on_shooting,
              cost_components_fn=cost_components,
              keep_rows=keep_rows, periodic_idx=np.asarray(periodic_idx),
              cat_mask_matrix=np.asarray(cat_mask_matrix),
              normalization=normalization,
              single_reelout=single_reelout, periodic=periodic,
              assemble_nodes_fn=assemble_nodes)

    if with_xi:
        ocp.table_init = np.asarray(table_init) if table_init is not None \
            else None
        ocp.table_term = np.asarray(table_term) if table_term is not None \
            else None
        ocp.table_T_src = table_T_src

    # vortex-wake induction equalities couple time nodes through the
    # wake-shedding history, so they attach at the OCP level (substituting
    # the reference's wake-node fixing constraints,
    # alg_repr_dir/fixing.py:51-180; see aero/vortex/wake.py)
    if model.cfg.get('induction_model') == 'vortex':
        from ..model.aero.vortex.wake import make_vortex_residual_fn
        vortex_fn, n_vortex = make_vortex_residual_fn(ocp)
        eq_slices['vortex_induction'] = slice(n_eq_total,
                                              n_eq_total + n_vortex)
        base_eq_fn = eq_fn

        def eq_fn_with_vortex(V, P):
            return jnp.concatenate([base_eq_fn(V, P), vortex_fn(V, P)])

        ocp.eq_fn = eq_fn_with_vortex
        ocp.n_eq = n_eq_total + n_vortex

    return ocp
