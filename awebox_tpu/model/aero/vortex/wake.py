"""Lifting-line vortex wake with periodic shedding (pure JAX, OCP-level).

TPU-native re-design of /root/reference/awebox/mdl/aero/induction_dir/
vortex_dir/ (~12.6k LoC). The reference lifts every wake-node position
``wx_{kite}_{ring}_{tip}`` and ring strength ``wg_{kite}_{ring}`` as
algebraic variables at every time node, then pins them with OCP "fixing"
constraints to the convected wingtip positions at the shedding times
(alg_repr_dir/fixing.py:51-180). That lifting exists to give CasADi/IPOPT
sparsity; under JAX the fixing constraints are *linear gathers*, so this
implementation substitutes them exactly:

    wake node (kite, tip, ring r) observed at time t of interval m
        = wingtip(kite, tip) at shooting node (m - r) mod n_k
          + u_wind(shed altitude) * (t - t_shed)       [rigid convection]

    ring strength r = circulation at the shedding node (instantaneous) or
    the period-average circulation (default 'averaged',
    opts/default.py:133).

No wake variables or fixing constraints enter the NLP at all — only the
per-kite induced velocity ``ui`` stays lifted (degree_of_induced_velocity_
lifting = 1, opts/default.py:139). The induced-velocity evaluation is one
batched all-pairs Biot-Savart kernel (elements x observers) per time node,
vmapped over the horizon (filaments.py).

Element bookkeeping per kite: bound filament at the current wingtips,
near-wake trailing + shed filament rings (wake_objects_dir/near_wake.py),
far wake as semi-infinite filaments along the wind direction
(far_wake.py, far_wake_element_type='semi_infinite_filament').
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import kite_aero
from ... import atmosphere, wind
from . import filaments as fil


def kite_wake_quantities(cfg, si, theta0, arch):
    """Per-kite (tip_minus, tip_plus, circulation, q_obs) at one time node.

    Wingtips sit at q +/- (b_ref/2) ehat_span with ehat_span the second DCM
    axis; circulation from the lifting-line relation
    f_aero = rho b_ref (u_eff x Gamma ehat_span), solved in least squares.
    """
    b_ref = theta0['geometry']['b_ref']
    out = {}
    f_earth, _, _ = kite_aero.forces_and_outputs(cfg, si, theta0, arch)
    for kite in arch.kite_nodes:
        label = arch.node_label(kite)
        q = si['x']['q' + label]
        if cfg['kite_dof'] == 6:
            dcm = si['x']['r' + label].reshape(3, 3)
        else:
            dcm = kite_aero.get_kite_dcm_3dof(cfg, si, theta0, arch, kite)
        ehat_span = dcm[:, 1]
        tip_m = q - 0.5 * b_ref * ehat_span
        tip_p = q + 0.5 * b_ref * ehat_span

        u_eff = kite_aero.get_u_eff_earth(cfg, si, theta0, arch, kite)
        rho = atmosphere.get_density(
            cfg['atmosphere_model'], theta0['atmosphere'], q[2])
        w = jnp.cross(u_eff, ehat_span)
        gamma = (f_earth[kite] @ w) / (rho * b_ref * (w @ w) + 1e-8)

        u_conv = wind.get_velocity(cfg['wind_model'], theta0['wind'], q[2])
        out[kite] = {'tip_m': tip_m, 'tip_p': tip_p, 'gamma': gamma,
                     'q_obs': q, 'u_conv': u_conv}
    return out


def shed_schedule(m_obs, t_obs, t_nodes, n_k, n_rings, T_period):
    """Ring r of the wake anchors on shooting node (m_obs - r) mod n_k;
    dt = age of the shed sheet at observation time (wraps by one period)."""
    rings = jnp.arange(n_rings)
    shed_idx = jnp.mod(m_obs - rings, n_k)                    # (R,)
    t_shed = jnp.take(t_nodes, shed_idx)
    dt = t_obs - t_shed
    dt = jnp.where(rings > m_obs, dt + T_period, dt)
    dt = jnp.maximum(dt, 0.)
    return shed_idx, dt


def convected_wake_nodes(tm, tp, uc, shed_idx, dt):
    """Rigidly convected wake-node positions for one kite: wingtip at the
    shedding node plus freestream drift over the sheet age."""
    uc_shed = jnp.take(uc, shed_idx, axis=0)
    node_m = jnp.take(tm, shed_idx, axis=0) + uc_shed * dt[:, None]
    node_p = jnp.take(tp, shed_idx, axis=0) + uc_shed * dt[:, None]
    return node_m, node_p


def ring_strengths(gm, shed_idx, strength_mode):
    if strength_mode == 'averaged':
        return jnp.full(shed_idx.shape, jnp.mean(gm))
    return jnp.take(gm, shed_idx)


def build_filament_set(cfg, theta0, kites, tips_m, tips_p, gammas, u_convs,
                       t_nodes, t_obs, m_obs, n_k, wake_nodes, T_period,
                       lifted_nodes=None):
    """Assemble the full wake element set for one observation time.

    tips_m/tips_p/gammas/u_convs: per-kite arrays over shooting nodes
    (n_k, 3)/(n_k,). Ring r of the wake anchors on shooting node
    (m_obs - r) mod n_k, convected by dt = t_obs - t_shed (ages wrap by one
    period under periodicity). m_obs may be a traced integer — all gathers
    are dynamic takes, so the whole constructor vmaps over observation
    nodes. Returns (FiniteFilaments, SemiInfiniteFilaments).
    """
    r_core = cfg['vortex_core_to_chord_ratio'] * theta0['geometry']['c_ref']
    strength_mode = cfg['vortex_strength_mode']
    n_rings = wake_nodes

    x_starts, x_ends, strengths = [], [], []
    s_starts, s_lhats, s_strengths = [], [], []
    cyl_rows = []          # far-wake cylinders (per kite, per wingtip)

    shed_idx, dt = shed_schedule(m_obs, t_obs, t_nodes, n_k, n_rings,
                                 T_period)

    for ki, kite in enumerate(kites):
        tm = tips_m[ki]      # (n_k, 3)
        tp = tips_p[ki]
        gm = gammas[ki]      # (n_k,)
        uc = u_convs[ki]     # (n_k, 3)

        if lifted_nodes is not None:
            # state (diff) representation: wake nodes and ring strengths are
            # NLP variables (pinned to their convected values by fixing
            # rows); the Biot-Savart assembly consumes the LIFTED values
            node_m, node_p, g_ring = lifted_nodes[ki]
        else:
            node_m, node_p = convected_wake_nodes(tm, tp, uc, shed_idx, dt)
            g_ring = ring_strengths(gm, shed_idx, strength_mode)

        # bound filament at the current kite position (ring 0 anchor)
        x_starts.append(node_m[0:1])
        x_ends.append(node_p[0:1])
        strengths.append(g_ring[0:1])

        if n_rings > 1:
            # trailing filaments: tip+ leg runs downstream (node r ->
            # node r+1), tip- leg runs upstream; both carry the ring
            # strength of the sheet shed in that interval
            x_starts.append(node_p[:-1])
            x_ends.append(node_p[1:])
            strengths.append(g_ring[:-1])

            x_starts.append(node_m[1:])
            x_ends.append(node_m[:-1])
            strengths.append(g_ring[:-1])

            # shed (spanwise) filaments close consecutive rings; they carry
            # the circulation difference and vanish under 'averaged'
            x_starts.append(node_m[1:])
            x_ends.append(node_p[1:])
            strengths.append(g_ring[1:] - g_ring[:-1])

        if cfg['vortex_far_wake'] == 'semi_infinite_filament':
            l_hat = jnp.array([1., 0., 0.])
            s_starts.append(node_p[-1][None, :])
            s_lhats.append(l_hat[None, :])
            s_strengths.append(g_ring[-1:])
            s_starts.append(node_m[-1][None, :])
            s_lhats.append(l_hat[None, :])
            s_strengths.append(-g_ring[-1:])
        elif cfg['vortex_far_wake'] == 'semi_infinite_right_cylinder':
            # helix-averaged far wake: per wingtip one tangential +
            # longitudinal vorticity cylinder along the wind direction
            # (wake_objects_dir/far_wake.py:154-223); center/pitch/rotation
            # sense computed from the orbit data instead of the reference's
            # lifted wx_center/wh variables
            l_hat = jnp.array([1., 0., 0.])
            eps_r = cfg['vortex_epsilon_r']
            eps_m = cfg['vortex_epsilon_m']
            q_nodes = 0.5 * (tm + tp)                       # (n_k, 3)
            x_center = jnp.mean(q_nodes, axis=0)
            u_conv_mean = jnp.mean(uc, axis=0)
            pitch = jnp.maximum(u_conv_mean @ l_hat, 1e-6) * T_period
            rel = q_nodes - x_center
            cross_sum = jnp.sum(jnp.cross(rel[:-1], rel[1:]), axis=0)
            direction = jnp.tanh((cross_sum @ l_hat)
                                 / (jnp.sum(rel[0] ** 2) + 1e-8))
            g_last = g_ring[-1]
            for node_last, tip_dir in ((node_m[-1], -1.), (node_p[-1], 1.)):
                vec = node_last - x_center
                l_st = vec @ l_hat
                radial = vec - l_st * l_hat
                radius = jnp.sqrt(radial @ radial + eps_r ** 2)
                cyl_rows.append((
                    x_center, l_hat, radius, l_st,
                    -g_last / pitch * direction * tip_dir,
                    g_last / (2. * jnp.pi * radius) * tip_dir))

    x_start = jnp.concatenate(x_starts)
    finite = fil.FiniteFilaments(
        x_start=x_start,
        x_end=jnp.concatenate(x_ends),
        r_core=jnp.full(x_start.shape[:-1], r_core),
        strength=jnp.concatenate(strengths))
    semi = None
    if s_starts:
        s_start = jnp.concatenate(s_starts)
        semi = fil.SemiInfiniteFilaments(
            x_start=s_start,
            l_hat=jnp.concatenate(s_lhats),
            r_core=jnp.full(s_start.shape[:-1], r_core),
            strength=jnp.concatenate(s_strengths))
    cyls = None
    if cyl_rows:
        eps_r = cfg['vortex_epsilon_r']
        eps_m = cfg['vortex_epsilon_m']
        n_c = len(cyl_rows)
        cyls = fil.SemiInfCylinders(
            x_center=jnp.stack([c[0] for c in cyl_rows]),
            l_hat=jnp.stack([c[1] for c in cyl_rows]),
            radius=jnp.stack([c[2] for c in cyl_rows]),
            l_start=jnp.stack([c[3] for c in cyl_rows]),
            epsilon_m=jnp.full((n_c,), eps_m),
            epsilon_r=jnp.full((n_c,), eps_r),
            tangential_strength=jnp.stack([c[4] for c in cyl_rows]),
            longitudinal_strength=jnp.stack([c[5] for c in cyl_rows]))
    return finite, semi, cyls


def make_vortex_residual_fn(ocp):
    """OCP-level vortex induction equalities.

    Returns (fn, n_rows) where fn(V, P) stacks, for every time node (n_k
    shooting + n_k*d collocation) and kite, the iota-blended residual

        iota * ui + (1 - iota) * (ui - ui_biot_savart) , scaled by 1/u_ref

    replacing induction_dir/induction.py:76-101 + vortex.py:158 +
    alg_repr_dir/fixing.py in a single gather-and-superpose kernel.
    """
    model = ocp.model
    cfg = model.cfg
    arch = model.arch
    layout = model.layout
    vs = ocp.vstruct
    n_k, d = ocp.n_k, ocp.d
    kites = list(arch.kite_nodes)
    wake_nodes = cfg['vortex_wake_nodes']
    degree = int(cfg.get('vortex_degree_lifting', 1))
    from ...system import PHI_NAMES
    iota_idx = PHI_NAMES.index('iota')

    ui_slices = {k: layout.slices['z']['ui' + arch.node_label(k)]
                 for k in kites}
    if degree >= 2:
        uin_slices = {k: layout.slices['z']['uin' + arch.node_label(k)]
                      for k in kites}
        uif_slices = {k: layout.slices['z']['uif' + arch.node_label(k)]
                      for k in kites}
    state_repr = cfg.get('vortex_representation', 'alg') == 'state'
    if state_repr:
        # diff/state representation (reference diff_repr_dir/fixing.py):
        # lifted wake-node positions + ring strengths with fixing rows
        wx_slices = {}
        z_scale = np.asarray(model.scaling['z'])
        for k in kites:
            label = arch.node_label(k)
            wx_slices[k] = [
                (layout.slices['z'][f'wxm{label}_{r}'],
                 layout.slices['z'][f'wxp{label}_{r}'],
                 layout.slices['z'][f'wg{label}_{r}'])
                for r in range(wake_nodes)]

    def node_quantities(vec, theta0):
        si = model.to_si(vec)
        q = kite_wake_quantities(cfg, si, theta0, arch)
        tips_m = jnp.stack([q[k]['tip_m'] for k in kites])
        tips_p = jnp.stack([q[k]['tip_p'] for k in kites])
        gammas = jnp.stack([q[k]['gamma'] for k in kites])
        u_convs = jnp.stack([q[k]['u_conv'] for k in kites])
        q_obs = jnp.stack([q[k]['q_obs'] for k in kites])
        return tips_m, tips_p, gammas, u_convs, q_obs

    tau = np.asarray(ocp.coll.tau_root[1:])  # (d,)

    ui_scale = {k: np.asarray(model.scaling['z'][ui_slices[k]])
                for k in kites}

    def fn(V, P):
        theta0 = P['theta0']
        phi = vs.get_phi(V)
        iota = phi[iota_idx]
        u_ref = theta0['wind']['u_ref']

        shooting, coll_vecs = ocp.assemble_nodes_fn(V)
        # wake history anchors on the shooting nodes
        tips_m, tips_p, gammas, u_convs, q_obs_sh = jax.vmap(
            node_quantities, in_axes=(0, None), out_axes=1)(shooting, theta0)
        # tips_*: (n_kites, n_k, 3); gammas: (n_kites, n_k)

        tf_k = ocp.tf_per_k_fn(V)                      # (n_k,)
        h_k = tf_k / n_k                               # interval durations
        t_nodes = jnp.concatenate([jnp.zeros(1), jnp.cumsum(h_k)])[:n_k]
        T_period = ocp.time_period_fn(V)

        _, _, _, _, q_obs_coll = jax.vmap(
            node_quantities, in_axes=(0, None), out_axes=1)(coll_vecs, theta0)
        # q_obs_coll: (n_kites, n_k*d, 3)

        Z = vs.get_z_all(V)                            # (n_k, nz)
        CZ = vs.get_coll_z(V).reshape(n_k, d, -1)      # (n_k, d, nz)

        # flatten all (1+d)*n_k observation nodes: shooting first, then coll
        m_all = jnp.concatenate([jnp.arange(n_k),
                                 jnp.repeat(jnp.arange(n_k), d)])
        t_all = jnp.concatenate([
            t_nodes,
            (t_nodes[:, None] + jnp.asarray(tau)[None, :]
             * h_k[:, None]).reshape(-1)])
        z_all = jnp.concatenate([Z, CZ.reshape(n_k * d, -1)])
        q_obs_all = jnp.concatenate([q_obs_sh, q_obs_coll], axis=1)
        # q_obs_all: (n_kites, N, 3) with N = n_k*(1+d)

        def one_node(t_obs, m_obs, z_vec, q_obs_nodes):
            lifted = None
            rows = []
            if state_repr:
                shed_idx, dt_sched = shed_schedule(
                    t_obs=t_obs, m_obs=m_obs, t_nodes=t_nodes, n_k=n_k,
                    n_rings=wake_nodes, T_period=T_period)
                lifted = []
                for ki, kite in enumerate(kites):
                    nm, npl, gr = [], [], []
                    for (slm, slp, slg) in wx_slices[kite]:
                        nm.append(z_vec[slm.start:slm.stop]
                                  * z_scale[slm.start:slm.stop])
                        npl.append(z_vec[slp.start:slp.stop]
                                   * z_scale[slp.start:slp.stop])
                        gr.append(z_vec[slg.start] * z_scale[slg.start])
                    node_m = jnp.stack(nm)
                    node_p = jnp.stack(npl)
                    g_ring = jnp.stack(gr)
                    lifted.append((node_m, node_p, g_ring))
                    # fixing rows: lifted values == convected values
                    conv_m, conv_p = convected_wake_nodes(
                        tips_m[ki], tips_p[ki], u_convs[ki], shed_idx,
                        dt_sched)
                    g_tgt = ring_strengths(gammas[ki], shed_idx,
                                           cfg['vortex_strength_mode'])
                    sl0 = wx_slices[kite][0][0]
                    wx_sc = z_scale[sl0.start:sl0.stop]          # (3,)
                    wg_sc = z_scale[wx_slices[kite][0][2].start]
                    rows.append(((node_m - conv_m) / wx_sc).reshape(-1))
                    rows.append(((node_p - conv_p) / wx_sc).reshape(-1))
                    rows.append((g_ring - g_tgt) / wg_sc)
            finite, semi, cyls = build_filament_set(
                cfg, theta0, kites, tips_m, tips_p, gammas, u_convs,
                t_nodes, t_obs, m_obs, n_k, wake_nodes, T_period,
                lifted_nodes=lifted)
            for ki, kite in enumerate(kites):
                sl = ui_slices[kite]
                ui = z_vec[sl.start:sl.stop] * ui_scale[kite]
                u_near = fil.total_induction(finite, None, q_obs_nodes[ki])
                u_far = fil.total_induction(None, semi, q_obs_nodes[ki],
                                            cylinders=cyls)
                if degree >= 2:
                    # substructure fixing rows + linear superposition row
                    sln = uin_slices[kite]
                    slf = uif_slices[kite]
                    uin = z_vec[sln.start:sln.stop] * ui_scale[kite]
                    uif = z_vec[slf.start:slf.stop] * ui_scale[kite]
                    rows.append((iota * uin
                                 + (1. - iota) * (uin - u_near)) / u_ref)
                    rows.append((iota * uif
                                 + (1. - iota) * (uif - u_far)) / u_ref)
                    rows.append((ui - uin - uif) / u_ref)
                else:
                    ui_model = u_near + u_far
                    rows.append((iota * ui
                                 + (1. - iota) * (ui - ui_model)) / u_ref)
            return jnp.concatenate(rows)

        res = jax.vmap(one_node, in_axes=(0, 0, 0, 1))(
            t_all, m_all, z_all, q_obs_all)
        return res.reshape(-1)

    rows_per_kite = 9 if degree >= 2 else 3
    if cfg.get('vortex_representation', 'alg') == 'state':
        # per ring: 3 (wxm fixing) + 3 (wxp fixing) + 1 (wg fixing)
        rows_per_kite += 7 * wake_nodes
    n_rows = rows_per_kite * len(kites) * n_k * (1 + d)
    return fn, n_rows


def fill_state_z_guess(ocp, V):
    """Initialize the state-representation wake variables of a guess vector:
    every node's lifted wxm/wxp/wg gets its convected-value target, so the
    fixing rows start at zero residual (the reference needs
    diff_repr_dir/initialization.py for the same purpose)."""
    model = ocp.model
    cfg = model.cfg
    arch = model.arch
    layout = model.layout
    vs = ocp.vstruct
    n_k, d = ocp.n_k, ocp.d
    kites = list(arch.kite_nodes)
    wake_nodes = cfg['vortex_wake_nodes']
    theta0 = model.theta0_init
    V = np.array(V, dtype=float)
    Vj = jnp.asarray(V)

    def node_quantities(vec):
        si = model.to_si(vec)
        q = kite_wake_quantities(cfg, si, theta0, arch)
        return (jnp.stack([q[k]['tip_m'] for k in kites]),
                jnp.stack([q[k]['tip_p'] for k in kites]),
                jnp.stack([q[k]['gamma'] for k in kites]),
                jnp.stack([q[k]['u_conv'] for k in kites]))

    shooting, coll_vecs = ocp.assemble_nodes_fn(Vj)
    tips_m, tips_p, gammas, u_convs = jax.vmap(
        node_quantities, out_axes=1)(shooting)
    tf_k = np.asarray(ocp.tf_per_k_fn(Vj))
    h_k = tf_k / n_k
    t_nodes = np.concatenate([[0.], np.cumsum(h_k)])[:n_k]
    T_period = float(ocp.time_period_fn(Vj))
    tau = np.asarray(ocp.coll.tau_root[1:])
    z_scale = np.asarray(model.scaling['z'])

    def write_node(z_slice_of, t_obs, m_obs):
        shed_idx, dt = shed_schedule(m_obs, t_obs, jnp.asarray(t_nodes),
                                     n_k, wake_nodes, T_period)
        for ki, kite in enumerate(kites):
            node_m, node_p = convected_wake_nodes(
                tips_m[ki], tips_p[ki], u_convs[ki], shed_idx, dt)
            g_ring = ring_strengths(gammas[ki], shed_idx,
                                    cfg['vortex_strength_mode'])
            label = arch.node_label(kite)
            for r in range(wake_nodes):
                for nm, val in ((f'wxm{label}_{r}', node_m[r]),
                                (f'wxp{label}_{r}', node_p[r])):
                    sl = layout.slices['z'][nm]
                    lo = z_slice_of.start + sl.start
                    V[lo:lo + 3] = np.asarray(val) / z_scale[sl.start:sl.stop]
                slg = layout.slices['z'][f'wg{label}_{r}']
                V[z_slice_of.start + slg.start] = (
                    float(g_ring[r]) / z_scale[slg.start])

    for k in range(n_k):
        if vs.u_param in ('zoh', 'ms'):
            write_node(vs.z_slice(k), float(t_nodes[k]), k)
        if vs.u_param != 'ms':
            for j in range(d):
                write_node(vs.coll_z_slice(k, j),
                           float(t_nodes[k] + tau[j] * h_k[k]), k)
    return V


def far_wake_truncation_estimate(trial):
    """Estimated wake-truncation error of a solved vortex trial: the
    kite-averaged far-wake induction magnitude over u_ref, evaluated at every
    shooting node (reference vortex.py:423-428 `est_truncation_error`; gated
    by quality_funcs.py:283 test_tracked_vortex_periods). A large value means
    the semi-infinite far wake still carries significant induction at the
    kite — increase vortex.wake_nodes."""
    ocp = trial.ocp
    model = ocp.model
    cfg = model.cfg
    arch = model.arch
    kites = list(arch.kite_nodes)
    n_k = ocp.n_k
    wake_nodes = cfg['vortex_wake_nodes']

    V = jnp.asarray(np.asarray(trial.solution.V_opt))
    P = trial.solution.P
    theta0 = P['theta0']
    u_ref = float(np.asarray(theta0['wind']['u_ref']))

    def node_quantities(vec):
        si = model.to_si(vec)
        q = kite_wake_quantities(cfg, si, theta0, arch)
        return (jnp.stack([q[k]['tip_m'] for k in kites]),
                jnp.stack([q[k]['tip_p'] for k in kites]),
                jnp.stack([q[k]['gamma'] for k in kites]),
                jnp.stack([q[k]['u_conv'] for k in kites]),
                jnp.stack([q[k]['q_obs'] for k in kites]))

    shooting, _ = ocp.assemble_nodes_fn(V)
    tips_m, tips_p, gammas, u_convs, q_obs = jax.vmap(
        node_quantities, out_axes=1)(shooting)
    tf_k = ocp.tf_per_k_fn(V)
    h_k = tf_k / n_k
    t_nodes = jnp.concatenate([jnp.zeros(1), jnp.cumsum(h_k)])[:n_k]
    T_period = ocp.time_period_fn(V)

    worst = 0.
    for m in range(n_k):
        _, semi, cyls = build_filament_set(
            cfg, theta0, kites, tips_m, tips_p, gammas, u_convs,
            t_nodes, t_nodes[m], m, n_k, wake_nodes, T_period)
        total = 0.
        for ki in range(len(kites)):
            u_far = fil.total_induction(None, semi, q_obs[ki, m],
                                        cylinders=cyls)
            total += float(jnp.linalg.norm(u_far)) / u_ref
        worst = max(worst, total / len(kites))
    return worst
