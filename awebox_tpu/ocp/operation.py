"""Trajectory-type boundary conditions and xi-parameterized boundary
trajectories.

Counterpart of /root/reference/awebox/ocp/operation.py:52-377,
ocp/formulation.py:78-187 and tools/parameterization.py: the trajectory type
determines which boundary conditions attach to the OCP —

    power_cycle / tracking   periodic x(0) = x(T)
    transition               x(0) = init_traj(xi_0),  x(T) = term_traj(xi_f)
    nominal_landing          x(0) = init_traj(xi_0),  terminal position ineq
    compromised_landing      as nominal_landing, with the broken kite's
                             lift coefficient excluded from the pin
    launch                   x(0) = ref(0),           x(T) = term_traj(xi_f)
    mpc                      x(0) = measured (pinned by bounds in Pmpc)

xi_0 / xi_f in [0, 1] are DECISION variables selecting where on the saved
reference trajectory the connection happens. The reference fits 100-point
b-splines per state (parameterization.py:31-70); here the saved trajectory
is resampled to a dense scaled table and interpolated linearly inside jit
(a constant-data gather — no spline objects needed).
"""
from __future__ import annotations

import numpy as np


def conditions(options) -> dict:
    """Which boundary-condition families apply (operation.py:52-88)."""
    traj_type = options['user_options']['trajectory']['type']
    return {
        'periodic': traj_type in ('power_cycle', 'tracking'),
        'param_initial': traj_type in ('transition', 'nominal_landing',
                                       'compromised_landing'),
        'param_terminal': traj_type in ('transition', 'launch'),
        'initial': traj_type in ('launch', 'mpc'),
        'terminal_inequalities': traj_type in ('nominal_landing',
                                               'compromised_landing'),
    }


def load_boundary_table(source, model, n_tab: int = 100):
    """((n_tab, nx) SCALED state table over normalized time theta in [0, 1],
    source period T [s]) from a saved/solved trial (formulation.py:78-187 +
    parameterization.py).

    source: a Trial instance (solved), or a filename saved by Trial.save.
    States present in the source map by name; states absent (e.g. a larger
    induction variable set) stay at zero.
    """
    if isinstance(source, str):
        from ..api.trial import Trial
        source = Trial.load(source)
    from ..api.postprocessing import interpolate_solution

    plot_dict = interpolate_solution(source, n_tab)
    layout = model.layout
    scaling = model.scaling
    table = np.zeros((n_tab, layout.dims['x']))
    for name, _ in layout.entries['x']:
        sl = layout.slices['x'][name]
        arr = plot_dict['x'].get(name)
        if arr is None:
            continue
        table[:, sl] = arr.T / scaling['x'][sl]
    T_src = float(plot_dict['time_grids']['ip'][-1])
    return table, T_src


def interp_table(table_j, xi):
    """C1 cubic-Hermite (Catmull-Rom) interpolation of a (n_tab, nx) table
    at xi in [0, 1] — the jit-side replacement of the reference's b-spline
    evaluation (parameterization.py:31-70). Piecewise-LINEAR interpolation
    has jacobian jumps at every breakpoint, which stalls the interior-point
    line search whenever the xi iterate crosses one."""
    import jax.numpy as jnp
    n_tab = table_j.shape[0]
    s = jnp.clip(xi, 0., 1.) * (n_tab - 1)
    i0 = jnp.clip(jnp.floor(s).astype(int), 0, n_tab - 2)
    t = s - i0
    y0 = table_j[i0]
    y1 = table_j[i0 + 1]
    # central-difference slopes, one-sided at the table ends
    im = jnp.maximum(i0 - 1, 0)
    ip = jnp.minimum(i0 + 2, n_tab - 1)
    m0 = 0.5 * (y1 - table_j[im]) * jnp.where(i0 > 0, 1., 2.)
    m1 = 0.5 * (table_j[ip] - y0) * jnp.where(i0 + 2 < n_tab, 1., 2.)
    h00 = (1. + 2. * t) * (1. - t) ** 2
    h10 = t * (1. - t) ** 2
    h01 = t ** 2 * (3. - 2. * t)
    h11 = t ** 2 * (t - 1.)
    return h00 * y0 + h10 * m0 + h01 * y1 + h11 * m1


def param_blacklist(options, model) -> np.ndarray:
    """Boolean keep-mask over x entries for the parameterized initial pin;
    compromised landings free the broken kite's lift coefficient
    (operation.py:292-298). Integrated states (e) are excluded: the
    initial_e equality already pins them to the reference, and a second pin
    to table(xi_0) would be rank-deficient at the guess and contradictory
    as soon as xi_0 moves."""
    layout = model.layout
    keep = np.ones(layout.dims['x'], dtype=bool)
    if layout.has('x', 'e'):
        keep[layout.slices['x']['e']] = False
    for name in layout.names('x'):
        if name.startswith('w') or name.startswith('dw'):
            keep[layout.slices['x'][name]] = False
    traj = options['user_options']['trajectory']
    if traj['type'] == 'compromised_landing':
        scenario, broken_kite = traj['compromised_landing']['emergency_scenario']
        if scenario == 'structural_damages':
            label = model.arch.node_label(int(broken_kite))
            if layout.has('x', 'coeff' + label):
                keep[layout.slices['x']['coeff' + label]] = False
    return keep


def terminal_position_inequality(options, model, x_term_si_scaled):
    """Landing terminal inequalities (operation.py:360-377): squared node
    distances from the ground station under radius caps, normalized by the
    main-node radius. x is SCALED; positions are unscaled inside."""
    import jax.numpy as jnp
    layout = model.layout
    arch = model.arch
    form = options['formulation']['nominal_landing']
    main_r = form['main_node_radius']
    kite_r = form['kite_node_radius']

    q_sl = layout.slices['x']['q10']
    q10 = x_term_si_scaled[q_sl] * model.scaling['x'][q_sl]
    rows = [(q10 @ q10 - main_r ** 2) / main_r ** 2]
    for kite in arch.kite_nodes:
        sl = layout.slices['x']['q' + arch.node_label(kite)]
        qk = x_term_si_scaled[sl] * model.scaling['x'][sl]
        rows.append((qk @ qk - kite_r ** 2) / main_r ** 2)
    return jnp.stack(rows)
