"""Plot registry and dispatch.

Compact counterpart of /root/reference/awebox/viz/visualization.py:52-210:
a flag -> plot-function registry over the interpolated plot_dict. Plots are
matplotlib on host from gathered numpy arrays; figures are returned (and
optionally saved) rather than shown, for headless use.
"""
from __future__ import annotations

from typing import Dict, List


def _require_mpl():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def plot_states(plot_dict, fig_name='states'):
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    names = list(plot_dict['x'].keys())
    fig, axes = plt.subplots(len(names), 1, figsize=(10, 2 * len(names)),
                             sharex=True)
    if len(names) == 1:
        axes = [axes]
    for ax, name in zip(axes, names):
        arr = plot_dict['x'][name]
        for i in range(arr.shape[0]):
            ax.plot(t, arr[i], label=f'{name}[{i}]' if arr.shape[0] > 1 else name)
        ax.legend(loc='upper right', fontsize=7)
        ax.grid(True)
    axes[-1].set_xlabel('t [s]')
    fig.suptitle(fig_name)
    return fig


def plot_controls(plot_dict, fig_name='controls'):
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    names = list(plot_dict['u'].keys())
    fig, axes = plt.subplots(max(len(names), 1), 1,
                             figsize=(10, 2 * max(len(names), 1)), sharex=True)
    if len(names) <= 1:
        axes = [axes]
    for ax, name in zip(axes, names):
        arr = plot_dict['u'][name]
        for i in range(arr.shape[0]):
            ax.step(t, arr[i], where='post',
                    label=f'{name}[{i}]' if arr.shape[0] > 1 else name)
        ax.legend(loc='upper right', fontsize=7)
        ax.grid(True)
    axes[-1].set_xlabel('t [s]')
    fig.suptitle(fig_name)
    return fig


def plot_isometric(plot_dict, arch, fig_name='isometric'):
    plt = _require_mpl()
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection='3d')
    for node in range(1, arch.number_of_nodes):
        label = arch.node_label(node)
        q = plot_dict['x'].get('q' + label)
        if q is None:
            continue
        style = '-' if node in arch.kite_nodes else ':'
        ax.plot(q[0], q[1], q[2], style, label='q' + label)
    ax.scatter([0.], [0.], [0.], marker='s', c='k')
    ax.set_xlabel('x [m]')
    ax.set_ylabel('y [m]')
    ax.set_zlabel('z [m]')
    ax.legend()
    fig.suptitle(fig_name)
    return fig


def plot_invariants(plot_dict, arch, fig_name='invariants'):
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    inv = plot_dict['outputs']['invariants']
    fig, ax = plt.subplots(figsize=(10, 4))
    for name, arr in inv.items():
        ax.semilogy(t, abs(arr.T) + 1e-16, label=name)
    ax.legend(fontsize=7)
    ax.grid(True)
    ax.set_xlabel('t [s]')
    fig.suptitle(fig_name)
    return fig


def plot_power(plot_dict, fig_name='power'):
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    p = plot_dict['outputs']['performance']['p_current']
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.plot(t, np.ravel(p) / 1e3)
    ax.axhline(plot_dict['power_and_performance']['avg_power'] / 1e3,
               linestyle='--', color='k', label='average')
    ax.set_ylabel('P [kW]')
    ax.set_xlabel('t [s]')
    ax.grid(True)
    ax.legend()
    fig.suptitle(fig_name)
    return fig


def plot_projected(plot_dict, arch, plane='xy', fig_name=None):
    """2D trajectory projection (viz/trajectory.py projected plots)."""
    plt = _require_mpl()
    ax_idx = {'xy': (0, 1), 'xz': (0, 2), 'yz': (1, 2)}[plane]
    fig, ax = plt.subplots(figsize=(7, 7))
    for node in range(1, arch.number_of_nodes):
        label = arch.node_label(node)
        q = plot_dict['x'].get('q' + label)
        if q is None:
            continue
        style = '-' if node in arch.kite_nodes else ':'
        ax.plot(q[ax_idx[0]], q[ax_idx[1]], style, label='q' + label)
    ax.scatter([0.], [0.], marker='s', c='k')
    ax.set_xlabel(plane[0] + ' [m]')
    ax.set_ylabel(plane[1] + ' [m]')
    ax.set_aspect('equal', adjustable='datalim')
    ax.grid(True)
    ax.legend()
    fig.suptitle(fig_name or f'projected_{plane}')
    return fig


def plot_aero_coefficients(plot_dict, arch, fig_name='aero_coefficients'):
    """CL/CD/alpha/beta/airspeed per kite (viz/output.py aero plots)."""
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    aero = plot_dict['outputs'].get('aerodynamics', {})
    rows = ['CL', 'CD', 'alpha_deg', 'beta_deg', 'airspeed']
    fig, axes = plt.subplots(len(rows), 1, figsize=(10, 2 * len(rows)),
                             sharex=True)
    for ax, base in zip(axes, rows):
        found = False
        for name, arr in aero.items():
            stripped = ''.join(c for c in name if not c.isdigit())
            if stripped == base:
                ax.plot(t, np.ravel(arr), label=name)
                found = True
        if not found:  # fall back to radian alpha/beta outputs
            for name, arr in aero.items():
                if name.startswith(base.split('_')[0]):
                    ax.plot(t, np.ravel(arr), label=name)
        ax.set_ylabel(base)
        ax.grid(True)
        ax.legend(fontsize=7, loc='upper right')
    axes[-1].set_xlabel('t [s]')
    fig.suptitle(fig_name)
    return fig


def plot_algebraic_variables(plot_dict, fig_name='algebraic_variables'):
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    names = list(plot_dict['z'].keys())
    fig, axes = plt.subplots(max(len(names), 1), 1,
                             figsize=(10, 2 * max(len(names), 1)), sharex=True)
    if len(names) <= 1:
        axes = [axes]
    for ax, name in zip(axes, names):
        arr = plot_dict['z'][name]
        for i in range(arr.shape[0]):
            ax.plot(t, arr[i], label=f'{name}[{i}]' if arr.shape[0] > 1 else name)
        ax.legend(loc='upper right', fontsize=7)
        ax.grid(True)
    axes[-1].set_xlabel('t [s]')
    fig.suptitle(fig_name)
    return fig


def plot_constraints(plot_dict, arch, fig_name='constraints'):
    """Operational-envelope time series against their limits
    (reference 'constraints' flag, examples/ampyx_ap2_trajectory.py:86-110)."""
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    fig, axes = plt.subplots(3, 1, figsize=(10, 8), sharex=True)

    lp = plot_dict['outputs'].get('local_performance', {})
    for name, arr in lp.items():
        if name.startswith('tether_force'):
            axes[0].plot(t, np.ravel(arr), label=name)
    axes[0].set_ylabel('tether force [N]')

    aero = plot_dict['outputs'].get('aerodynamics', {})
    for name, arr in aero.items():
        if name.startswith('airspeed'):
            axes[1].plot(t, np.ravel(arr), label=name)
    axes[1].set_ylabel('airspeed [m/s]')

    dl_t = plot_dict['x'].get('dl_t')
    if dl_t is not None:
        axes[2].plot(t, dl_t[0], label='dl_t')
    axes[2].set_ylabel('dl_t [m/s]')
    for ax in axes:
        ax.grid(True)
        ax.legend(fontsize=7, loc='upper right')
    axes[-1].set_xlabel('t [s]')
    fig.suptitle(fig_name)
    return fig


def plot_quad(plot_dict, arch, fig_name='quad'):
    """2x2 overview: isometric, power, tether force, airspeed (reference
    'quad' flag)."""
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    fig = plt.figure(figsize=(12, 10))
    ax3d = fig.add_subplot(2, 2, 1, projection='3d')
    for node in range(1, arch.number_of_nodes):
        label = arch.node_label(node)
        q = plot_dict['x'].get('q' + label)
        if q is not None:
            ax3d.plot(q[0], q[1], q[2],
                      '-' if node in arch.kite_nodes else ':')
    ax3d.set_title('trajectory')

    ax = fig.add_subplot(2, 2, 2)
    p = plot_dict['outputs']['performance']['p_current']
    ax.plot(t, np.ravel(p) / 1e3)
    ax.axhline(plot_dict['power_and_performance']['avg_power'] / 1e3,
               linestyle='--', color='k')
    ax.set_title('P [kW]')
    ax.grid(True)

    ax = fig.add_subplot(2, 2, 3)
    for name, arr in plot_dict['outputs'].get('local_performance', {}).items():
        if name.startswith('tether_force'):
            ax.plot(t, np.ravel(arr), label=name)
    ax.set_title('tether force [N]')
    ax.grid(True)

    ax = fig.add_subplot(2, 2, 4)
    for name, arr in plot_dict['outputs'].get('aerodynamics', {}).items():
        if name.startswith('airspeed'):
            ax.plot(t, np.ravel(arr), label=name)
    ax.set_title('airspeed [m/s]')
    ax.grid(True)
    fig.suptitle(fig_name)
    return fig


def plot_animation_snapshots(plot_dict, arch, fig_name='animation',
                             n_frames=6):
    """Trajectory snapshot montage (viz/animation.py:monitor snapshots):
    kite + tether positions at n_frames instants across the period."""
    plt = _require_mpl()
    n_points = len(plot_dict['time_grids']['ip'])
    frames = np.linspace(0, n_points - 1, n_frames).astype(int)
    fig = plt.figure(figsize=(4 * min(n_frames, 3),
                              4 * int(np.ceil(n_frames / 3))))
    for fi, idx in enumerate(frames):
        ax = fig.add_subplot(int(np.ceil(n_frames / 3)), min(n_frames, 3),
                             fi + 1, projection='3d')
        for node in range(1, arch.number_of_nodes):
            label = arch.node_label(node)
            q = plot_dict['x'].get('q' + label)
            if q is None:
                continue
            # faint full path + current position + tether segment
            ax.plot(q[0], q[1], q[2], color='0.8', linewidth=0.5)
            parent = arch.parent_map[node]
            if parent == 0:
                qp = np.zeros(3)
            else:
                qp_arr = plot_dict['x']['q' + arch.parent_label(node)]
                qp = qp_arr[:, idx]
            ax.plot([qp[0], q[0, idx]], [qp[1], q[1, idx]],
                    [qp[2], q[2, idx]], 'k-', linewidth=1.)
            ax.scatter(q[0, idx], q[1, idx], q[2, idx], c='C0')
        t_now = plot_dict['time_grids']['ip'][idx]
        ax.set_title(f't = {t_now:.1f} s', fontsize=8)
    fig.suptitle(fig_name)
    return fig


import numpy as np  # noqa: E402  (used by plot_power)


def plot_loyd_comparison(plot_dict, arch, fig_name='loyd_comparison'):
    """Actual power vs per-kite Loyd limit (reference output.plot_loyd_
    comparison)."""
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    perf = plot_dict['outputs']['performance']
    fig, axes = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
    axes[0].plot(t, np.ravel(perf['p_current']) / 1e3, label='p_current')
    for name, arr in perf.items():
        if name.startswith('p_loyd'):
            axes[0].plot(t, np.ravel(arr) / 1e3, '--', label=name)
    axes[0].set_ylabel('P [kW]')
    for name in ('loyd_factor', 'phf', 'phf_hubheight'):
        if name in perf:
            axes[1].plot(t, np.ravel(perf[name]), label=name)
    axes[1].set_ylabel('[-]')
    for ax in axes:
        ax.grid(True)
        ax.legend(fontsize=7, loc='upper right')
    axes[-1].set_xlabel('t [s]')
    fig.suptitle(fig_name)
    return fig


def plot_aero_validity(plot_dict, arch, fig_name='aero_dimensionless'):
    """alpha/beta envelope margins (reference output.plot_aero_validity)."""
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    av = plot_dict['outputs'].get('aero_validity', {})
    fig, ax = plt.subplots(figsize=(10, 4))
    for name, arr in av.items():
        ax.plot(t, np.ravel(arr), label=name)
    ax.axhline(0., color='k', linewidth=1.)
    ax.set_ylabel('validity residual (<= 0 feasible)')
    ax.set_xlabel('t [s]')
    ax.grid(True)
    ax.legend(fontsize=7, ncol=2)
    fig.suptitle(fig_name)
    return fig


def animate(plot_dict, arch, fname='animation.gif', n_frames=40, fps=10):
    """True trajectory animation written to a GIF (reference
    viz/animation.py:1-263 animate_monitor_plot): kite + tether drawn frame
    by frame over the interpolated period with the full path underlaid."""
    plt = _require_mpl()
    from matplotlib import animation as mpl_animation

    n_points = len(plot_dict['time_grids']['ip'])
    frames = np.linspace(0, n_points - 1, n_frames).astype(int)
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection='3d')

    paths = {}
    for node in range(1, arch.number_of_nodes):
        q = plot_dict['x'].get('q' + arch.node_label(node))
        if q is not None:
            paths[node] = q
            ax.plot(q[0], q[1], q[2], color='0.85', linewidth=0.5)
    ax.scatter([0.], [0.], [0.], marker='s', c='k')
    ax.set_xlabel('x [m]')
    ax.set_ylabel('y [m]')
    ax.set_zlabel('z [m]')

    tether_lines = {}
    dots = {}
    for node, q in paths.items():
        tether_lines[node], = ax.plot([], [], [], 'k-', linewidth=1.)
        color = 'C0' if node in arch.kite_nodes else 'C7'
        dots[node], = ax.plot([], [], [], 'o', color=color, markersize=5)
    title = ax.set_title('')

    def draw(fi):
        idx = frames[fi]
        artists = []
        for node, q in paths.items():
            parent = arch.parent_map[node]
            qp = np.zeros(3) if parent == 0 else paths[parent][:, idx]
            tether_lines[node].set_data([qp[0], q[0, idx]], [qp[1], q[1, idx]])
            tether_lines[node].set_3d_properties([qp[2], q[2, idx]])
            dots[node].set_data([q[0, idx]], [q[1, idx]])
            dots[node].set_3d_properties([q[2, idx]])
            artists += [tether_lines[node], dots[node]]
        title.set_text(f't = {plot_dict["time_grids"]["ip"][idx]:.1f} s')
        return artists + [title]

    anim = mpl_animation.FuncAnimation(fig, draw, frames=len(frames),
                                       blit=False)
    anim.save(fname, writer=mpl_animation.PillowWriter(fps=fps))
    plt.close(fig)
    return fname


def plot_local_induction_factor(plot_dict, arch,
                                fig_name='local_induction_factor'):
    """Per-kite local induction factor a = -u_ind.xhat/u_ref from the lifted
    induced-velocity (vortex) or induction-factor (actuator) variables
    (reference output.plot_local_induction_factor)."""
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    u_ref = plot_dict.get('u_ref', 1.)
    fig, ax = plt.subplots(figsize=(10, 4))
    found = False
    for name, arr in plot_dict['z'].items():
        if name.startswith('ui') and not name.startswith(('uin', 'uif')):
            ax.plot(t, -arr[0] / u_ref, label=f'a({name})')
            found = True
        elif name.startswith('a_'):
            ax.plot(t, np.ravel(arr), label=name)
            found = True
    if not found:
        raise ValueError('no lifted induction variables in this model '
                         "(induction_model='not_in_use'?)")
    ax.set_ylabel('a [-]')
    ax.set_xlabel('t [s]')
    ax.grid(True)
    ax.legend(fontsize=7)
    fig.suptitle(fig_name)
    return fig


def plot_average_induction_factor(plot_dict, arch,
                                  fig_name='average_induction_factor'):
    """Running time-average of the local induction factor (reference
    output.plot_annulus_average_induction_factor role: the converged average
    is the annulus-average actuator comparison point)."""
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    u_ref = plot_dict.get('u_ref', 1.)
    fig, ax = plt.subplots(figsize=(10, 4))
    found = False
    for name, arr in plot_dict['z'].items():
        if name.startswith('ui') and not name.startswith(('uin', 'uif')):
            a = -arr[0] / u_ref
        elif name.startswith('a_'):
            a = np.ravel(arr)
        else:
            continue
        found = True
        avg = np.cumsum(a) / np.arange(1, len(a) + 1)
        ax.plot(t, avg, label=f'avg a({name})')
        ax.axhline(float(np.mean(a)), linestyle=':', linewidth=0.8)
    if not found:
        raise ValueError('no lifted induction variables in this model')
    ax.set_ylabel('running avg a [-]')
    ax.set_xlabel('t [s]')
    ax.grid(True)
    ax.legend(fontsize=7)
    fig.suptitle(fig_name)
    return fig


def plot_relative_radius(plot_dict, arch, fig_name='relative_radius'):
    """Orbit radius over wingspan varrho = r/b_ref per kite (reference
    output.plot_relative_radius; actuator bar_varrho is its average)."""
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    b_ref = plot_dict['geometry']['b_ref']
    fig, ax = plt.subplots(figsize=(10, 4))
    for kite in arch.kite_nodes:
        label = arch.node_label(kite)
        q = plot_dict['x']['q' + label]
        parent = arch.parent_map[kite]
        qp = np.zeros((3, 1)) if parent == 0 \
            else plot_dict['x']['q' + arch.parent_label(kite)]
        rel = q - qp if parent != 0 else q
        center = rel.mean(axis=1, keepdims=True)
        radius = np.linalg.norm(rel - center, axis=0)
        ax.plot(t, radius / b_ref, label=f'varrho{label}')
    ax.set_ylabel('r / b_ref [-]')
    ax.set_xlabel('t [s]')
    ax.grid(True)
    ax.legend(fontsize=7)
    fig.suptitle(fig_name)
    return fig


def plot_relative_radius_of_curvature(plot_dict, arch,
                                      fig_name='relative_radius_of_curvature'):
    """Path radius of curvature over wingspan R_c/b_ref, from the velocity
    and its finite-difference acceleration (reference
    output.plot_relative_radius_of_curvature)."""
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    b_ref = plot_dict['geometry']['b_ref']
    fig, ax = plt.subplots(figsize=(10, 4))
    for kite in arch.kite_nodes:
        label = arch.node_label(kite)
        dq = plot_dict['x']['dq' + label]
        ddq = np.gradient(dq, t, axis=1)
        speed = np.linalg.norm(dq, axis=0)
        cross = np.cross(dq.T, ddq.T).T
        denom = np.maximum(np.linalg.norm(cross, axis=0), 1e-9)
        r_curv = speed ** 3 / denom
        ax.semilogy(t, r_curv / b_ref, label=f'R_c{label}/b_ref')
    ax.set_ylabel('R_c / b_ref [-]')
    ax.set_xlabel('t [s]')
    ax.grid(True)
    ax.legend(fontsize=7)
    fig.suptitle(fig_name)
    return fig


def plot_circulation(plot_dict, arch, fig_name='circulation'):
    """Per-kite lifting-line circulation estimate Gamma = CL |u| c_ref / 2
    (reference output.plot_circulation; the wake module solves the same
    relation in least squares, aero/vortex/wake.py)."""
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    c_ref = plot_dict['geometry']['c_ref']
    aero = plot_dict['outputs']['aerodynamics']
    fig, ax = plt.subplots(figsize=(10, 4))
    for kite in arch.kite_nodes:
        CL = np.ravel(aero[f'CL{kite}'])
        airspeed = np.ravel(aero[f'airspeed{kite}'])
        gamma = 0.5 * CL * airspeed * c_ref
        ax.plot(t, gamma, label=f'Gamma{kite}')
    ax.set_ylabel('Gamma [m^2/s]')
    ax.set_xlabel('t [s]')
    ax.grid(True)
    ax.legend(fontsize=7)
    fig.suptitle(fig_name)
    return fig


def plot_thrust(plot_dict, arch, fig_name='thrust'):
    """Actuator-disk thrust + thrust coefficient per layer (reference
    output.plot_thrust); needs an actuator-model trial."""
    plt = _require_mpl()
    act = plot_dict['outputs'].get('actuator')
    if not act:
        raise ValueError("thrust plots need induction_model='actuator'")
    t = plot_dict['time_grids']['ip']
    fig, axes = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
    for name, arr in act.items():
        if name.startswith('thrust'):
            axes[0].plot(t, np.ravel(arr), label=name)
        elif name.startswith('ct'):
            axes[1].plot(t, np.ravel(arr), label=name)
    axes[0].set_ylabel('T [N]')
    axes[1].set_ylabel('C_T [-]')
    for ax in axes:
        ax.grid(True)
        ax.legend(fontsize=7)
    axes[-1].set_xlabel('t [s]')
    fig.suptitle(fig_name)
    return fig


def plot_velocity_distribution(plot_dict, arch,
                               fig_name='velocity_distribution'):
    """Apparent-velocity composition per kite: airspeed vs wind at altitude
    vs kite speed (reference viz/wake.py plot_velocity_distribution)."""
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    aero = plot_dict['outputs']['aerodynamics']
    fig, ax = plt.subplots(figsize=(10, 4))
    for kite in arch.kite_nodes:
        label = arch.node_label(kite)
        ax.plot(t, np.ravel(aero[f'airspeed{kite}']),
                label=f'airspeed{kite}')
        dq = plot_dict['x']['dq' + label]
        ax.plot(t, np.linalg.norm(dq, axis=0), '--',
                label=f'|dq{label}|')
    ax.set_ylabel('[m/s]')
    ax.set_xlabel('t [s]')
    ax.grid(True)
    ax.legend(fontsize=7)
    fig.suptitle(fig_name)
    return fig


def _wake_elements_at_node(trial, m_obs=0):
    """Reconstruct the vortex wake element set of a solved trial at shooting
    node m_obs (numpy)."""
    import jax
    import jax.numpy as jnp
    from ..model.aero.vortex import wake as wake_mod

    ocp = trial.ocp
    model = trial.model
    V = jnp.asarray(trial.solution.V_opt)
    P = trial.solution.P
    theta0 = P['theta0']
    arch = model.arch
    kites = list(arch.kite_nodes)

    shooting, _ = ocp.assemble_nodes_fn(V)

    def node_quantities(vec):
        si = model.to_si(vec)
        q = wake_mod.kite_wake_quantities(model.cfg, si, theta0, arch)
        return (jnp.stack([q[k]['tip_m'] for k in kites]),
                jnp.stack([q[k]['tip_p'] for k in kites]),
                jnp.stack([q[k]['gamma'] for k in kites]),
                jnp.stack([q[k]['u_conv'] for k in kites]))

    tips_m, tips_p, gammas, u_convs = jax.vmap(
        node_quantities, out_axes=1)(shooting)
    tf_k = ocp.tf_per_k_fn(V)
    t_nodes = jnp.concatenate([jnp.zeros(1),
                               jnp.cumsum(tf_k / ocp.n_k)])[:ocp.n_k]
    T = ocp.time_period_fn(V)
    return wake_mod.build_filament_set(
        model.cfg, theta0, kites, tips_m, tips_p, gammas, u_convs,
        t_nodes, t_nodes[m_obs], m_obs, ocp.n_k,
        model.cfg['vortex_wake_nodes'], T)


def plot_wake(plot_dict, arch, trial=None, side='isometric',
              fig_name=None):
    """Wake filament drawing at the initial node (reference viz/wake.py
    plot_wake); requires a solved vortex trial."""
    plt = _require_mpl()
    if trial is None or trial.model.cfg.get('induction_model') != 'vortex':
        raise ValueError("wake plots need a solved trial with "
                         "induction_model='vortex'")
    finite, semi, cyls = _wake_elements_at_node(trial, 0)
    xs = np.asarray(finite.x_start)
    xe = np.asarray(finite.x_end)
    g = np.asarray(finite.strength)
    gmax = np.abs(g).max() + 1e-12

    fig = plt.figure(figsize=(8, 8))
    if side == 'isometric':
        ax = fig.add_subplot(projection='3d')
        for i in range(xs.shape[0]):
            ax.plot([xs[i, 0], xe[i, 0]], [xs[i, 1], xe[i, 1]],
                    [xs[i, 2], xe[i, 2]],
                    color=plt.cm.coolwarm(0.5 + 0.5 * g[i] / gmax),
                    linewidth=1.)
        for node in range(1, arch.number_of_nodes):
            q = plot_dict['x'].get('q' + arch.node_label(node))
            if q is not None:
                ax.plot(q[0], q[1], q[2], 'k-', linewidth=0.6)
        ax.set_xlabel('x [m]')
        ax.set_ylabel('y [m]')
        ax.set_zlabel('z [m]')
    else:
        idx = {'xy': (0, 1), 'xz': (0, 2), 'yz': (1, 2)}[side]
        ax = fig.add_subplot()
        for i in range(xs.shape[0]):
            ax.plot([xs[i, idx[0]], xe[i, idx[0]]],
                    [xs[i, idx[1]], xe[i, idx[1]]],
                    color=plt.cm.coolwarm(0.5 + 0.5 * g[i] / gmax),
                    linewidth=1.)
        for node in range(1, arch.number_of_nodes):
            q = plot_dict['x'].get('q' + arch.node_label(node))
            if q is not None:
                ax.plot(q[idx[0]], q[idx[1]], 'k-', linewidth=0.6)
        ax.set_aspect('equal', adjustable='datalim')
        ax.grid(True)
    fig.suptitle(fig_name or f'wake_{side}')
    return fig


def plot_induction_contour(plot_dict, arch, trial=None, n_grid=25,
                           fig_name='induction_contour'):
    """Axial induction-factor contour on the plane normal to the wind
    through the orbit center (reference viz/wake.py:391-443
    plot_induction_contour_on_kmp), evaluated with the batched Biot-Savart
    observer kernel."""
    import jax.numpy as jnp
    from ..model.aero.vortex import filaments as filmod
    plt = _require_mpl()
    if trial is None or trial.model.cfg.get('induction_model') != 'vortex':
        raise ValueError("induction contours need a solved trial with "
                         "induction_model='vortex'")
    finite, semi, cyls = _wake_elements_at_node(trial, 0)

    # orbit center + extent from the first kite's path
    kite = arch.kite_nodes[0]
    q = plot_dict['x']['q' + arch.node_label(kite)]
    center = q.mean(axis=1)
    span = 1.5 * max(q[1].max() - q[1].min(), q[2].max() - q[2].min())
    ys = np.linspace(center[1] - span, center[1] + span, n_grid)
    zs = np.linspace(center[2] - span, center[2] + span, n_grid)
    YY, ZZ = np.meshgrid(ys, zs)
    obs = np.stack([np.full(YY.size, center[0]), YY.ravel(), ZZ.ravel()],
                   axis=1)
    u_ind = np.asarray(filmod.induction_at_observers(
        finite, semi, jnp.asarray(obs), cylinders=cyls))
    u_inf = float(np.asarray(
        trial.solution.P['theta0']['wind']['u_ref']))
    a_grid = (-u_ind[:, 0] / u_inf).reshape(n_grid, n_grid)

    fig, ax = plt.subplots(figsize=(8, 7))
    cs = ax.contourf(YY, ZZ, a_grid, levels=20, cmap='RdBu_r')
    fig.colorbar(cs, ax=ax, label='axial induction factor a [-]')
    ax.plot(q[1], q[2], 'k-', linewidth=1.)
    ax.set_xlabel('y [m]')
    ax.set_ylabel('z [m]')
    ax.set_aspect('equal', adjustable='datalim')
    fig.suptitle(fig_name)
    return fig


def plot_actuator(plot_dict, arch, side='yz', fig_name=None):
    """Actuator annulus sketch from the geometry outputs (reference
    viz/wake.py plot_actuator): kite paths + the swept annulus projected."""
    plt = _require_mpl()
    idx = {'xy': (0, 1), 'xz': (0, 2), 'yz': (1, 2)}[side]
    fig, ax = plt.subplots(figsize=(7, 7))
    for kite in arch.kite_nodes:
        q = plot_dict['x'].get('q' + arch.node_label(kite))
        if q is None:
            continue
        ax.plot(q[idx[0]], q[idx[1]], label='q' + arch.node_label(kite))
        center = q.mean(axis=1)
        radius = np.sqrt(((q[idx[0]] - center[idx[0]]) ** 2
                          + (q[idx[1]] - center[idx[1]]) ** 2)).mean()
        th = np.linspace(0., 2. * np.pi, 100)
        ax.plot(center[idx[0]] + radius * np.cos(th),
                center[idx[1]] + radius * np.sin(th), 'k--', linewidth=0.8)
    ax.set_aspect('equal', adjustable='datalim')
    ax.grid(True)
    ax.legend(fontsize=7)
    fig.suptitle(fig_name or f'actuator_{side}')
    return fig


def plot_outputs_group(plot_dict, arch, group, fig_name=None):
    """Time series of every output in one top-level group (reference
    'outputs:<name>' dynamic flags)."""
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    grp = plot_dict['outputs'].get(group, {})
    n = max(len(grp), 1)
    fig, axes = plt.subplots(n, 1, figsize=(10, 2 * n), sharex=True)
    if n == 1:
        axes = [axes]
    for ax, (name, arr) in zip(axes, sorted(grp.items())):
        arr = np.atleast_2d(np.asarray(arr))
        if arr.shape[0] > arr.shape[-1]:
            arr = arr.T
        for i in range(arr.shape[0]):
            ax.plot(t, arr[i], label=f'{name}[{i}]' if arr.shape[0] > 1
                    else name)
        ax.legend(fontsize=7, loc='upper right')
        ax.grid(True)
    axes[-1].set_xlabel('t [s]')
    fig.suptitle(fig_name or f'outputs:{group}')
    return fig


def _plot_single_var(plot_dict, var_type, name, fig_name=None):
    plt = _require_mpl()
    t = plot_dict['time_grids']['ip']
    arr = plot_dict[var_type][name]
    fig, ax = plt.subplots(figsize=(10, 3))
    for i in range(arr.shape[0]):
        if var_type == 'u':
            ax.step(t, arr[i], where='post', label=f'{name}[{i}]')
        else:
            ax.plot(t, arr[i], label=f'{name}[{i}]')
    ax.grid(True)
    ax.legend(fontsize=7)
    ax.set_xlabel('t [s]')
    fig.suptitle(fig_name or f'{var_type}:{name}')
    return fig


PLOT_REGISTRY = {
    'states': lambda pd, arch: plot_states(pd),
    'controls': lambda pd, arch: plot_controls(pd),
    'isometric': lambda pd, arch: plot_isometric(pd, arch),
    'invariants': lambda pd, arch: plot_invariants(pd, arch),
    'power': lambda pd, arch: plot_power(pd),
    'projected_xy': lambda pd, arch: plot_projected(pd, arch, 'xy'),
    'projected_xz': lambda pd, arch: plot_projected(pd, arch, 'xz'),
    'projected_yz': lambda pd, arch: plot_projected(pd, arch, 'yz'),
    'aero_coefficients': lambda pd, arch: plot_aero_coefficients(pd, arch),
    'algebraic_variables': lambda pd, arch: plot_algebraic_variables(pd),
    'constraints': lambda pd, arch: plot_constraints(pd, arch),
    'quad': lambda pd, arch: plot_quad(pd, arch),
    'animation': lambda pd, arch: plot_animation_snapshots(pd, arch),
    'animation_snapshot': lambda pd, arch: plot_animation_snapshots(
        pd, arch, n_frames=1),
    'loyd_comparison': lambda pd, arch: plot_loyd_comparison(pd, arch),
    'aero_dimensionless': lambda pd, arch: plot_aero_validity(pd, arch),
    'actuator_isometric': lambda pd, arch: plot_actuator(pd, arch, 'yz'),
    'actuator_xy': lambda pd, arch: plot_actuator(pd, arch, 'xy'),
    'actuator_xz': lambda pd, arch: plot_actuator(pd, arch, 'xz'),
    'actuator_yz': lambda pd, arch: plot_actuator(pd, arch, 'yz'),
    'local_induction_factor': lambda pd, arch:
        plot_local_induction_factor(pd, arch),
    'average_induction_factor': lambda pd, arch:
        plot_average_induction_factor(pd, arch),
    'relative_radius': lambda pd, arch: plot_relative_radius(pd, arch),
    'relative_radius_of_curvature': lambda pd, arch:
        plot_relative_radius_of_curvature(pd, arch),
    'circulation': lambda pd, arch: plot_circulation(pd, arch),
    'thrust': lambda pd, arch: plot_thrust(pd, arch),
    'velocity_distribution': lambda pd, arch:
        plot_velocity_distribution(pd, arch),
}

# flags that additionally need the solved trial (wake geometry lives in V)
TRIAL_PLOT_REGISTRY = {
    'wake_isometric': lambda pd, arch, tr: plot_wake(pd, arch, tr,
                                                     'isometric'),
    'wake_xy': lambda pd, arch, tr: plot_wake(pd, arch, tr, 'xy'),
    'wake_xz': lambda pd, arch, tr: plot_wake(pd, arch, tr, 'xz'),
    'wake_yz': lambda pd, arch, tr: plot_wake(pd, arch, tr, 'yz'),
    'induction_contour': lambda pd, arch, tr: plot_induction_contour(
        pd, arch, tr),
}


def available_flags(plot_dict=None):
    flags = sorted(PLOT_REGISTRY) + sorted(TRIAL_PLOT_REGISTRY)
    flags += ['animation_gif', 'states:<name>', 'controls:<name>',
              'z:<name>', 'outputs:<group>']
    return flags


def plot(plot_dict, arch, flags: List[str], save_prefix=None, trial=None):
    figs = {}
    for flag in flags:
        if flag == 'animation_gif':
            # true frame-by-frame animation written to disk (the Agg backend
            # cannot 'return' an animation figure usefully)
            figs[flag] = animate(
                plot_dict, arch,
                fname=f'{save_prefix or "trial"}_animation.gif')
            continue
        if flag in PLOT_REGISTRY:
            figs[flag] = PLOT_REGISTRY[flag](plot_dict, arch)
        elif flag in TRIAL_PLOT_REGISTRY:
            figs[flag] = TRIAL_PLOT_REGISTRY[flag](plot_dict, arch, trial)
        elif flag.startswith('outputs:'):
            figs[flag] = plot_outputs_group(plot_dict, arch,
                                            flag.split(':', 1)[1])
        elif flag.startswith(('states:', 'controls:', 'z:')):
            kind, name = flag.split(':', 1)
            var_type = {'states': 'x', 'controls': 'u', 'z': 'z'}[kind]
            if name not in plot_dict[var_type]:
                raise KeyError(f'unknown variable {name!r} in {var_type}; '
                               f'available: {sorted(plot_dict[var_type])}')
            figs[flag] = _plot_single_var(plot_dict, var_type, name)
        else:
            raise KeyError(f'unknown plot flag {flag!r}; '
                           f'available: {available_flags()}')
        if save_prefix:
            figs[flag].savefig(f'{save_prefix}_{flag}.png', dpi=100)
    return figs
