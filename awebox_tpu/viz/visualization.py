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
}


def plot(plot_dict, arch, flags: List[str], save_prefix=None):
    figs = {}
    for flag in flags:
        if flag not in PLOT_REGISTRY:
            raise KeyError(f'unknown plot flag {flag!r}; '
                           f'available: {sorted(PLOT_REGISTRY)}')
        figs[flag] = PLOT_REGISTRY[flag](plot_dict, arch)
        if save_prefix:
            figs[flag].savefig(f'{save_prefix}_{flag}.png', dpi=100)
    return figs
