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


import numpy as np  # noqa: E402  (used by plot_power)

PLOT_REGISTRY = {
    'states': lambda pd, arch: plot_states(pd),
    'controls': lambda pd, arch: plot_controls(pd),
    'isometric': lambda pd, arch: plot_isometric(pd, arch),
    'invariants': lambda pd, arch: plot_invariants(pd, arch),
    'power': lambda pd, arch: plot_power(pd),
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
