"""Lagrangian mechanics for tree-structured tethered-kite systems (pure JAX).

TPU-native re-design of /root/reference/awebox/mdl/lagr_dyn_dir/: instead of
building casadi expression graphs and calling cas.jacobian, the Euler-Lagrange
terms are obtained with jax.grad (for the generalized-momentum gradient) and a
jvp-based total-time-derivative operator (for d/dt terms), applied to a scalar
Lagrangian written in plain JAX. The implicit-DAE residual that results is
algebraically identical to the reference's
(lagr_dyn.py:20-254, holonomics.py:17-311, energy.py:43-145).

All functions take a single flat "model variables" vector ``v`` (scaled), laid
out by a :class:`~awebox_tpu.model.vars.VarLayout` as [x, xdot, u, z, theta].
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import tether, wind


def skew(omega):
    wx, wy, wz = omega[0], omega[1], omega[2]
    return jnp.array([[0., -wz, wy],
                      [wz, 0., -wx],
                      [-wy, wx, 0.]])


def make_splitters(layout, scaling):
    """Build (split, to_si) helpers for the flat model-variables vector."""
    offsets = layout.type_offsets
    scale_full = np.concatenate([
        np.asarray(scaling[t]) if layout.dims[t] else np.zeros(0)
        for t in ('x', 'xdot', 'u', 'z', 'theta')])

    def split(v):
        return {t: v[offsets[t]:offsets[t] + layout.dims[t]]
                for t in ('x', 'xdot', 'u', 'z', 'theta')}

    def to_si(v):
        vs = v * scale_full
        parts = split(vs)
        return {t: layout.unpack(t, parts[t]) for t in parts}

    return split, to_si, scale_full


def make_time_derivative(layout, scaling, arch, kite_dof):
    """Total-time-derivative operator d/dt along the trajectory
    (lagr_dyn_dir/tools.py:13-74).

    For an expression f(v) of the scaled model variables, df/dt is the jvp of
    f in the tangent direction where each scaled state s moves with the rate
    named 'd'+s. Crucially (matching struct_op.get_variable_type:737-757), the
    rate is taken from the algebraically equivalent *state or control*
    variable when one of that name exists (e.g. d(q10)/dt is the state dq10,
    d(coeff)/dt is the control dcoeff), and only pure second derivatives come
    from the xdot variables (ddq10, domega10, ...). This choice determines the
    Jacobian structure of gddot and therefore the index-1 property of the DAE.
    DCM states move with R*skew(omega); all other variables are frozen.
    """
    x_off = layout.type_offsets['x']
    x_sl = slice(x_off, x_off + layout.dims['x'])

    # (destination slice in x, absolute source slice in v, scale ratio)
    routes = []
    for name, dim in layout.entries['x']:
        dname = 'd' + name
        if layout.has('x', dname):
            src_type = 'x'
        elif layout.has('u', dname):
            src_type = 'u'
        else:
            src_type = 'xdot'
        dst = layout.slices['x'][name]
        src_rel = layout.slices[src_type][dname]
        src_abs = slice(layout.type_offsets[src_type] + src_rel.start,
                        layout.type_offsets[src_type] + src_rel.stop)
        ratio = np.asarray(scaling[src_type])[src_rel] / np.asarray(scaling['x'])[dst]
        routes.append((dst, src_abs, ratio))

    r_fixups = []
    if kite_dof == 6:
        for kite in arch.kite_nodes:
            label = arch.node_label(kite)
            r_rel = layout.slices['x']['r' + label]
            om_rel = layout.slices['x']['omega' + label]
            om_scale = np.asarray(scaling['x'])[om_rel]
            r_scale = np.asarray(scaling['x'])[r_rel]
            r_fixups.append((r_rel, om_rel, om_scale, r_scale))

    def tangent(v):
        v = jnp.asarray(v)
        x_scaled = v[x_sl]
        tx = jnp.zeros(layout.dims['x'])
        for (dst, src_abs, ratio) in routes:
            tx = tx.at[dst].set(v[src_abs] * ratio)
        for (r_rel, om_rel, om_scale, r_scale) in r_fixups:
            R = (x_scaled[r_rel] * r_scale).reshape(3, 3)
            omega_si = x_scaled[om_rel] * om_scale
            dr_si = (R @ skew(omega_si)).reshape(9)
            tx = tx.at[r_rel].set(dr_si / r_scale)
        t = jnp.zeros_like(v)
        t = t.at[x_sl].set(tx)
        return t

    def time_derivative(f: Callable):
        def df(v):
            return jax.jvp(f, (v,), (tangent(v),))[1]
        return df

    return time_derivative


# --- energies (energy.py:43-145) ------------------------------------------

def reelout_speed(si):
    q10 = si['x']['q10']
    ehat = q10 / jnp.sqrt(q10 @ q10 + 1e-16)
    return si['x']['dq10'] @ ehat


def node_kinetic_energies(cfg, si, theta0, arch) -> Dict[str, jnp.ndarray]:
    out = {}
    for node in range(1, arch.number_of_nodes):
        label = arch.node_label(node)
        props = tether.segment_properties(cfg, si, theta0, arch, node)
        mass_segment = props['seg_mass']
        dq_node = si['x']['dq' + label]
        if node == 1:
            q10 = si['x']['q10']
            ehat = q10 / jnp.sqrt(q10 @ q10 + 1e-16)
            dq_parent = reelout_speed(si) * ehat
        else:
            dq_parent = si['x']['dq' + arch.parent_label(node)]
        e_kin_trans = 0.5 * mass_segment / 3. * (
            dq_node @ dq_node + dq_parent @ dq_parent + dq_node @ dq_parent)
        out['tether' + label] = e_kin_trans

        if node in arch.kite_nodes:
            m_k = theta0['geometry']['m_k']
            out['kite_trans' + label] = 0.5 * m_k * (dq_node @ dq_node)
            if cfg['kite_dof'] == 6:
                omega = si['x']['omega' + label]
                J = theta0['geometry']['j']
                out['kite_rot' + label] = 0.5 * omega @ (J @ omega)
    return out


def node_potential_energies(cfg, si, theta0, arch) -> Dict[str, jnp.ndarray]:
    out = {}
    gravity = theta0['atmosphere']['g']
    for node in range(1, arch.number_of_nodes):
        label = arch.node_label(node)
        q_node = si['x']['q' + label]
        if node == 1:
            q_parent = jnp.zeros(3)
        else:
            q_parent = si['x']['q' + arch.parent_label(node)]
        q_mean = 0.5 * (q_node + q_parent)
        props = tether.segment_properties(cfg, si, theta0, arch, node)
        out['tether' + label] = gravity * props['seg_mass'] * q_mean[2]
        if node in arch.kite_nodes:
            out['kite' + label] = gravity * theta0['geometry']['m_k'] * q_node[2]
    return out


# --- holonomic constraints (holonomics.py:17-264) -------------------------

def tether_length_constraints(cfg, si, theta0, arch) -> Dict[str, jnp.ndarray]:
    """g = 0.5(|q_n - q_p|^2 - l^2) per tether segment (com attachment)."""
    g = {}
    for node in range(1, arch.number_of_nodes):
        label = arch.node_label(node)
        q = si['x']['q' + label]
        if node == 1:
            q_prev = jnp.zeros(3)
            if cfg['system_type'] == 'lift_mode':
                seg_length = si['x']['l_t'][0]
            else:
                seg_length = si['theta']['l_t'][0]
        elif node in arch.kite_nodes:
            q_prev = si['x']['q' + arch.parent_label(node)]
            seg_length = si['theta']['l_s'][0]
        else:
            q_prev = si['x']['q' + arch.parent_label(node)]
            seg_length = si['theta']['l_i'][0]
        seg = q - q_prev
        g['c' + label] = 0.5 * (seg @ seg - seg_length ** 2.)

    if cfg['cross_tether'] and arch.number_of_kites > 1:
        for l in arch.layer_nodes:
            kites = arch.kites_map[l]
            n_tethers = 1 if len(kites) == 2 else len(kites)
            for k in range(n_tethers):
                a = kites[k]
                b = kites[(k + 1) % len(kites)]
                qa = si['x']['q' + arch.node_label(a)]
                qb = si['x']['q' + arch.node_label(b)]
                seg_length = si['theta'][f'l_c{l}'][0]
                seg = qa - qb
                g[f'c{a}{b}'] = 0.5 * (seg @ seg - seg_length ** 2.)
    return g


def holonomic_names(cfg, arch):
    names = ['c' + arch.node_label(n) for n in range(1, arch.number_of_nodes)]
    if cfg['cross_tether'] and arch.number_of_kites > 1:
        for l in arch.layer_nodes:
            kites = arch.kites_map[l]
            n_tethers = 1 if len(kites) == 2 else len(kites)
            for k in range(n_tethers):
                names.append(f'c{kites[k]}{kites[(k + 1) % len(kites)]}')
    return names


def work_holonomic(cfg, si, theta0, arch):
    """sum_segments lambda * g."""
    g = tether_length_constraints(cfg, si, theta0, arch)
    total = 0.
    for name in holonomic_names(cfg, arch):
        lam_name = 'lambda' + name[1:]
        total = total + si['z'][lam_name][0] * g[name]
    return total
