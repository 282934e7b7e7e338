"""Tether segment properties and drag models (pure JAX).

Re-design of /root/reference/awebox/mdl/aero/tether_dir/{tether_aero, segment,
element}.py: per-segment multi-element drag discretization evaluated with
vectorized element math (the reference maps a casadi Function over elements;
here the elements are a leading array axis), split between the upper and lower
nodes by the midpoint-rule lever arms.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from . import atmosphere, wind


def segment_endpoints(si, arch, upper_node):
    """(q_upper, q_lower, dq_upper, dq_lower) for the segment below node."""
    label = arch.node_label(upper_node)
    lower = arch.parent_map[upper_node]
    q_upper = si['x']['q' + label]
    dq_upper = si['x']['dq' + label]
    if lower == 0:
        q_lower = jnp.zeros(3)
        dq_lower = jnp.zeros(3)
    else:
        plabel = arch.parent_label(upper_node)
        q_lower = si['x']['q' + plabel]
        dq_lower = si['x']['dq' + plabel]
    return q_upper, q_lower, dq_upper, dq_lower


def segment_diam(si, arch, upper_node):
    lower = arch.parent_map[upper_node]
    if lower == 0:
        return si['theta']['diam_t'][0]
    elif upper_node in arch.kite_nodes:
        return si['theta']['diam_s'][0]
    else:
        return si['theta']['diam_t'][0]


def segment_properties(cfg, si, theta0, arch, upper_node):
    """SI segment properties (tether_aero.py:178-267). The 'scaling_*'
    counterparts live in build-time config, not here."""
    lower = arch.parent_map[upper_node]
    main = (lower == 0)
    secondary = upper_node in arch.kite_nodes

    q_upper, q_lower, _, _ = segment_endpoints(si, arch, upper_node)
    seg_vector = q_upper - q_lower
    seg_length = jnp.sqrt(seg_vector @ seg_vector + 1e-16)

    seg_diam = segment_diam(si, arch, upper_node)
    density = theta0['tether']['rho']
    cross_section_area = np.pi * (seg_diam / 2.) ** 2.
    seg_mass = cross_section_area * density * seg_length

    if main:
        length_scaling_name = ('x', 'l_t') if cfg['system_type'] == 'lift_mode' else ('theta', 'l_t')
        diam_name = 'diam_t'
    elif secondary:
        length_scaling_name = ('theta', 'l_s')
        diam_name = 'diam_s'
    else:
        length_scaling_name = ('theta', 'l_i')
        diam_name = 'diam_t'

    return {
        'seg_length': seg_length,
        'seg_diam': seg_diam,
        'cross_section_area': cross_section_area,
        'seg_mass': seg_mass,
        'density': density,
        'length_scaling_name': length_scaling_name,
        'diam_name': diam_name,
    }


def _step_in_out(x, lb, ub, eps):
    """Smooth indicator of lb < x < ub (vector_operations.py:382-390)."""
    step_in = jnp.arctan((x - lb) / eps) / np.pi + 0.5
    step_out = jnp.arctan((x - ub) / eps) / np.pi + 0.5
    return step_in - step_out


def reynolds_number(cfg, theta0, zz, ua_norm, diam):
    """Element Reynolds number (tether_dir/reynolds.py:39-46)."""
    rho = atmosphere.get_density(cfg['atmosphere_model'], theta0['atmosphere'], zz)
    mu = atmosphere.get_viscosity(cfg['atmosphere_model'], theta0['atmosphere'], zz)
    return rho * ua_norm * diam / mu


def drag_coefficient(cfg, theta0, reynolds):
    """cd(Re) per the selected model (tether_dir/coefficients.py:39-158):
    'constant' uses theta0.tether.cd; 'piecewise' is the Roshko unit-step of
    linear fits (smoothed with arctan steps); 'polyfit' uses the same curve
    (the reference's separate polyfit is an interpolation of the Roshko
    piecewise fit — behaviorally equivalent at the smoothing in use)."""
    model = cfg.get('tether_cd_model', 'constant')
    if model == 'constant':
        return theta0['tether']['cd']
    if model not in ('piecewise', 'polyfit'):
        raise ValueError(f'invalid tether cd model {model!r}')
    eps = cfg.get('tether_reynolds_smoothing', 1e-4)
    re = jnp.maximum(reynolds, 1.0)
    log_re = jnp.log10(re)
    # piecewise linear-in-Re fits (coefficients.py:95-158: Stokes regime,
    # laminar plateau, laminar separation, level, drag crisis, turbulent
    # separation, high-Re plateau)
    segs = [
        (0.0, 2.0, 100. / re),
        (2.0, 4.0, jnp.ones_like(re)),
        (4.0, 4.3, 1.02198077356237e-5 * re + 1.01141242),
        (4.3, 5.26, -1.03659206648679e-7 * re + 1.2046901692),
        (5.26, 5.74, -3.28441892597317e-6 * re + 1.8415437577),
        (5.74, 7.0, 7.10799367510221e-8 * re + 0.2824178662),
        (7.0, 10.0, 0.8 * jnp.ones_like(re)),
    ]
    cd = 0.
    for lb, ub, val in segs:
        cd = cd + _step_in_out(log_re, lb, ub, eps) * val
    return cd


def element_drag(cfg, theta0, q_upper, q_lower, dq_upper, dq_lower, diam):
    """Drag force of one tether element (element.py:60-94). Vectorized over a
    leading element axis of the q/dq arguments. Note: the reference's tau
    homotopy blend of tether-drag models (tether_aero.py:148-150) is disabled
    in the reference itself (commented out); current behavior — the selected
    model applied directly — is reproduced here."""
    q_avg = 0.5 * (q_upper + q_lower)
    zz = q_avg[..., 2]
    uw = wind.get_velocity(cfg['wind_model'], theta0['wind'], zz)
    dq_avg = 0.5 * (dq_upper + dq_lower)
    ua = uw - dq_avg

    eps = 1.e-6
    ua_norm = jnp.sqrt(jnp.sum(ua ** 2, axis=-1) + eps ** 2)
    ehat_ua = ua / ua_norm[..., None]

    tether = q_upper - q_lower
    length_sq = jnp.sum(tether ** 2, axis=-1)
    length_parallel = jnp.sum(tether * ehat_ua, axis=-1)
    length_perp = jnp.sqrt(jnp.maximum(length_sq - length_parallel ** 2, 0.) + eps ** 4)

    re = reynolds_number(cfg, theta0, zz, ua_norm, diam)
    cd = jnp.asarray(drag_coefficient(cfg, theta0, re))
    cd = cd[..., None] if cd.ndim else cd
    rho = atmosphere.get_density(cfg['atmosphere_model'], theta0['atmosphere'], zz)
    drag = cd * 0.5 * rho[..., None] * ua_norm[..., None] * diam \
        * length_perp[..., None] * ua
    return drag


def distributed_segment_forces(cfg, si, theta0, arch, upper_node, n_elements):
    """(force_lower, force_upper) from n_elements element drags attributed by
    midpoint-rule lever arms (segment.py:51-66)."""
    q_top, q_bot, dq_top, dq_bot = segment_endpoints(si, arch, upper_node)
    diam = segment_diam(si, arch, upper_node)

    phi_lower = np.arange(n_elements) / n_elements
    phi_upper = (np.arange(n_elements) + 1) / n_elements
    q_lower = q_bot[None, :] + (q_top - q_bot)[None, :] * phi_lower[:, None]
    q_upper = q_bot[None, :] + (q_top - q_bot)[None, :] * phi_upper[:, None]
    dq_lower = dq_bot[None, :] + (dq_top - dq_bot)[None, :] * phi_lower[:, None]
    dq_upper = dq_bot[None, :] + (dq_top - dq_bot)[None, :] * phi_upper[:, None]

    drags = element_drag(cfg, theta0, q_upper, q_lower, dq_upper, dq_lower, diam)

    ds = 1.0 / n_elements
    s_grid = np.linspace(0.5 * ds, 1 - 0.5 * ds, n_elements)
    force_upper = jnp.sum(s_grid[:, None] * drags, axis=0)
    force_lower = jnp.sum((1 - s_grid)[:, None] * drags, axis=0)
    return force_lower, force_upper


def tether_drag_forces(cfg, si, theta0, arch) -> Dict[str, jnp.ndarray]:
    """Earth-frame drag force per node from the selected tether model
    (tether_aero.py:73-174). Returns {'f{node}{parent}': (3,)}."""
    model = cfg['tether_drag_model']
    n_elements = cfg['tether_aero_elements']

    forces = {f'f{arch.node_label(n)}': jnp.zeros(3)
              for n in range(1, arch.number_of_nodes)}

    if model == 'not_in_use':
        return forces

    for node in range(1, arch.number_of_nodes):
        if model == 'multi':
            lower, upper = distributed_segment_forces(cfg, si, theta0, arch, node, n_elements)
        elif model == 'split':
            lower, upper = distributed_segment_forces(cfg, si, theta0, arch, node, 1)
        elif model == 'kite_only':
            lower = jnp.zeros(3)
            upper = jnp.zeros(3)
            if node in arch.kite_nodes:
                # quarter of the segment drag at the kite, aligned with the
                # apparent flow through the kite (segment.py:69-97 simplified
                # to the same magnitude scaling)
                _, up = distributed_segment_forces(cfg, si, theta0, arch, node, 1)
                upper = 0.5 * up
        else:
            raise ValueError(f'tether drag model {model} not supported')

        label = arch.node_label(node)
        forces['f' + label] = forces['f' + label] + upper
        parent = arch.parent_map[node]
        if parent > 0:
            plabel = arch.parent_label(node)
            forces['f' + plabel] = forces['f' + plabel] + lower

    return forces
