"""Orbit-geometry estimators for induction models: averaged / parent / frenet.

Counterpart of /root/reference/awebox/mdl/aero/geometry_dir/{geometry,
averaged_geometry, parent_geometry, frenet_geometry}.py: the rotation center
and center velocity of a kite layer, selected by
model.aero.geometry.model ('averaged' default, geometry.py:49-60).

- averaged: center = mean of kite positions (averaged_geometry.py:30-68)
- parent:   center = parent-node position (parent_geometry.py:50-74)
- frenet:   per-kite osculating-circle center from the Frenet frame,
            averaged over kites (frenet_geometry.py:52-93). Like the
            reference (frenet_geometry.py:42-50), terms needing the third
            time derivative (trajectory torsion) are not representable with
            the available states and are dropped from the center velocity.
"""
from __future__ import annotations

import jax.numpy as jnp


def _smooth_norm(v, eps=1e-8):
    return jnp.sqrt(v @ v + eps ** 2)


def _frenet_center_and_velocity(si, arch, kite):
    label = arch.node_label(kite)
    q = si['x']['q' + label]
    v = si['x']['dq' + label]                     # gamma'
    a = si['xdot']['ddq' + label]                 # gamma''
    v_norm = _smooth_norm(v)
    t_hat = v / v_norm
    a_perp = a - (a @ t_hat) * t_hat
    a_perp_norm = _smooth_norm(a_perp)
    e2 = a_perp / a_perp_norm                     # principal normal
    radius = v_norm ** 2 / a_perp_norm            # |v|^3/|v x a| = v^2/|a_perp|
    center = q + radius * e2

    # center velocity, jerk-free part: d/dt(q + R e2) with dR/dt, de2/dt
    # restricted to terms expressible in (v, a). de2/dt along the tangent is
    # the curvature rotation: -|a_perp|/|v| * t_hat (Frenet-Serret with
    # torsion dropped, frenet_geometry.py:42-50 warning).
    de2_dt = -(a_perp_norm / v_norm) * t_hat
    dcenter = v + radius * de2_dt
    return center, dcenter


def center_and_velocity(model_name: str, si, arch, layer):
    """(center, dcenter) of the layer's rotation plane per the selected
    geometry model (geometry_dir/geometry.py:49-60)."""
    kites = arch.kites_map[layer]
    if model_name == 'averaged':
        qs = jnp.stack([si['x']['q' + arch.node_label(k)] for k in kites])
        dqs = jnp.stack([si['x']['dq' + arch.node_label(k)] for k in kites])
        return jnp.mean(qs, axis=0), jnp.mean(dqs, axis=0)
    if model_name == 'parent':
        if layer == 0:
            return jnp.zeros(3), jnp.zeros(3)
        label = arch.node_label(layer)
        return si['x']['q' + label], si['x']['dq' + label]
    if model_name == 'frenet':
        centers = []
        dcenters = []
        for k in kites:
            c, dc = _frenet_center_and_velocity(si, arch, k)
            centers.append(c)
            dcenters.append(dc)
        return (jnp.mean(jnp.stack(centers), axis=0),
                jnp.mean(jnp.stack(dcenters), axis=0))
    raise ValueError(f'unknown geometry model {model_name!r}')
