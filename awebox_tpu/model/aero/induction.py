"""Induction manager: lifted induced velocities with iota-homotopy blend.

Counterpart of /root/reference/awebox/mdl/aero/induction_dir/induction.py:
43-153. Per kite, a lifted algebraic variable ``ui{kite}{parent}`` carries
the induced velocity; the model equality blends the trivial residual
(ui = 0) with the physical model residual via the homotopy parameter iota:

    resi = iota * (ui - 0) + (1 - iota) * (ui - ui_model)

Comparison mode (induction.py:50-73) builds several actuator variants at
once; the variable set carries one induction-factor block per comparison
label, and ``ui`` follows the primary label chosen by the user options.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import actuator


def actuator_labels(cfg):
    """Comparison labels like ['qaxi'] or ['qaxi', 'uaxi']
    (flow.py:499-526)."""
    return cfg.get('act_comparison_labels', [])


def primary_label(cfg):
    return cfg.get('act_primary_label', 'qaxi')


def residual_names_and_dims(cfg, arch):
    """(name, dim) rows contributed to the model equality block, in order."""
    rows = []
    for kite in arch.kite_nodes:
        rows.append(('induction' + arch.node_label(kite), 3))
    for layer in arch.layer_nodes:
        for label in actuator_labels(cfg):
            dim = 3 if 'asym' in label else 1
            rows.append((f'actuator_{label}{layer}', dim))
    return rows


def residuals(cfg, si, theta0, arch, phi_iota, f_earth, scaling_refs):
    """Stacked induction equality residuals (order of
    residual_names_and_dims)."""
    res = []
    label = primary_label(cfg)
    force_zero = cfg.get('act_force_zero', False)
    u_ref = scaling_refs['u_ref']
    for kite in arch.kite_nodes:
        klabel = arch.node_label(kite)
        ui = si['z']['ui' + klabel]
        if force_zero:
            ui_model = jnp.zeros(3)
        else:
            ui_model = actuator.induced_velocity_at_kite(
                cfg, si, theta0, arch, kite, label)
        resi = (phi_iota * ui + (1. - phi_iota) * (ui - ui_model)) / u_ref
        res.append(resi)
    for layer in arch.layer_nodes:
        for lbl in actuator_labels(cfg):
            res.append(actuator.residuals_for_layer(
                cfg, si, theta0, arch, layer, lbl, f_earth, scaling_refs))
    return jnp.concatenate([jnp.atleast_1d(r) for r in res])


def collect_outputs(cfg, si, theta0, arch, f_earth):
    out = {}
    for kite in arch.kite_nodes:
        klabel = arch.node_label(kite)
        ui = si['z']['ui' + klabel]
        out['ui' + str(kite)] = ui
        # induction factor convention: a = -ui.n/|u_zero| handled per layer
    for lbl in actuator_labels(cfg):
        out.update(actuator.collect_outputs(cfg, si, theta0, arch, lbl,
                                            f_earth))
    return out
