"""Automated solution quality checks.

Counterpart of /root/reference/awebox/quality.py:37-165 and
quality_funcs.py:39-304: post-solve sanity tests on the interpolated
solution — solver success, numerics (t_f floor, control-interval cap),
invariant magnitudes, minimum node altitude, power-balance closure,
performance factors (Loyd, harvesting), tension cap.

Each test returns (name, passed, value, threshold); `check_quality` collects
results and warns or raises per options.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def check_quality(trial, raise_exception=None) -> List[Tuple[str, bool, float, float]]:
    options = trial.options
    qopts = options['quality']
    tp = qopts['test_param']
    results = []

    def add(name, passed, value, thresh):
        results.append((name, bool(passed), float(value), float(thresh)))

    # solver success (quality_funcs.py:39-47)
    add('solve_succeeded', trial.solve_succeeded, float(trial.solve_succeeded), 1.)

    go = trial.global_outputs()
    T = go['time_period']
    n_k = trial.ocp.n_k

    # numerics (quality_funcs.py:49-73)
    add('t_f_min', T > tp['t_f_min'], T, tp['t_f_min'])
    add('max_control_interval', T / n_k < tp['max_control_interval'],
        T / n_k, tp['max_control_interval'])

    outputs = trial.outputs_on_coll()

    # invariants c, dc (quality_funcs.py:75-134); scaled by l_t^2 resp l_t
    arch = trial.arch
    theta = trial.theta_opt()
    l_scale = trial.options['processed']['scaling']['x']['l_t']
    inv = outputs['invariants']
    c_worst = 0.
    dc_worst = 0.
    for node in range(1, arch.number_of_nodes):
        name = 'c' + arch.node_label(node)
        c_worst = max(c_worst, float(np.max(np.abs(np.asarray(inv[name])))) / l_scale ** 2)
        dc_worst = max(dc_worst, float(np.max(np.abs(np.asarray(inv['d' + name])))) / l_scale ** 2)
    add('invariant_c', c_worst < tp['c_max'], c_worst, tp['c_max'])
    add('invariant_dc', dc_worst < tp['dc_max'], dc_worst, tp['dc_max'])

    if trial.model.cfg['kite_dof'] == 6:
        r_worst = 0.
        for kite in arch.kite_nodes:
            key = 'orthonormality' + arch.node_label(kite)
            r_worst = max(r_worst, float(np.max(np.abs(np.asarray(inv[key])))))
        add('dcm_orthonormality', r_worst < tp['r_max'], r_worst, tp['r_max'])

    # minimum node altitude (quality_funcs.py:136-175)
    z_min = np.inf
    for node in range(1, arch.number_of_nodes):
        q = trial.x_traj_si('q' + arch.node_label(node))
        z_min = min(z_min, float(q[:, 2].min()))
    add('min_altitude', z_min > tp['z_min'], z_min, tp['z_min'])

    # power balance closure (quality_funcs.py:177-281): sum of all power
    # channels should vanish relative to the largest channel
    pb = outputs['power_balance']
    channels = {k: np.asarray(v) for k, v in pb.items()}
    total = sum(channels.values())
    scale_pb = max(float(np.max(np.abs(v))) for v in channels.values())
    bal = float(np.max(np.abs(total))) / max(scale_pb, 1e-12)
    add('power_balance', bal < tp['power_balance_thresh'], bal,
        tp['power_balance_thresh'])

    # max tension (quality_funcs.py) and performance factors
    lp = outputs['local_performance']
    tension_max = max(float(np.max(np.asarray(lp['tether_force' + arch.node_label(n)])))
                      for n in range(1, arch.number_of_nodes))
    add('max_tension', tension_max < tp['max_tension'], tension_max, tp['max_tension'])

    # performance factors (quality_funcs via indicators.py:148-152): the
    # instantaneous power over the total Loyd limit must stay physical, and
    # the power-harvesting factor (zeta) over hub-height availability bounded
    perf = outputs['performance']
    loyd_factor = float(np.max(np.asarray(perf['loyd_factor'])))
    add('loyd_factor', loyd_factor < tp['max_loyd_factor'], loyd_factor,
        tp['max_loyd_factor'])
    zeta = float(np.max(np.abs(np.asarray(perf['phf_hubheight']))))
    add('power_harvesting_factor', zeta < tp['max_power_harvesting_factor'],
        zeta, tp['max_power_harvesting_factor'])

    # vortex wake truncation (quality_funcs.py:283 test_tracked_vortex
    # _periods): the far-wake induction left at the kites must be small
    # relative to u_ref, else wake_nodes truncates real induction
    if trial.model.cfg.get('induction_model') == 'vortex':
        from ..model.aero.vortex.wake import far_wake_truncation_estimate
        trunc = far_wake_truncation_estimate(trial)
        add('vortex_truncation_error',
            trunc < tp['vortex_truncation_error_thresh'], trunc,
            tp['vortex_truncation_error_thresh'])

    if raise_exception is None:
        raise_exception = qopts['raise_exception']
    failed = [r for r in results if not r[1]]
    if failed and raise_exception:
        raise RuntimeError(f'quality checks failed: {failed}')
    return results
