"""Modular initial-guess generation: primitive schedule + s-curve interpolation.

Compressed TPU-native counterpart of /root/reference/awebox/opti/
initialization_dir/modular.py:45-1318. The reference decomposes the guess
into *primitives* (each connecting a boundary configuration ``conf_0`` to
``conf_f``), interpolates every coordinate with an "s-curve" polynomial
solved from a boundary-condition LSE (__assemble_lse_for_s_curve,
modular.py:1127-1281), estimates t_f from the path (modular.py:283-305), and
fills the NLP vector from the scheduled primitives
(__generate_guess_from_schedule, modular.py:337-384).

Here one primitive covers the horizon and the s-curve is the closed-form
quintic Hermite satisfying position/velocity/acceleration at both ends — the
same boundary conditions the reference's LSE imposes (modular.py:471-533:
position + derivatives up to order 2 at each boundary), without a linear
solve. Boundary configurations come from:

* the trajectory-type boundary tables (landing/transition xi tables,
  ocp/operation.py) when present — conf_0 on the source orbit;
* a parked terminal configuration for landing types (kite brought onto the
  tether axis at reduced speed, the role of the reference's
  simple-pos terminal configurations, modular.py:627-757);
* the circular scenario (initialization.py) at both ends otherwise, which
  makes 'modular' a safe drop-in for periodic problems.

Activated by ``options['solver.initialization.type'] = 'modular'``.
"""
from __future__ import annotations

import numpy as np

from .initialization import (guess_values_at_time,
                             precompute_path_parameters, pack_guess_frame)


def quintic_hermite(tau, p0, v0, a0, pf, vf, af, T):
    """Closed-form quintic with q(0)=p0, q'(0)=v0 T, q''(0)=a0 T^2 (scaled
    to the unit interval), matching (pf, vf, af) at tau=1. Returns
    (q, dq/dt, d2q/dt2) at tau with PHYSICAL time derivatives (T = duration).
    The reference solves the same 6 boundary conditions as an LSE per
    coordinate (modular.py:1127-1281)."""
    v0s, a0s = v0 * T, a0 * T * T
    vfs, afs = vf * T, af * T * T
    c0 = p0
    c1 = v0s
    c2 = 0.5 * a0s
    d = pf - (c0 + c1 + c2)
    dv = vfs - (c1 + 2. * c2)
    da = afs - 2. * c2
    c3 = 10. * d - 4. * dv + 0.5 * da
    c4 = -15. * d + 7. * dv - da
    c5 = 6. * d - 3. * dv + 0.5 * da
    t = tau
    q = c0 + c1 * t + c2 * t ** 2 + c3 * t ** 3 + c4 * t ** 4 + c5 * t ** 5
    dq = (c1 + 2 * c2 * t + 3 * c3 * t ** 2 + 4 * c4 * t ** 3
          + 5 * c5 * t ** 4) / T
    ddq = (2 * c2 + 6 * c3 * t + 12 * c4 * t ** 2 + 20 * c5 * t ** 3) / T / T
    return q, dq, ddq


def _boundary_configurations(ocp):
    """(conf_0, conf_f, T_guess): SI name->value dicts with q/dq/ddq per
    node, plus scalars (l_t, dl_t)."""
    options = ocp.options
    model = ocp.model
    arch = model.arch
    traj_type = options['user_options']['trajectory']['type']

    pre = precompute_path_parameters(options, arch)
    conf_0 = guess_values_at_time(0., options, arch, model, pre)

    if traj_type in ('nominal_landing', 'compromised_landing'):
        # terminal: parked — every node brought onto the (inclined) tether
        # axis at low altitude with zero velocity (the reference's
        # simple-pos terminal configuration, modular.py:627-757)
        conf_f = {}
        l_t_f = 0.5 * float(options['solver']['initialization']['l_t'])
        n_hat = pre['ehat_tether']
        conf_f['l_t'] = l_t_f
        conf_f['dl_t'] = 0.
        conf_f['e'] = conf_0.get('e', 0.)
        for node in range(1, arch.number_of_nodes):
            label = arch.node_label(node)
            parent = arch.parent_map[node]
            seg = l_t_f if parent == 0 else float(
                options['solver']['initialization']['theta']['l_s'])
            base = np.zeros(3) if parent == 0 \
                else np.asarray(conf_f['q' + arch.parent_label(node)])
            conf_f['q' + label] = base + seg * n_hat
            conf_f['dq' + label] = np.zeros(3)
            conf_f['ddq' + label] = np.zeros(3)
            for extra in ('r', 'omega', 'dr', 'domega', 'delta', 'coeff'):
                key = extra + label
                if key in conf_0:
                    val = np.asarray(conf_0[key], dtype=float)
                    conf_f[key] = val * 0. if extra != 'r' else val
        # duration: travel distance at half groundspeed (modular.py:283-305
        # estimates t_f from path length over speed)
        kite = arch.kite_nodes[0]
        dist = float(np.linalg.norm(
            np.asarray(conf_0['q' + arch.node_label(kite)])
            - np.asarray(conf_f['q' + arch.node_label(kite)])))
        T_guess = max(2. * dist / max(pre['groundspeed'], 1.), 5.)
    else:
        # periodic / transition fallback: the circular scenario at both ends
        # (one full revolution) — conf_f == conf at t = T
        conf_f = guess_values_at_time(pre['time_final'], options, arch,
                                      model, pre)
        T_guess = pre['time_final']
    return conf_0, conf_f, T_guess


def build_modular_guess(ocp) -> np.ndarray:
    """Scaled V_init from the primitive schedule (modular.py:45-63 role)."""
    options = ocp.options
    vs = ocp.vstruct

    conf_0, conf_f, T_guess = _boundary_configurations(ocp)

    # every interpolatable key: 3-vectors and scalars with q/dq/ddq chains
    def conf_at(tau):
        ret = {}
        for key, p0 in conf_0.items():
            if key.startswith(('dq', 'ddq', 'dr', 'domega', 'dl_t')):
                continue     # derivatives are produced alongside their base
            pf = conf_f.get(key, p0)
            p0a = np.asarray(p0, dtype=float)
            pfa = np.asarray(pf, dtype=float)
            if key.startswith('q'):
                v0 = np.asarray(conf_0.get('d' + key, 0. * p0a), float)
                vf = np.asarray(conf_f.get('d' + key, 0. * pfa), float)
                a0 = np.asarray(conf_0.get('dd' + key, 0. * p0a), float)
                af = np.asarray(conf_f.get('dd' + key, 0. * pfa), float)
                q, dq, ddq = quintic_hermite(tau, p0a, v0, a0, pfa, vf, af,
                                             T_guess)
                ret[key] = q
                ret['d' + key] = dq
                ret['dd' + key] = ddq
            elif key == 'l_t':
                v0 = np.asarray(conf_0.get('dl_t', 0.), float)
                vf = np.asarray(conf_f.get('dl_t', 0.), float)
                q, dq, _ = quintic_hermite(tau, p0a, v0, 0. * p0a, pfa, vf,
                                           0. * pfa, T_guess)
                ret['l_t'] = q
                ret['dl_t'] = dq
            else:
                # linear blend for attitude/config entries without dynamics
                ret[key] = (1. - tau) * p0a + tau * pfa
        return ret

    V = pack_guess_frame(ocp, conf_at, T_guess)
    if getattr(vs, 'with_xi', False):
        xi0 = float(options['user_options']['trajectory']
                    ['compromised_landing']['xi_0_initial'])
        V[vs.xi_slice] = np.array([xi0, 0.])
    return V


def maybe_modular(ocp):
    """Dispatch hook used by build_initial_guess."""
    init_type = ocp.options['solver']['initialization'].get('type', 'default')
    if init_type == 'modular':
        return build_modular_guess(ocp)
    return None
