"""Actuator-disk induction models (pure JAX).

TPU-native re-design of /root/reference/awebox/mdl/aero/induction_dir/
actuator_dir/{actuator,flow,geom,coeff,force}.py. The reference lifts ~21
support variables per layer (act_dcm, wind_dcm, center, varrho/psi per kite,
area, thrust, gamma, ...) as algebraic unknowns with matching equality
constraints, because CasADi/IPOPT benefit from the induced sparsity. Under
JAX/XLA the support quantities are cheap closed-form functions of the state
that fuse into the residual evaluation, so the only *lifted* unknowns here
are the ones that are genuinely implicit:

  - the induction factors ``a_{q|u}{axi|asym}{layer}`` (+ ``acos_/asin_`` in
    the asymmetric variants) — algebraic (q*) or dynamic Pitt-Peters states
    (u*),
  - the per-kite induced velocity ``ui{kite}{parent}`` handled by the
    induction manager (induction.py).

Variant equations follow actuator.py:122-288 (momentum theory qaxi,
steady/unsteady Pitt-Peters qasym/uaxi/uasym), coeff.py:46-171 (LL/MM
matrices, time constant t*), flow.py:480-570 (skew/wake-angle corrections).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import atmosphere, wind

# Pitt-Peters apparent-mass matrix (coeff.py:69-81)
MM_DIAG = np.array([1.69765, 0.113177, 0.113177])


def smooth_norm(v, eps=1e-8):
    return jnp.sqrt(v @ v + eps ** 2)


def layer_support(cfg, si, theta0, arch, layer):
    """Closed-form actuator support quantities for one layer node.

    Replaces the lifted support variables + constraints of
    actuator.py:89-120 / geom.py:138-258 / flow.py:194-382 with direct
    evaluation. Returns a dict with center/dcenter, n_hat, rotor frame
    (y_rotor, z_rotor), u_zero, qzero, gamma (cos/sin), per-kite
    (varrho, cospsi, sinpsi), bar_varrho, area, thrust, moments.
    """
    kites = arch.kites_map[layer]
    b_ref = theta0['geometry']['b_ref']

    # orbit-geometry center per the selected model (geometry_dir/geometry.py)
    from . import geometry as geometry_mod
    center, dcenter = geometry_mod.center_and_velocity(
        cfg.get('act_geometry_model', 'averaged'), si, arch, layer)

    # normal vector (default tether_parallel, opts/default.py:123)
    nv_model = cfg['act_normal_vector_model']
    if nv_model == 'xhat':
        n_hat = jnp.array([1., 0., 0.])
    else:  # tether_parallel
        if layer == 0:
            n_raw = center
        else:
            grand = arch.parent_map[layer]
            q_layer = si['x']['q' + arch.node_label(layer)]
            q_grand = jnp.zeros(3) if grand == 0 \
                else si['x']['q' + arch.node_label(grand)]
            n_raw = q_layer - q_grand
        n_hat = n_raw / smooth_norm(n_raw)

    # apparent velocity at the disk center (flow.get_uzero_vec)
    u_infty = wind.get_velocity(cfg['wind_model'], theta0['wind'], center[2])
    u_zero = u_infty - dcenter
    u_mag = smooth_norm(u_zero)
    u_hat = u_zero / u_mag

    # skew angle gamma between u_zero and the disk normal (flow.py:194-240)
    cosgamma = u_hat @ n_hat
    u_perp = u_zero - (u_zero @ n_hat) * n_hat
    singamma = smooth_norm(u_perp) / u_mag

    # rotor frame: z along the in-plane wind component, y = n x z
    # (closed-form stand-in for the act_dcm/wind_dcm alignment constraints,
    # actuator.py:290-321)
    z_rotor = u_perp / smooth_norm(u_perp)
    y_rotor = jnp.cross(n_hat, z_rotor)

    rho = atmosphere.get_density(cfg['atmosphere_model'], theta0['atmosphere'],
                                 center[2])
    qzero = 0.5 * rho * u_mag ** 2

    # annulus geometry (geom.py:209-330)
    varrho = {}
    cospsi = {}
    sinpsi = {}
    for k in kites:
        vec = si['x']['q' + arch.node_label(k)] - center
        r_in_plane = vec - (vec @ n_hat) * n_hat
        radius = smooth_norm(r_in_plane)
        varrho[k] = radius / b_ref
        cospsi[k] = (vec @ z_rotor) / radius
        sinpsi[k] = -(vec @ y_rotor) / radius
    if len(kites) == 1:
        bar_varrho = varrho[kites[0]]
    else:
        bar_varrho = sum(varrho.values()) / len(kites)
    area = 2. * jnp.pi * b_ref ** 2 * bar_varrho   # geom.py:258-268

    return {
        'kites': kites, 'center': center, 'dcenter': dcenter,
        'n_hat': n_hat, 'y_rotor': y_rotor, 'z_rotor': z_rotor,
        'u_zero': u_zero, 'u_mag': u_mag, 'qzero': qzero,
        'cosgamma': cosgamma, 'singamma': singamma,
        'varrho': varrho, 'cospsi': cospsi, 'sinpsi': sinpsi,
        'bar_varrho': bar_varrho, 'area': area, 'b_ref': b_ref,
    }


def get_a_vars(si, layer, label):
    """Lifted induction factors for one layer and actuator label."""
    holder = 'x' if label[0] == 'u' else 'z'
    a = si[holder]['a_' + label + str(layer)][0]
    if 'asym' in label:
        acos = si[holder]['acos_' + label + str(layer)][0]
        asin = si[holder]['asin_' + label + str(layer)][0]
        return a, acos, asin
    return a, None, None


def wake_angle_chi(cfg, a, sup):
    """Wake skew angle (flow.py:452-496); default 'coleman'."""
    model = cfg['act_wake_skew']
    gamma = jnp.arctan2(sup['singamma'], sup['cosgamma'])
    if model == 'not_in_use':
        return 0. * gamma
    if model == 'equal':
        return gamma
    # coleman (default): chi = (0.6 a + 1) gamma
    return (0.6 * a + 1.) * gamma


def corr_val(cfg, a, sup, chi):
    """Skew correction factor (flow.py:527-570); default 'simple'."""
    model = cfg['act_actuator_skew']
    if model == 'not_in_use':
        return 1. - a
    if model == 'glauert':
        return jnp.sqrt(1. - a * (2. * sup['cosgamma'] - a))
    if model == 'coleman':
        return sup['cosgamma'] + jnp.tan(chi / 2.) * sup['singamma'] \
            - a / jnp.cos(chi / 2.) ** 2
    # 'simple' (default)
    return sup['cosgamma'] - a


def ll_matrix(corr, chi):
    """Pitt-Peters gain matrix (coeff.py:46-67)."""
    th = jnp.tan(chi / 2.)
    sh = 1. / jnp.cos(chi / 2.)
    return jnp.array([
        [0.25 / corr, 0., -0.368155 * th],
        [0., -sh ** 2, 0.],
        [0.368155 * th / corr, 0., -1. + th ** 2],
    ])


def residuals_for_layer(cfg, si, theta0, arch, layer, label, f_earth,
                        scaling_refs):
    """Actuator residual rows for one (layer, label).

    scaling_refs: dict with 'thrust_ref' (z.f_aero scaling), 'moment_ref'
    (z.m_aero scaling), 'u_ref' (wind reference speed), 'a_ref',
    'varrho_ref'. Mirrors actuator.py:122-288.
    """
    sup = layer_support(cfg, si, theta0, arch, layer)
    a, acos, asin = get_a_vars(si, layer, label)
    a_ref = scaling_refs['a_ref']
    thrust_ref = scaling_refs['thrust_ref']
    moment_ref = scaling_refs['moment_ref']

    # thrust and in-plane moments about the center
    thrust = 0.
    moment = jnp.zeros(3)
    for k in sup['kites']:
        f = f_earth[k]
        thrust = thrust + f @ sup['n_hat']
        lever = si['x']['q' + arch.node_label(k)] - sup['center']
        moment = moment + jnp.cross(lever, f)
    moment_y = moment @ sup['y_rotor']
    moment_z = moment @ sup['z_rotor']

    chi = wake_angle_chi(cfg, a, sup)
    corr = corr_val(cfg, a, sup, chi)
    thrust_den = sup['qzero'] * sup['area']

    if label == 'qaxi':
        # momentum theory: thrust = 4 corr (1 - a) qzero A (actuator.py:149-167)
        resi = (thrust - 4. * corr * (1. - a) * thrust_den) / thrust_ref
        return jnp.atleast_1d(resi)

    radius_bar = sup['bar_varrho'] * sup['b_ref']
    moment_den = thrust_den * radius_bar
    c_all = jnp.array([thrust * radius_bar, moment_y, moment_z])
    LL = ll_matrix(corr, chi)
    a_all = jnp.array([a, acos, asin])

    if label == 'qasym':
        # steady Pitt-Peters (actuator.py:266-288)
        term3_ref = 1. / (4. * a_ref * (1. - a_ref)) * moment_ref
        resi = (a_all * moment_den - LL @ c_all) / term3_ref
        return resi

    # unsteady variants: Pitt-Peters dynamics in nondimensional time
    # tau = t / t_star, t_star = b_ref (bar_varrho + 0.5) / |u_zero|
    # (coeff.py:126-151); the lifted states carry d(a)/dt in xdot.
    t_num = sup['b_ref'] * (sup['bar_varrho'] + 0.5)
    t_den = sup['u_mag']
    t_num_ref = scaling_refs['b_ref'] * (scaling_refs['varrho_ref'] + 0.5)
    t_den_ref = scaling_refs['u_ref']

    if label == 'uaxi':
        da = si['xdot']['da_' + label + str(layer)][0]
        term_1 = MM_DIAG[0] * da * t_num * thrust_den
        term_2 = 4. * corr * a * thrust_den * t_den
        term_3 = -thrust * t_den
        term_1_ref = MM_DIAG[0] * a_ref * t_num_ref * thrust_ref
        return jnp.atleast_1d((term_1 + term_2 + term_3) / term_1_ref)

    # uasym (actuator.py:221-268)
    da_all = jnp.array([
        si['xdot']['da_' + label + str(layer)][0],
        si['xdot']['dacos_' + label + str(layer)][0],
        si['xdot']['dasin_' + label + str(layer)][0],
    ])
    MM = jnp.diag(jnp.asarray(MM_DIAG))
    term_1 = (LL @ (MM @ da_all)) * t_num * moment_den
    term_2 = a_all * moment_den * t_den
    term_3 = -(LL @ c_all) * t_den
    term_2_ref = a_ref * moment_ref * t_den_ref
    return (term_1 + term_2 + term_3) / term_2_ref


def local_induction_factor(cfg, si, arch, kite, label):
    """a at the kite location (flow.py:383-411)."""
    parent = arch.parent_map[kite]
    a, acos, asin = get_a_vars(si, parent, label)
    if 'asym' in label:
        sup_needed = cfg.get('act_asym_radial_linearity', False)
        # mu = 1 evaluates the Fourier modes at the annulus edge (Suzuki2000)
        mu = 1.
        # psi of this kite from the closed-form geometry
        return a, acos, asin, mu
    return a, None, None, None


def induced_velocity_at_kite(cfg, si, theta0, arch, kite, label):
    """u_ind = -a_local |u_zero| n_hat (flow.py:414-423)."""
    parent = arch.parent_map[kite]
    sup = layer_support(cfg, si, theta0, arch, parent)
    a, acos, asin, mu = local_induction_factor(cfg, si, arch, kite, label)
    if 'asym' in label:
        a_local = a + acos * sup['cospsi'][kite] * mu \
            + asin * sup['sinpsi'][kite] * mu
    else:
        a_local = a
    return -a_local * sup['u_mag'] * sup['n_hat']


def collect_outputs(cfg, si, theta0, arch, label, f_earth):
    """Actuator diagnostics (actuator.py:324-407)."""
    out = {}
    for layer in arch.layer_nodes:
        sup = layer_support(cfg, si, theta0, arch, layer)
        a, _, _ = get_a_vars(si, layer, label)
        thrust = sum(f_earth[k] @ sup['n_hat'] for k in sup['kites'])
        ct = thrust / (sup['qzero'] * sup['area'])
        s = str(layer)
        out['a_' + label + s] = a
        out['ct' + s] = ct
        out['area' + s] = sup['area']
        out['bar_varrho' + s] = sup['bar_varrho']
        out['gamma' + s] = jnp.arctan2(sup['singamma'], sup['cosgamma'])
        out['thrust' + s] = thrust
        out['u_zero_mag' + s] = sup['u_mag']
    return out
