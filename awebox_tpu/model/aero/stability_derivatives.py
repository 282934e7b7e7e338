"""Polynomial stability-derivative evaluation (pure JAX).

Evaluates force/moment coefficient tables
``stab_derivs[Ccoeff][input] = [c0, c1, c2, ...]`` meaning the contribution
``(c0 + c1*alpha + c2*alpha^2 + ...) * input_value`` to the coefficient, with
inputs alpha, beta, normalized body rates p,q,r and surface deflections.
Matches /root/reference/awebox/mdl/aero/kite_dir/stability_derivatives.py:41-250.

The table arrives as a pytree of coefficient arrays inside theta0 so sweeps
over aero parameters vmap; the *structure* (which coeffs exist, frames) is
static and baked into the closure.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import frames

FORCE_COEFFS_BY_FRAME = {
    'control': ['CX', 'CY', 'CZ'],
    'earth': ['Cx', 'Cy', 'Cz'],
    'body': ['CA', 'CY', 'CN'],
    'wind': ['CD', 'CS', 'CL'],
}
MOMENT_COEFFS_BY_FRAME = {'control': ['Cl', 'Cm', 'Cn']}

MOMENT_COEFF_NAMES = ('Cl', 'Cm', 'Cn')
DEFLECTION_INPUTS = ('deltaa', 'deltae', 'deltar')


def collect_inputs(alpha, beta, airspeed, omega, delta, geometry, named_frame):
    """Input dict for the derivative tables; omega is in body frame."""
    if named_frame == 'control':
        omega = frames.from_body_to_control(omega)
        beta = -beta

    omega_hat = omega / (2. * airspeed)
    lengths = jnp.array([geometry['b_ref'], geometry['c_ref'], geometry['b_ref']])
    omega_hat = omega_hat * lengths

    return {
        '0': jnp.asarray(1.),
        'alpha': alpha, 'beta': beta,
        'p': omega_hat[0], 'q': omega_hat[1], 'r': omega_hat[2],
        'deltaa': delta[0], 'deltae': delta[1], 'deltar': delta[2],
    }


def evaluate(stab_derivs_structure, alpha, beta, airspeed, omega, delta,
             theta0, force_frame, moment_frame):
    """Returns (CF_3vec, CM_3vec) in their declared frames.

    stab_derivs_structure: static dict coeff->list-of-input-names.
    theta0['aero']['stab_derivs'][coeff][input]: runtime coefficient stacks.
    """
    geometry = theta0['geometry']
    tables = theta0['aero']['stab_derivs']
    moment_factor = theta0['aero']['moment_factor']

    inputs = collect_inputs(alpha, beta, airspeed, omega, delta, geometry,
                            force_frame)
    if moment_frame != force_frame:
        moment_inputs = collect_inputs(alpha, beta, airspeed, omega, delta,
                                       geometry, moment_frame)
    else:
        moment_inputs = inputs

    coeffs = {}
    for coeff_name, input_names in stab_derivs_structure.items():
        if coeff_name == 'frame':
            continue
        use_inputs = moment_inputs if coeff_name in MOMENT_COEFF_NAMES else inputs
        alpha_val = use_inputs['alpha']
        total = 0.
        for input_name in input_names:
            stack = jnp.asarray(tables[coeff_name][input_name])
            # contribution = sum_l stack[l] * input * alpha^l; built by
            # cumprod, NOT alpha**arange: d/da a**0 is NaN at a=0 in autodiff
            if stack.shape[0] == 1:
                alpha_powers = jnp.ones(1)
            else:
                alpha_powers = jnp.cumprod(jnp.concatenate(
                    [jnp.ones(1), jnp.broadcast_to(alpha_val, (stack.shape[0] - 1,))]))
            is_weighted = (coeff_name in MOMENT_COEFF_NAMES
                           and input_name in DEFLECTION_INPUTS)  # static
            weight = moment_factor if is_weighted else 1.0
            total = total + weight * jnp.sum(stack * alpha_powers) * use_inputs[input_name]
        coeffs[coeff_name] = total

    CF = jnp.stack([coeffs[c] for c in FORCE_COEFFS_BY_FRAME[force_frame]])
    CM_names = MOMENT_COEFFS_BY_FRAME[moment_frame]
    CM = jnp.stack([coeffs.get(c, jnp.asarray(0.)) for c in CM_names])
    return CF, CM
