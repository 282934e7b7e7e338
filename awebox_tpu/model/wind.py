"""Wind profile models (log / power-law / uniform) as pure JAX functions.

Behavior matches /root/reference/awebox/mdl/wind.py:50-209. Wind direction is
fixed along +x (wind.py:88-89). Parameters (u_ref, z_ref, z0_air, exp_ref)
come in as a pytree so sweeps over wind speed vmap cleanly.
"""
from __future__ import annotations

import jax.numpy as jnp


def smooth_abs(x, epsilon=1.0):
    return jnp.sqrt(x ** 2 + epsilon ** 2)


def get_speed(model: str, params, zz):
    z_cropped = smooth_abs(zz, 1.0)
    if model == 'log_wind':
        return params['u_ref'] * jnp.log10(z_cropped / params['z0_air']) \
            / jnp.log10(params['z_ref'] / params['z0_air'])
    elif model == 'power':
        return params['u_ref'] * (z_cropped / params['z_ref']) ** params['exp_ref']
    elif model == 'uniform':
        return params['u_ref'] * jnp.ones_like(zz)
    elif model == 'datafile':
        ux = _eval_fit(params['fit_x'], params['fit_z_scale'], z_cropped)
        uy = _eval_fit(params['fit_y'], params['fit_z_scale'], z_cropped)
        return jnp.sqrt(ux ** 2 + uy ** 2 + 1e-12)
    raise ValueError(f'unsupported wind model {model}')


def get_velocity(model: str, params, zz):
    """3-vector wind velocity at altitude zz. For the analytic profiles the
    wind blows along +x (wind.py:88-89); the datafile profile carries x and y
    components from the measured series (wind.py:110-173)."""
    if model == 'datafile':
        z_cropped = smooth_abs(zz, 1.0)
        ux = _eval_fit(params['fit_x'], params['fit_z_scale'], z_cropped)
        uy = _eval_fit(params['fit_y'], params['fit_z_scale'], z_cropped)
        return jnp.stack([ux, uy, jnp.zeros_like(ux)], axis=-1)
    u = get_speed(model, params, zz)
    return jnp.stack([u, jnp.zeros_like(u), jnp.zeros_like(u)], axis=-1)


def _eval_fit(coeffs, z_scale, zz):
    """Evaluate fitted profile polynomial at normalized altitude."""
    return jnp.polyval(jnp.asarray(coeffs), zz / z_scale)


def fit_datafile_profile(heights, u_x, u_y, degree=None, penalty=1e-5):
    """Penalized polynomial fit of a measured wind profile — the role of the
    reference's smooth_lagrange_poly (tools/lagr_interpol.py:1-80 +
    wind.py:107-173): heights are normalized by their max, and the
    least-squares system carries a curvature (second-difference on the
    coefficients) penalty so sparse noisy profiles stay smooth.

    Returns params dict fragment {'fit_x', 'fit_y', 'fit_z_scale'} (numpy,
    build-time; evaluation is jax polyval)."""
    import numpy as np
    heights = np.asarray(heights, dtype=float)
    z_scale = float(np.max(heights))
    zn = heights / z_scale
    n = len(heights)
    if degree is None:
        degree = min(n - 1, 6)

    V = np.vander(zn, degree + 1)          # columns: z^d ... z^0
    # curvature penalty on the fitted curve sampled densely
    zs = np.linspace(zn.min(), zn.max(), 64)
    d2 = np.stack([np.polyder(np.eye(degree + 1)[i], 2) for i in range(degree + 1)])

    def solve(vals):
        A = V.T @ V
        # penalize integral of (f'')^2: Gram matrix of second derivatives
        G = np.zeros((degree + 1, degree + 1))
        for i in range(degree + 1):
            for j in range(degree + 1):
                pi, pj = d2[i], d2[j]
                prod = np.polymul(pi, pj)
                integ = np.polyint(prod)
                G[i, j] = np.polyval(integ, zs.max()) - np.polyval(integ, zs.min())
        coeffs = np.linalg.solve(A + penalty * G, V.T @ np.asarray(vals, dtype=float))
        return coeffs

    return {'fit_x': solve(u_x), 'fit_y': solve(u_y),
            'fit_z_scale': np.asarray(z_scale)}
