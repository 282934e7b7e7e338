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
    raise ValueError(f'unsupported wind model {model}')


def get_velocity(model: str, params, zz):
    """3-vector wind velocity at altitude zz (wind blows along +x)."""
    u = get_speed(model, params, zz)
    return jnp.stack([u, jnp.zeros_like(u), jnp.zeros_like(u)], axis=-1)
