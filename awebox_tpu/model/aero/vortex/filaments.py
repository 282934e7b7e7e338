"""Vortex filament Biot-Savart kernels (pure JAX, batched all-pairs).

TPU-native re-design of /root/reference/awebox/mdl/aero/induction_dir/
vortex_dir/vortex_objects_dir/{finite_filament,semi_infinite_filament,
element_list}.py. The reference packs per-element info vectors and maps a
CasADi Function over an element list (element_list.py `construct_biot_savart
_at_obs_map`); here the element set is a struct-of-arrays pytree with a
leading element axis, and induction at observers is one vmapped pairwise
kernel (elements x observers) — the same blockwise shape as attention, so it
tiles onto the MXU/VPU without per-element dispatch.

Regularization follows the van-Garrel / OLAF cut-off model used by the
reference (finite_filament.py:88-104): the denominator is augmented by
epsilon = r_core^2 * length^2 (finite) or r_core^2 (semi-infinite), keeping
the kernel smooth through on-filament observations — which also keeps the
NLP derivatives bounded.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class FiniteFilaments(NamedTuple):
    """Struct-of-arrays filament set: shapes (..., N, 3) / (..., N)."""
    x_start: jnp.ndarray
    x_end: jnp.ndarray
    r_core: jnp.ndarray
    strength: jnp.ndarray


class SemiInfiniteFilaments(NamedTuple):
    x_start: jnp.ndarray
    l_hat: jnp.ndarray      # unit direction of the semi-infinite leg
    r_core: jnp.ndarray
    strength: jnp.ndarray


def finite_filament_induction(fil: FiniteFilaments, x_obs):
    """Induced velocity at one observer from N finite filaments: (N, 3).

    Biot-Savart with van-Garrel cut-off (finite_filament.py:69-104):
        u = Gamma/(4 pi) * (r0 + r1) (vec0 x vec1)
            / (r0^2 r1^2 + r0 r1 (vec0.vec1) + r_core^2 L^2)
    """
    vec_0 = fil.x_start - x_obs
    vec_1 = fil.x_end - x_obs
    r_sq_0 = jnp.sum(vec_0 * vec_0, axis=-1)
    r_sq_1 = jnp.sum(vec_1 * vec_1, axis=-1)
    r_0 = jnp.sqrt(r_sq_0)
    r_1 = jnp.sqrt(r_sq_1)

    seg = fil.x_end - fil.x_start
    length_sq = jnp.sum(seg * seg, axis=-1)
    epsilon = fil.r_core ** 2 * length_sq

    factor = fil.strength / (4. * jnp.pi)
    num = (factor * (r_0 + r_1))[..., None] * jnp.cross(vec_0, vec_1)
    den = r_sq_0 * r_sq_1 + r_0 * r_1 * jnp.sum(vec_0 * vec_1, axis=-1) \
        + epsilon
    return num / den[..., None]


def semi_infinite_filament_induction(fil: SemiInfiniteFilaments, x_obs):
    """Induced velocity at one observer from N semi-infinite filaments
    (semi_infinite_filament.py:67-90):
        u = Gamma/(4 pi) * (vec0 x l_hat) / (r0^2 + r0 (l_hat.vec0) + rc^2)
    """
    vec_0 = fil.x_start - x_obs
    r_sq_0 = jnp.sum(vec_0 * vec_0, axis=-1)
    r_0 = jnp.sqrt(r_sq_0)
    factor = fil.strength / (4. * jnp.pi)
    num = factor[..., None] * jnp.cross(vec_0, fil.l_hat)
    den = r_sq_0 + r_0 * jnp.sum(fil.l_hat * vec_0, axis=-1) \
        + fil.r_core ** 2
    return num / den[..., None]


def total_induction(finite: FiniteFilaments, semi: SemiInfiniteFilaments,
                    x_obs):
    """Superposed induced velocity at one observer point: (3,)."""
    u = jnp.zeros(3)
    if finite is not None:
        u = u + jnp.sum(finite_filament_induction(finite, x_obs), axis=0)
    if semi is not None:
        u = u + jnp.sum(semi_infinite_filament_induction(semi, x_obs), axis=0)
    return u


def induction_at_observers(finite, semi, x_obs_batch):
    """All-pairs kernel: (M, 3) induced velocity at M observers."""
    return jax.vmap(lambda xo: total_induction(finite, semi, xo))(x_obs_batch)


# ----------------------------------------------------------------------
# embedded self-tests, mirroring the reference's in-module test functions
# (finite_filament.py:117-163, semi_infinite_filament.py:131-200); invoked
# from tests/test_vortex.py the way test_aero_components.py:14 does.
# ----------------------------------------------------------------------

def construct_test_filament(r_core=0.):
    """Unit filament from -x to +x with Gamma = 4 pi
    (finite_filament.py:118-131)."""
    return FiniteFilaments(
        x_start=jnp.array([[-1., 0., 0.]]),
        x_end=jnp.array([[1., 0., 0.]]),
        r_core=jnp.array([r_core]),
        strength=jnp.array([4. * np.pi]),
    )


def test_far_field_decay(epsilon=1e-4):
    fil = construct_test_filament()
    u = total_induction(fil, None, jnp.array([0., 0., 1.e4]))
    assert float(jnp.linalg.norm(u)) < epsilon, 'far-field decay failed'


def test_right_hand_rule(epsilon=1e-8):
    """At z=+1 above a +x filament, induced velocity points along -y
    (right-hand rule; the reference asserts normalize(u) == -yhat,
    finite_filament.py:139-150)."""
    fil = construct_test_filament()
    u = total_induction(fil, None, jnp.array([0., 0., 1.]))
    assert float(u[1]) < 0., 'right-hand rule failed'
    assert abs(float(u[0])) < epsilon and abs(float(u[2])) < epsilon


def test_2d_limit(epsilon=1e-2):
    """A very long filament approaches the 2D vortex u = Gamma/(2 pi h)
    (finite_filament.py:152-163)."""
    fil = FiniteFilaments(
        x_start=jnp.array([[-1.e5, 0., 0.]]),
        x_end=jnp.array([[1.e5, 0., 0.]]),
        r_core=jnp.array([0.]),
        strength=jnp.array([4. * np.pi]),
    )
    h = 2.
    u = total_induction(fil, None, jnp.array([0., 0., h]))
    expected = -4. * np.pi / (2. * np.pi * h)
    assert abs(float(u[1]) - expected) / abs(expected) < epsilon


def test_semi_infinite_against_half_symmetry(epsilon=1e-6):
    """A semi-infinite +x filament starting at the origin induces exactly
    half of a doubly-infinite filament at points on the plane x=0."""
    semi = SemiInfiniteFilaments(
        x_start=jnp.array([[0., 0., 0.]]),
        l_hat=jnp.array([[1., 0., 0.]]),
        r_core=jnp.array([0.]),
        strength=jnp.array([4. * np.pi]),
    )
    h = 3.
    u = total_induction(None, semi, jnp.array([0., 0., h]))
    expected_full_2d = 4. * np.pi / (2. * np.pi * h)
    assert abs(float(u[1]) + 0.5 * expected_full_2d) < epsilon


def test_regularization_on_filament():
    """With a nonzero core radius the kernel is finite ON the filament."""
    fil = construct_test_filament(r_core=0.05)
    u = total_induction(fil, None, jnp.array([0., 0., 0.]))
    assert bool(jnp.all(jnp.isfinite(u)))
