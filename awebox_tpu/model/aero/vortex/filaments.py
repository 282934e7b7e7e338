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


# ----------------------------------------------------------------------
# complete elliptic integrals via Carlson symmetric forms (fixed-iteration
# duplication algorithm: smooth, jit-friendly, machine precision — replacing
# the reference's polynomial approximations of order <= 6,
# tools/vector_operations.py:512-660)
# ----------------------------------------------------------------------

def _carlson_rf(x, y, z, iters=16):
    """Carlson R_F(x, y, z) by duplication."""
    def body(_, carry):
        x, y, z = carry
        lam = jnp.sqrt(x) * jnp.sqrt(y) + jnp.sqrt(y) * jnp.sqrt(z) \
            + jnp.sqrt(z) * jnp.sqrt(x)
        return (0.25 * (x + lam), 0.25 * (y + lam), 0.25 * (z + lam))
    x, y, z = jax.lax.fori_loop(0, iters, body, (x, y, z))
    mu = (x + y + z) / 3.
    dx, dy, dz = 1. - x / mu, 1. - y / mu, 1. - z / mu
    e2 = dx * dy + dy * dz + dz * dx
    e3 = dx * dy * dz
    return (1. - e2 / 10. + e3 / 14. + e2 ** 2 / 24. - 3. * e2 * e3 / 44.) \
        / jnp.sqrt(mu)


def _carlson_rd(x, y, z, iters=16):
    """Carlson R_D(x, y, z) by duplication."""
    def body(_, carry):
        x, y, z, s, fac = carry
        lam = jnp.sqrt(x) * jnp.sqrt(y) + jnp.sqrt(y) * jnp.sqrt(z) \
            + jnp.sqrt(z) * jnp.sqrt(x)
        s = s + fac / (jnp.sqrt(z) * (z + lam))
        return (0.25 * (x + lam), 0.25 * (y + lam), 0.25 * (z + lam),
                s, 0.25 * fac)
    x, y, z, s, fac = jax.lax.fori_loop(
        0, iters, body, (x, y, z, jnp.zeros_like(x), jnp.ones_like(x)))
    mu = (x + y + 3. * z) / 5.
    dx, dy, dz = 1. - x / mu, 1. - y / mu, 1. - z / mu
    ea = dx * dy
    eb = dz * dz
    ec = ea - eb
    ed = ea - 6. * eb
    ee = ed + 2. * ec
    series = 1. - 3. * ed / 14. + 9. * ed ** 2 / 88. + dz * ee / 6. \
        - 9. * dz * (ea * dz - dz ** 3) / 52. / 2.
    return 3. * s + fac * series / (mu * jnp.sqrt(mu))


def _carlson_rj(x, y, z, p, iters=16):
    """Carlson R_J(x, y, z, p) by duplication (p > 0)."""
    def body(_, carry):
        x, y, z, p, s, fac = carry
        sx, sy, sz = jnp.sqrt(x), jnp.sqrt(y), jnp.sqrt(z)
        lam = sx * sy + sy * sz + sz * sx
        alpha = (p * (sx + sy + sz) + sx * sy * sz) ** 2
        beta = p * (p + lam) ** 2
        # RC(alpha, beta) via RF(alpha, beta, beta)
        s = s + fac * _carlson_rf(alpha, beta, beta, iters=12)
        return (0.25 * (x + lam), 0.25 * (y + lam), 0.25 * (z + lam),
                0.25 * (p + lam), s, 0.25 * fac)
    x, y, z, p, s, fac = jax.lax.fori_loop(
        0, iters, body,
        (x, y, z, p, jnp.zeros_like(x), jnp.ones_like(x)))
    mu = (x + y + z + 2. * p) / 5.
    dx, dy, dz = 1. - x / mu, 1. - y / mu, 1. - z / mu
    dp = 1. - p / mu
    ea = dx * dy + dy * dz + dz * dx
    eb = dx * dy * dz
    ec = dp ** 2
    series = 1. + 3. * (ec - ea / 2.) / 7. + eb / 3.
    return 3. * s + fac * series / (mu * jnp.sqrt(mu))


def elliptic_k(m):
    """Complete elliptic integral K(m), parameter convention m = k^2."""
    return _carlson_rf(jnp.zeros_like(m), 1. - m, jnp.ones_like(m))


def elliptic_e(m):
    """Complete elliptic integral E(m)."""
    one = jnp.ones_like(m)
    return _carlson_rf(jnp.zeros_like(m), 1. - m, one) \
        - m / 3. * _carlson_rd(jnp.zeros_like(m), 1. - m, one)


def elliptic_pi(n, m):
    """Complete elliptic integral Pi(n, m) (characteristic n, parameter m)."""
    one = jnp.ones_like(m)
    return _carlson_rf(jnp.zeros_like(m), 1. - m, one) \
        + n / 3. * _carlson_rj(jnp.zeros_like(m), 1. - m, one, 1. - n)


# ----------------------------------------------------------------------
# semi-infinite right vortex cylinders (the far-wake helix smeared into a
# vorticity tube): tangential + longitudinal sheet components, ported from
# the reference's regularized expressions
# (semi_infinite_tangential_right_cylinder.py:63-188,
#  semi_infinite_longitudinal_right_cylinder.py:56-138,
#  semi_infinite_right_cylinder.py:68-132)
# ----------------------------------------------------------------------

class SemiInfCylinders(NamedTuple):
    """Struct-of-arrays cylinder set: (N, 3) / (N,). ``tangential_strength``
    is the tangential sheet strength (-Gamma/pitch, signed);
    ``longitudinal_strength`` is Gamma/(2 pi R) (signed)."""
    x_center: jnp.ndarray
    l_hat: jnp.ndarray
    radius: jnp.ndarray
    l_start: jnp.ndarray
    epsilon_m: jnp.ndarray
    epsilon_r: jnp.ndarray
    tangential_strength: jnp.ndarray
    longitudinal_strength: jnp.ndarray


def _cylinder_frame(cyl: SemiInfCylinders, x_obs):
    diff = x_obs - cyl.x_center                                    # (N, 3)
    z_along = jnp.sum(diff * cyl.l_hat, axis=-1)
    radial = diff - cyl.l_hat * z_along[..., None]
    r_obs = jnp.sqrt(jnp.sum(radial * radial, axis=-1)
                     + cyl.epsilon_r ** 2)
    r_hat_base = radial / r_obs[..., None]
    zhat = jnp.array([0., 0., 1.])
    r_hat = r_hat_base + cyl.epsilon_m[..., None] * zhat
    r_hat = r_hat / jnp.sqrt(jnp.sum(r_hat * r_hat, axis=-1))[..., None]
    theta_hat = jnp.cross(cyl.l_hat, r_hat)
    theta_hat = theta_hat / jnp.sqrt(
        jnp.sum(theta_hat * theta_hat, axis=-1))[..., None]
    z_obs = z_along - cyl.l_start
    return r_obs, z_obs, r_hat, theta_hat


def _smooth_sign(x, eps):
    return jnp.tanh(x / jnp.maximum(eps, 1e-12))


def cylinder_induction(cyl: SemiInfCylinders, x_obs):
    """Induced velocity at one observer from N semi-infinite right
    cylinders, tangential + longitudinal vorticity sheets superposed."""
    r_obs, z_obs, r_hat, theta_hat = _cylinder_frame(cyl, x_obs)
    R = cyl.radius
    eps_r = cyl.epsilon_r

    den_m = (R + r_obs) ** 2 + z_obs ** 2 + eps_r ** 2
    m = 4. * r_obs * R / den_m
    m0 = 4. * r_obs * R / ((R + r_obs) ** 2 + eps_r ** 2)
    m = jnp.clip(m, 0., 1. - 1e-9)
    m0 = jnp.clip(m0, 0., 1. - 1e-9)
    K = elliptic_k(m)
    E = elliptic_e(m)
    PI = elliptic_pi(m0, m)
    sqrt_den = jnp.sqrt(den_m)

    # --- tangential sheet (tangential_right_cylinder.py:63-188) ----------
    sigma_t = cyl.tangential_strength
    u_rad = (-sigma_t / (2. * jnp.pi)) * sqrt_den / (r_obs + eps_r) \
        * ((1. - 0.5 * m) * K - E)
    inside = (_smooth_sign(R - r_obs, eps_r) + 1.) / 2.
    long_ell = z_obs / jnp.pi * (K * (R + r_obs + eps_r)
                                 + (R - r_obs) * PI) \
        / ((R + r_obs + eps_r) * sqrt_den)
    u_long = sigma_t / 2. * (inside + long_ell)

    # --- longitudinal sheet (longitudinal_right_cylinder.py:56-138) ------
    sigma_l = cyl.longitudinal_strength
    base = sigma_l * R / 2. * r_obs / (r_obs ** 2 + eps_r ** 2)
    outside = (1. - _smooth_sign(R - r_obs, eps_r)) / 2.
    tan_ell = z_obs / jnp.pi * (K - (R - r_obs) / (R + r_obs + eps_r) * PI) \
        / sqrt_den
    u_theta = base * (outside + tan_ell)

    return u_rad[..., None] * r_hat + u_long[..., None] * cyl.l_hat \
        + u_theta[..., None] * theta_hat


def total_induction(finite: FiniteFilaments, semi: SemiInfiniteFilaments,
                    x_obs, cylinders: SemiInfCylinders = None):
    """Superposed induced velocity at one observer point: (3,)."""
    u = jnp.zeros(3)
    if finite is not None:
        u = u + jnp.sum(finite_filament_induction(finite, x_obs), axis=0)
    if semi is not None:
        u = u + jnp.sum(semi_infinite_filament_induction(semi, x_obs), axis=0)
    if cylinders is not None:
        u = u + jnp.sum(cylinder_induction(cylinders, x_obs), axis=0)
    return u


def induction_at_observers(finite, semi, x_obs_batch, cylinders=None):
    """All-pairs kernel: (M, 3) induced velocity at M observers."""
    return jax.vmap(lambda xo: total_induction(finite, semi, xo,
                                               cylinders))(x_obs_batch)


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


def construct_test_cylinder(sigma_tan=1., sigma_long=0., radius=2.):
    """Semi-infinite +x cylinder starting at the origin
    (semi_infinite_right_cylinder.construct_test_object analog)."""
    return SemiInfCylinders(
        x_center=jnp.array([[0., 0., 0.]]),
        l_hat=jnp.array([[1., 0., 0.]]),
        radius=jnp.array([radius]),
        l_start=jnp.array([0.]),
        epsilon_m=jnp.array([1e-8]),
        epsilon_r=jnp.array([1e-8]),
        tangential_strength=jnp.array([sigma_tan]),
        longitudinal_strength=jnp.array([sigma_long]))


def test_tangential_cylinder_interior_axial_limit(epsilon=1e-3):
    """Far downstream inside the tube the axial velocity tends to the sheet
    strength sigma; outside it vanishes (the classical vortex-tube limits;
    reference semi_infinite_tangential_right_cylinder.py:612-700 tests)."""
    cyl = construct_test_cylinder(sigma_tan=1.3)
    u_in = cylinder_induction(cyl, jnp.array([1e5, 0.5, 0.]))[0]
    assert abs(float(u_in[0]) - 1.3) < epsilon, u_in
    u_out = cylinder_induction(cyl, jnp.array([1e5, 5., 0.]))[0]
    assert abs(float(u_out[0])) < epsilon, u_out


def test_tangential_cylinder_on_axis_radial_zero(epsilon=1e-6):
    """On the cylinder axis the radial induction vanishes
    (semi_infinite_tangential_right_cylinder.py:291-311)."""
    cyl = construct_test_cylinder(sigma_tan=1.)
    u = cylinder_induction(cyl, jnp.array([1., 0., 0.]))[0]
    r_comp = jnp.sqrt(u[1] ** 2 + u[2] ** 2)
    assert float(r_comp) < epsilon, u


def test_tangential_cylinder_start_plane_half(epsilon=1e-3):
    """At the starting plane, deep inside, axial velocity = sigma/2."""
    cyl = construct_test_cylinder(sigma_tan=2.)
    u = cylinder_induction(cyl, jnp.array([0., 0.2, 0.]))[0]
    assert abs(float(u[0]) - 1.) < epsilon, u


def cylinder_geometry(cyl: SemiInfCylinders, x_obs):
    """Observer geometry of the (possibly skewed) semi-infinite cylinder:
    (r_obs, z_obs, m, m0, r_hat, theta_hat). `l_hat` is arbitrary — the frame
    construction handles any axis orientation relative to the rotation plane,
    which is the role of the reference's skewed-cylinder object
    (semi_infinite_skewed_cylinder.py:70-131: r/z observation, regularized
    elliptic parameter m, epsilon_m-disambiguated observational axes)."""
    r_obs, z_obs, r_hat, theta_hat = _cylinder_frame(cyl, x_obs)
    R = cyl.radius
    eps_r = cyl.epsilon_r
    m = 4. * r_obs * R / ((R + r_obs) ** 2 + z_obs ** 2 + eps_r ** 2)
    m0 = 4. * r_obs * R / ((R + r_obs) ** 2 + eps_r ** 2)
    return r_obs, z_obs, m, m0, r_hat, theta_hat


def construct_test_skewed_cylinder(regularized=True):
    """Mirror of semi_infinite_skewed_cylinder.construct_test_object:
    unit-radius +x cylinder with (epsilon_m, epsilon_r) = (1e-5, 1) when
    regularized."""
    eps_m = 1e-5 if regularized else 1e-10
    eps_r = 1. if regularized else 1e-10
    return SemiInfCylinders(
        x_center=jnp.array([[0., 0., 0.]]),
        l_hat=jnp.array([[1., 0., 0.]]),
        radius=jnp.array([1.]),
        l_start=jnp.array([0.]),
        epsilon_m=jnp.array([eps_m]),
        epsilon_r=jnp.array([eps_r]),
        tangential_strength=jnp.array([1.]),
        longitudinal_strength=jnp.array([0.]))


def test_skewed_r_and_z_observation(epsilon=1e-4):
    """r/z observation on and off axis + before/at/on the cylinder
    (semi_infinite_skewed_cylinder.py:183-251 tests)."""
    cyl = construct_test_skewed_cylinder(regularized=False)
    r_on, z_on, *_ = cylinder_geometry(cyl, jnp.array([10., 0., 0.]))
    assert abs(float(r_on[0]) - 0.) < epsilon
    assert abs(float(z_on[0]) - 10.) < epsilon
    r_off, z_off, *_ = cylinder_geometry(cyl, jnp.array([10., 0., 3.]))
    assert abs(float(r_off[0]) - 3.) < epsilon
    _, z_bef, *_ = cylinder_geometry(cyl, jnp.array([-2., 0., 0.5]))
    assert abs(float(z_bef[0]) + 2.) < epsilon
    _, z_at, *_ = cylinder_geometry(cyl, jnp.array([0., 0., 1.]))
    assert abs(float(z_at[0])) < epsilon


def test_skewed_regularized_m_values(epsilon=1e-4):
    """Regularized elliptic parameter m: < 1 at the critical point
    (r = R, z = 0), -> 0 on axis / at large radius / far up- and downstream
    (semi_infinite_skewed_cylinder.py:253-337 tests)."""
    cyl = construct_test_skewed_cylinder(regularized=True)
    _, _, m_crit, _, _, _ = cylinder_geometry(cyl, jnp.array([0., 0., 1.]))
    assert float(m_crit[0]) < 1. - epsilon
    expected_crit = 4. * np.sqrt(2.) / (np.sqrt(2.) + 1.) ** 2 / \
        (1. + 1. / (np.sqrt(2.) + 1.) ** 2)
    # regularization moves r_obs to sqrt(r^2+eps_r^2): value is finite, < 1
    assert 0. < float(m_crit[0]) <= expected_crit + epsilon
    for x_obs in (jnp.array([5., 0., 0.]),          # on axis (r_obs = eps_r)
                  jnp.array([0., 0., 1e6]),         # large radius
                  jnp.array([1e6, 0., 1.]),         # far downstream
                  jnp.array([-1e6, 0., 1.])):       # far upstream
        _, _, m, _, _, _ = cylinder_geometry(cyl, x_obs)
        assert float(m[0]) < 0.5, (x_obs, m)


def test_skewed_observational_axes(epsilon=1e-4):
    """Axis disambiguation via epsilon_m: observer ON the cylinder axis gets
    r_hat ~ zhat (the assumed-orthogonal direction); off-axis observers get
    the exact radial/tangential frame
    (semi_infinite_skewed_cylinder.py:339-411 tests)."""
    cyl = construct_test_skewed_cylinder(regularized=True)
    # on x_hat (the axis): r_hat degenerates; epsilon_m picks zhat
    _, _, _, _, r_hat, theta_hat = cylinder_geometry(
        cyl, jnp.array([10., 0., 0.]))
    assert abs(float(r_hat[0, 2]) - 1.) < 1e-2, r_hat
    # on z_hat: exact radial
    _, _, _, _, r_hat, theta_hat = cylinder_geometry(
        cyl, jnp.array([0., 0., 5.]))
    assert abs(float(r_hat[0, 2]) - 1.) < epsilon
    th_expected = jnp.cross(cyl.l_hat[0], r_hat[0])
    assert float(jnp.linalg.norm(theta_hat[0] - th_expected)) < epsilon
    # on y_hat: radial along +y, theta along l x r = -z... (x cross y = z)
    _, _, _, _, r_hat, theta_hat = cylinder_geometry(
        cyl, jnp.array([0., 5., 0.]))
    assert abs(float(r_hat[0, 1]) - 1.) < 1e-2
    assert abs(float(theta_hat[0, 2]) - 1.) < 1e-2


def test_skewed_axis_induction_consistency(epsilon=1e-6):
    """A cylinder with a SKEWED axis (not wind-aligned) must produce the
    same induction as the axis-aligned cylinder under the corresponding
    rigid rotation — the kernel is frame-covariant, which is what makes the
    separate skewed-cylinder object of the reference unnecessary here."""
    cyl0 = construct_test_cylinder(sigma_tan=1.3)
    x_obs0 = jnp.array([2., 0.4, 0.1])
    u0 = cylinder_induction(cyl0, x_obs0)[0]

    # rotate axis by 30 degrees about z
    c, s = np.cos(0.5), np.sin(0.5)
    Rz = jnp.array([[c, -s, 0.], [s, c, 0.], [0., 0., 1.]])
    cyl_skew = cyl0._replace(l_hat=(Rz @ cyl0.l_hat[0])[None, :])
    u_skew = cylinder_induction(cyl_skew, Rz @ x_obs0)[0]
    # compare in the rotated frame; the epsilon_m tie-break direction (zhat)
    # is invariant under rotations about z, so covariance is exact here
    assert float(jnp.linalg.norm(Rz @ u0 - u_skew)) < 1e-4, (u0, u_skew)


def test_longitudinal_cylinder_circulation_limit(epsilon=1e-3):
    """Far downstream the longitudinal sheet acts as a 2D vortex tube:
    u_theta = sigma_l R / r outside, 0 inside
    (semi_infinite_longitudinal_right_cylinder.py tests)."""
    R = 2.
    cyl = construct_test_cylinder(sigma_tan=0., sigma_long=1., radius=R)
    r_out = 5.
    u_out = cylinder_induction(cyl, jnp.array([1e5, r_out, 0.]))[0]
    # theta_hat at +y observer (l_hat = +x, r_hat = +y) is l x r = +z
    expected = 1. * R / r_out
    assert abs(float(u_out[2]) - expected) / expected < 2e-2, u_out
    u_in = cylinder_induction(cyl, jnp.array([1e5, 0.3, 0.]))[0]
    assert abs(float(u_in[2])) < epsilon, u_in
