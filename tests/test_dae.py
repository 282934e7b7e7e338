"""DAE rootfinder and rk4root integrator tests (mdl/dae.py analog)."""
import jax.numpy as jnp
import numpy as np
import pytest

from awebox_tpu.model.dae import Dae
from tests.test_model_dynamics import build_3dof_model, set_var

pytestmark = pytest.mark.slow  # compile-heavy tier; core suite runs without -m slow


def make_dae():
    model, processed, arch = build_3dof_model()
    layout = model.layout
    theta_model = np.zeros(layout.dims['theta'])
    theta_model[layout.slices['theta']['diam_t']] = 2e-3 / model.scaling['theta'][
        layout.slices['theta']['diam_t']]
    theta_model[layout.slices['theta']['t_f']] = 1.0
    return Dae(model, theta_model), model


def circle_state(model):
    """Consistent circular state in scaled coordinates."""
    l_t = 200.
    speed = 25.
    v = np.zeros(model.layout.total_dim)
    q = l_t / np.sqrt(2.) * np.array([1., 0., 1.])
    set_var(model, v, 'x', 'q10', q)
    set_var(model, v, 'x', 'dq10', speed * np.array([0., 1., 0.]))
    set_var(model, v, 'x', 'coeff10', np.array([1., 0.]))
    set_var(model, v, 'x', 'l_t', l_t)
    set_var(model, v, 'x', 'dl_t', 0.)
    set_var(model, v, 'x', 'e', 0.)
    x_off = model.layout.type_offsets['x']
    return v[x_off:x_off + model.layout.dims['x']]


def test_rootfinder_consistency():
    dae, model = make_dae()
    x = jnp.asarray(circle_state(model))
    u = jnp.zeros(dae.nu)
    theta0 = model.theta0_init
    zd = dae.consistent_zd(x, u, theta0)
    res = dae._residual(x, zd, u, theta0)
    assert float(jnp.max(jnp.abs(res))) < 1e-8
    # the tether multiplier must be positive (taut tether on a circle)
    lam = zd[dae.nxd:][0]
    assert float(lam) > 0.


def test_rk4root_preserves_invariant():
    dae, model = make_dae()
    x = jnp.asarray(circle_state(model))
    u = jnp.zeros(dae.nu)
    theta0 = model.theta0_init
    zd0 = dae.consistent_zd(x, u, theta0)
    xf, zdf = dae.integrate(x, u, zd0, 0.5, 10, theta0)
    assert bool(jnp.all(jnp.isfinite(xf)))
    # |q| stays near l_t (Baumgarte-stabilized holonomic constraint)
    layout = model.layout
    q_sl = layout.slices['x']['q10']
    q_scale = model.scaling['x'][q_sl]
    q = np.asarray(xf[q_sl]) * q_scale
    l_sl = layout.slices['x']['l_t']
    l_t = float(xf[l_sl][0]) * model.scaling['x'][l_sl][0]
    assert abs(np.linalg.norm(q) - l_t) / l_t < 1e-2
