"""Structured derivatives must match dense autodiff exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from awebox_tpu.arch import Architecture
from awebox_tpu.api.trial import Trial
from awebox_tpu.ocp.structured import make_structured_derivs
from awebox_tpu.opti import homotopy as hm
from awebox_tpu.opti.initialization import build_initial_guess, build_reference
from tests.test_options import make_ampyx_options
import pytest

pytestmark = pytest.mark.slow  # compile-heavy tier; core suite runs without -m slow


def test_structured_matches_dense():
    options = make_ampyx_options()
    options['user_options.system_model.kite_dof'] = 3
    options['nlp.n_k'] = 3
    options['nlp.collocation.d'] = 2
    trial = Trial(options, 's').build()
    ocp = trial.ocp

    V0 = build_initial_guess(ocp)
    P = hm.build_p_fix(ocp, build_reference(ocp, V0))
    # make the cost weights non-trivial so every Hessian piece is exercised
    for name in ('tracking', 'u_regularisation', 'xdot_regularisation',
                 'theta_regularisation', 'fictitious', 'power', 't_f', 'beta'):
        P['cost'][name] = jnp.asarray(0.3 + 0.1 * len(name))

    rng = np.random.default_rng(5)
    w = jnp.asarray(V0 + 0.05 * rng.normal(size=V0.shape))
    y = jnp.asarray(rng.normal(size=ocp.n_eq))
    lam = jnp.asarray(np.abs(rng.normal(size=ocp.n_ineq)) + 0.1)

    derivs = make_structured_derivs(ocp)
    fval_s, gradf_s, cE_s, cI_s, JE_s, JI_s, H_s = derivs(w, y, lam, P)

    # dense reference
    fval_d = ocp.f_fn(w, P)
    gradf_d = jax.grad(ocp.f_fn)(w, P)
    cE_d = ocp.eq_fn(w, P)
    cI_d = ocp.ineq_fn(w, P)
    JE_d = jax.jacfwd(ocp.eq_fn)(w, P)
    JI_d = jax.jacfwd(ocp.ineq_fn)(w, P)

    def lagr(ww):
        return ocp.f_fn(ww, P) + y @ ocp.eq_fn(ww, P) + lam @ ocp.ineq_fn(ww, P)
    H_d = jax.hessian(lagr)(w)

    np.testing.assert_allclose(float(fval_s), float(fval_d), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gradf_s), np.asarray(gradf_d),
                               atol=1e-10, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(cE_s), np.asarray(cE_d), atol=1e-12)
    np.testing.assert_allclose(np.asarray(cI_s), np.asarray(cI_d), atol=1e-12)
    np.testing.assert_allclose(np.asarray(JE_s), np.asarray(JE_d),
                               atol=1e-9, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(JI_s), np.asarray(JI_d),
                               atol=1e-9, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(H_s), np.asarray(H_d),
                               atol=1e-8, rtol=1e-6)
