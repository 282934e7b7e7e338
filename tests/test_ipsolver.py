"""Interior-point solver tests on standard NLPs (replacing IPOPT checks)."""
import jax
import jax.numpy as jnp
import numpy as np

from awebox_tpu.opti.ipsolver import InteriorPointSolver, IPOptions


def test_unconstrained_rosenbrock_with_bounds():
    def f(w, p):
        return (1. - w[0]) ** 2 + 100. * (w[1] - w[0] ** 2) ** 2

    def eq(w, p):
        return jnp.zeros(0)

    def ineq(w, p):
        return jnp.zeros(0)

    solver = InteriorPointSolver(f, eq, ineq, n=2, n_eq=0, n_ineq=0,
                                 options=IPOptions(tol=1e-10, max_iter=300))
    res = solver.solve(np.array([-1.2, 1.0]), None,
                       lbw=np.array([-5., -5.]), ubw=np.array([5., 5.]))
    assert res.success, res.status
    np.testing.assert_allclose(np.asarray(res.w), [1., 1.], atol=1e-6)


def test_equality_qp():
    # min 0.5 w'Qw - b'w  s.t.  Aw = c
    Q = np.diag([1., 2., 3.])
    b = np.array([1., 1., 1.])
    A = np.array([[1., 1., 1.]])
    c = np.array([1.])

    def f(w, p):
        return 0.5 * w @ (Q @ w) - b @ w

    def eq(w, p):
        return A @ w - c

    def ineq(w, p):
        return jnp.zeros(0)

    solver = InteriorPointSolver(f, eq, ineq, n=3, n_eq=1, n_ineq=0,
                                 options=IPOptions(tol=1e-10, max_iter=100))
    res = solver.solve(np.zeros(3), None,
                       lbw=-np.inf * np.ones(3), ubw=np.inf * np.ones(3))
    assert res.success, res.status
    # analytic KKT solution
    K = np.block([[Q, A.T], [A, np.zeros((1, 1))]])
    sol = np.linalg.solve(K, np.concatenate([b, c]))
    np.testing.assert_allclose(np.asarray(res.w), sol[:3], atol=1e-7)


def test_hs071():
    """Hock-Schittkowski 71, the canonical IPOPT example."""
    def f(w, p):
        return w[0] * w[3] * (w[0] + w[1] + w[2]) + w[2]

    def eq(w, p):
        return jnp.array([w @ w - 40.])

    def ineq(w, p):
        return jnp.array([25. - w[0] * w[1] * w[2] * w[3]])

    solver = InteriorPointSolver(f, eq, ineq, n=4, n_eq=1, n_ineq=1,
                                 options=IPOptions(tol=1e-9, max_iter=300))
    res = solver.solve(np.array([1., 5., 5., 1.]), None,
                       lbw=np.ones(4), ubw=5. * np.ones(4))
    assert res.success, (res.status, res.kkt_error)
    np.testing.assert_allclose(
        np.asarray(res.w), [1.0, 4.742999, 3.821150, 1.379408], atol=1e-5)
    np.testing.assert_allclose(float(f(res.w, None)), 17.0140173, atol=1e-5)


def test_nonconvex_needs_regularization():
    # concave objective pushed to a bound: requires primal regularization
    def f(w, p):
        return -jnp.sum(w ** 2)

    def eq(w, p):
        return jnp.zeros(0)

    def ineq(w, p):
        return jnp.zeros(0)

    solver = InteriorPointSolver(f, eq, ineq, n=2, n_eq=0, n_ineq=0,
                                 options=IPOptions(tol=1e-8, max_iter=200))
    res = solver.solve(np.array([0.3, -0.2]), None,
                       lbw=-np.ones(2), ubw=np.ones(2))
    assert res.success, res.status
    np.testing.assert_allclose(np.abs(np.asarray(res.w)), 1., atol=1e-6)


def test_mu_target_relaxed_barrier():
    """hippo strategy: with mu_target the solve stops at a relaxed barrier,
    keeping strictly interior iterates; warm-starting from there converges."""
    def f(w, p):
        return (w[0] - 2.) ** 2

    def eq(w, p):
        return jnp.zeros(0)

    def ineq(w, p):
        return jnp.zeros(0)

    opts = IPOptions(tol=1e-6, mu_target=1e-2, max_iter=100)
    solver = InteriorPointSolver(f, eq, ineq, n=1, n_eq=0, n_ineq=0, options=opts)
    res = solver.solve(np.array([0.5]), None, lbw=np.array([0.]), ubw=np.array([1.]))
    assert res.success
    # relaxed solution is pulled off the bound by the barrier
    assert 0.9 < float(res.w[0]) < 1.0 - 1e-4

    # tighten: warm start with mu_target 0
    solver2 = InteriorPointSolver(f, eq, ineq, n=1, n_eq=0, n_ineq=0,
                                  options=IPOptions(tol=1e-9, max_iter=100))
    state = dict(w=res.w, s=res.s, y=res.y, lam=res.lam, zl=res.zl, zu=res.zu,
                 mu=1e-2)
    res2 = solver2.solve(res.w, None, lbw=np.array([0.]), ubw=np.array([1.]),
                         state=state)
    assert res2.success
    np.testing.assert_allclose(float(res2.w[0]), 1.0, atol=1e-6)


def test_parametric_resolve_no_retrace():
    """The same compiled solver serves different parameter values (the
    homotopy reuses one compilation across steps)."""
    def f(w, p):
        return jnp.sum((w - p) ** 2)

    def eq(w, p):
        return jnp.array([w[0] + w[1] - 1.])

    def ineq(w, p):
        return jnp.zeros(0)

    solver = InteriorPointSolver(f, eq, ineq, n=2, n_eq=1, n_ineq=0,
                                 options=IPOptions(tol=1e-10, max_iter=50))
    for target in [np.array([0., 0.]), np.array([3., 1.])]:
        res = solver.solve(np.zeros(2), target,
                           lbw=-np.inf * np.ones(2), ubw=np.inf * np.ones(2))
        assert res.success
        expected = target + (1. - target.sum()) / 2.
        np.testing.assert_allclose(np.asarray(res.w), expected, atol=1e-7)
