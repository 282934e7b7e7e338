"""Multi-device dryrun: the driver-level gate, run as a pytest on the
8-device virtual CPU mesh (conftest sets xla_force_host_platform_device_count).

Mirrors __graft_entry__.dryrun_multichip: batched interior-point steps sharded
over a jax.sharding.Mesh must stay finite (SURVEY section 5.8).
"""
import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow  # compile-heavy tier; core suite runs without -m slow


@pytest.mark.slow
@pytest.mark.heavy
def test_dryrun_multichip_8():
    import __graft_entry__ as g
    n = len(jax.devices())
    assert n >= 8, f'conftest should provide 8 virtual devices, got {n}'
    g.dryrun_multichip(8)


@pytest.mark.slow
@pytest.mark.heavy
def test_fleet_sharded_matches_single_device():
    """The fleet driver (parallel/fleet.py) must produce identical iterates
    on a 1-device mesh and on the full 8-virtual-device mesh — pure data
    parallelism, no collectives (SURVEY section 5.8)."""
    import jax
    import jax.numpy as jnp
    from awebox_tpu.api.trial import Trial
    from awebox_tpu.opti.homotopy import (build_p_fix, define_schedule,
                                          set_initial_bounds)
    from awebox_tpu.opti.initialization import build_initial_guess, \
        build_reference
    from awebox_tpu.parallel import fleet
    from awebox_tpu.parallel.batch import init_batched_state, stack_p
    from tests.test_options import make_ampyx_options

    options = make_ampyx_options()
    options['user_options.system_model.kite_dof'] = 3
    options['nlp.n_k'] = 3
    options['nlp.collocation.d'] = 2
    trial = Trial(options, 'fleet').build()
    ocp = trial.ocp
    V0 = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V0))
    schedule = define_schedule(ocp)
    lb, ub = set_initial_bounds(ocp, trial.lb_nominal, trial.ub_nominal, V0,
                                schedule)
    B = 8
    rng = np.random.default_rng(3)
    batch = [V0 + 1e-4 * rng.normal(size=V0.shape) for _ in range(B)]
    state = init_batched_state(ocp, batch, P, lb, ub)
    P_batch = stack_p([P] * B)

    out_1, _ = fleet.run_fleet(ocp, lb, ub, state, P_batch,
                               mesh=fleet.fleet_mesh(jax.devices()[:1]),
                               n_iter=3)
    out_n, _ = fleet.run_fleet(ocp, lb, ub, state, P_batch,
                               mesh=fleet.fleet_mesh(), n_iter=3)
    np.testing.assert_allclose(np.asarray(out_n['w']),
                               np.asarray(out_1['w']), rtol=1e-10, atol=1e-12)
    assert np.isfinite(np.asarray(out_n['w'])).all()


@pytest.mark.slow
@pytest.mark.heavy
def test_measure_scaling_8_virtual_devices():
    """`fleet.measure_scaling` (BASELINE.md scaling anchor) must run on the
    8-virtual-device CPU mesh and report a sane speedup: sharding 8 scenarios
    over 8 devices must not be slower than pinning all 8 on one device.
    (On the 2-core CI host the measurable parallelism ceiling is ~2x and the
    single-device run already multithreads inside XLA, so this asserts
    no-pathology, not linear scaling; benchmarks/measure_scaling.py commits
    the scaling artifact with the raw walls.)"""
    import jax
    from awebox_tpu.api.trial import Trial
    from awebox_tpu.opti.homotopy import (build_p_fix, define_schedule,
                                          set_initial_bounds)
    from awebox_tpu.opti.initialization import build_initial_guess, \
        build_reference
    from awebox_tpu.parallel import fleet
    from awebox_tpu.parallel.batch import init_batched_state, stack_p
    from tests.test_options import make_ampyx_options

    options = make_ampyx_options()
    options['user_options.system_model.kite_dof'] = 3
    options['nlp.n_k'] = 3
    options['nlp.collocation.d'] = 2
    trial = Trial(options, 'scaling').build()
    ocp = trial.ocp
    V0 = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V0))
    schedule = define_schedule(ocp)
    lb, ub = set_initial_bounds(ocp, trial.lb_nominal, trial.ub_nominal, V0,
                                schedule)
    B = 8
    rng = np.random.default_rng(7)
    batch = [V0 + 1e-4 * rng.normal(size=V0.shape) for _ in range(B)]
    state = init_batched_state(ocp, batch, P, lb, ub)
    P_batch = stack_p([P] * B)

    report = fleet.measure_scaling(ocp, lb, ub, state, P_batch, n_iter=10)
    assert report['devices'] >= 8
    assert report['wall_1'] > 0. and report['wall_n'] > 0.
    assert report['speedup'] > 0.8, report


def test_ip_step_ladder_recovers_from_indefinite():
    """The in-jit regularization ladder must produce finite iterates even
    when the Hessian is indefinite / non-finite (the round-1 failure mode)."""
    import jax.numpy as jnp
    from awebox_tpu.parallel.batch import make_ip_step

    class FakeVS:
        total = 4

    class FakeOCP:
        vstruct = FakeVS()
        n_eq = 1
        n_ineq = 1

    n = 4

    def derivs(w, y, lam, p):
        fval = jnp.sum(w ** 2)
        gradf = 2 * w
        cE = jnp.array([w[0] + w[1] - 1.])
        cI = jnp.array([w[2] - 10.])
        JE = jnp.array([[1., 1., 0., 0.]])
        JI = jnp.array([[0., 0., 1., 0.]])
        # strongly indefinite Hessian with a NaN: the ladder must sanitize
        # and damp it rather than propagate NaNs
        H = -100. * jnp.eye(n)
        H = H.at[0, 0].set(jnp.nan)
        return fval, gradf, cE, cI, JE, JI, H

    step = make_ip_step(FakeOCP(), derivs_fn=derivs)
    lbw = jnp.full((n,), -jnp.inf)
    ubw = jnp.full((n,), jnp.inf)
    free = jnp.ones(n)
    state = dict(w=jnp.ones(n), s=jnp.ones(1), y=jnp.zeros(1),
                 lam=jnp.ones(1), zl=jnp.zeros(n), zu=jnp.zeros(n),
                 mu=jnp.asarray(1e-1))
    for _ in range(3):
        state = step(state, {}, lbw, ubw, free)
    flat, _ = jax.tree_util.tree_flatten(state)
    for leaf in flat:
        assert bool(jnp.all(jnp.isfinite(leaf))), 'non-finite iterate leaked'
