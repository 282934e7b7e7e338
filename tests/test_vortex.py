"""Vortex wake model tests.

Runs the embedded Biot-Savart self-tests the way the reference does
(test/units/test_aero_components.py:14 -> finite_filament.py:117-163), plus
transcription-level checks of the gathered-wake residual.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from awebox_tpu.arch import Architecture
from awebox_tpu.model.aero.vortex import filaments as fil
from awebox_tpu.model.builder import make_model
from awebox_tpu.ocp.transcription import build_ocp
from tests.test_options import make_ampyx_options


def test_embedded_selftests():
    fil.test_far_field_decay()
    fil.test_right_hand_rule()
    fil.test_2d_limit()
    fil.test_semi_infinite_against_half_symmetry()
    fil.test_regularization_on_filament()


def test_embedded_cylinder_selftests():
    """Far-wake cylinder elements (semi_infinite_*_right_cylinder.py)."""
    fil.test_tangential_cylinder_interior_axial_limit()
    fil.test_tangential_cylinder_on_axis_radial_zero()
    fil.test_tangential_cylinder_start_plane_half()
    fil.test_longitudinal_cylinder_circulation_limit()


def test_embedded_skewed_cylinder_selftests():
    """Skewed-cylinder observation geometry + frame covariance
    (semi_infinite_skewed_cylinder.py:150-434 embedded test suite)."""
    fil.test_skewed_r_and_z_observation()
    fil.test_skewed_regularized_m_values()
    fil.test_skewed_observational_axes()
    fil.test_skewed_axis_induction_consistency()


def test_elliptic_integrals_against_known_values():
    """Carlson-form elliptic integrals (replacing the reference's order-6
    polynomial approximations, vector_operations.py:512-660)."""
    import math
    # K(0) = E(0) = pi/2
    assert abs(float(fil.elliptic_k(jnp.asarray(0.))) - math.pi / 2.) < 1e-10
    assert abs(float(fil.elliptic_e(jnp.asarray(0.))) - math.pi / 2.) < 1e-10
    # tabulated values (Abramowitz & Stegun)
    assert abs(float(fil.elliptic_k(jnp.asarray(0.5))) - 1.8540746773) < 1e-8
    assert abs(float(fil.elliptic_e(jnp.asarray(0.5))) - 1.3506438810) < 1e-8
    # Pi(0, m) = K(m); Pi(n, 0) = pi / (2 sqrt(1-n))
    assert abs(float(fil.elliptic_pi(jnp.asarray(0.), jnp.asarray(0.7)))
               - float(fil.elliptic_k(jnp.asarray(0.7)))) < 1e-9
    assert abs(float(fil.elliptic_pi(jnp.asarray(0.36), jnp.asarray(0.)))
               - math.pi / (2. * math.sqrt(0.64))) < 1e-9


def test_superposition_linearity():
    """Induction is linear in strength and additive over elements."""
    f1 = fil.construct_test_filament()
    f2 = fil.FiniteFilaments(
        x_start=f1.x_start, x_end=f1.x_end, r_core=f1.r_core,
        strength=2. * f1.strength)
    obs = jnp.array([0.3, -0.2, 1.5])
    u1 = fil.total_induction(f1, None, obs)
    u2 = fil.total_induction(f2, None, obs)
    np.testing.assert_allclose(np.asarray(u2), 2. * np.asarray(u1),
                               rtol=1e-12)

    both = fil.FiniteFilaments(
        x_start=jnp.concatenate([f1.x_start, f2.x_start]),
        x_end=jnp.concatenate([f1.x_end, f2.x_end]),
        r_core=jnp.concatenate([f1.r_core, f2.r_core]),
        strength=jnp.concatenate([f1.strength, f2.strength]))
    u_both = fil.total_induction(both, None, obs)
    np.testing.assert_allclose(np.asarray(u_both),
                               np.asarray(u1) + np.asarray(u2), rtol=1e-12)


def test_closed_ring_center():
    """A square vortex ring (side L, counterclockwise about +z) induces
    u = 2 sqrt(2) Gamma / (pi L) at its center along +z (standard
    magnetostatics-analog result)."""
    L = 2.
    g = 3.
    pts = np.array([[-1., -1., 0.], [1., -1., 0.], [1., 1., 0.],
                    [-1., 1., 0.]])
    ring = fil.FiniteFilaments(
        x_start=jnp.asarray(pts),
        x_end=jnp.asarray(np.roll(pts, -1, axis=0)),
        r_core=jnp.zeros(4),
        strength=jnp.full(4, g))
    u = fil.total_induction(ring, None, jnp.zeros(3))
    expected = 2. * np.sqrt(2.) * g / (np.pi * L)
    np.testing.assert_allclose(float(u[2]), expected, rtol=1e-10)
    assert abs(float(u[0])) < 1e-12 and abs(float(u[1])) < 1e-12


def make_vortex_options():
    options = make_ampyx_options()
    options['user_options.system_model.kite_dof'] = 3
    options['user_options.induction_model'] = 'vortex'
    options['model.aero.vortex.wake_nodes'] = 3
    options['nlp.n_k'] = 4
    options['nlp.collocation.d'] = 3
    return options


@pytest.fixture(scope='module')
def vortex_ocp():
    options = make_vortex_options()
    arch = Architecture({1: 0})
    built = options.build(arch)
    model = make_model(built, arch)
    return build_ocp(model, built), built


def test_vortex_variables_and_rows(vortex_ocp):
    ocp, built = vortex_ocp
    model = ocp.model
    assert 'ui10' in model.layout.names('z')
    # no lifted wake-node positions/strengths — substituted by gathers
    assert not any(n.startswith('wx') or n.startswith('wg')
                   for n in model.layout.names('z'))
    assert 'vortex_induction' in ocp.eq_slices
    sl = ocp.eq_slices['vortex_induction']
    assert sl.stop - sl.start == 3 * ocp.n_k * (1 + ocp.d)


def test_vortex_residual_semantics(vortex_ocp):
    """At iota=1 the vortex rows reduce to ui/u_ref, independent of the
    wake; at iota=0 they equal (ui - ui_biot_savart)/u_ref with finite
    Biot-Savart values."""
    import jax
    ocp, built = vortex_ocp
    from awebox_tpu.opti.initialization import build_initial_guess, \
        build_reference
    from awebox_tpu.opti.homotopy import build_p_fix
    V = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V))

    sl = ocp.eq_slices['vortex_induction']
    res1 = np.asarray(ocp.eq_fn(jnp.asarray(V), P))[sl]
    # initial guess has ui = 0, so rows vanish at iota = 1
    assert np.max(np.abs(res1)) < 1e-10

    V0 = V.copy()
    V0[ocp.vstruct.phi_slice.start + 2] = 0.   # iota = 0 (PHI_NAMES[2])
    res0 = np.asarray(ocp.eq_fn(jnp.asarray(V0), P))[sl]
    assert np.all(np.isfinite(res0))
    # on a crosswind circle the wake induces a nonzero velocity at the kite
    assert np.max(np.abs(res0)) > 1e-6


def test_vortex_cylinder_far_wake_residual():
    """Cylinder far wake (far_wake_element_type='semi_infinite_right_
    cylinder', reference far_wake.py:154-223) produces finite, nonzero
    induction rows that differ from the semi-infinite-filament far wake."""
    from awebox_tpu.opti.homotopy import build_p_fix
    from awebox_tpu.opti.initialization import build_initial_guess, \
        build_reference

    def build(far):
        options = make_vortex_options()
        options['model.aero.vortex.far_wake_element_type'] = far
        arch = Architecture({1: 0})
        built = options.build(arch)
        model = make_model(built, arch)
        return build_ocp(model, built)

    ocp_cyl = build('semi_infinite_right_cylinder')
    ocp_fil = build('semi_infinite_filament')
    V = build_initial_guess(ocp_cyl)
    P = build_p_fix(ocp_cyl, build_reference(ocp_cyl, V))
    V[ocp_cyl.vstruct.phi_slice.start + 2] = 0.   # iota = 0
    sl = ocp_cyl.eq_slices['vortex_induction']
    r_cyl = np.asarray(ocp_cyl.eq_fn(jnp.asarray(V), P))[sl]
    r_fil = np.asarray(ocp_fil.eq_fn(jnp.asarray(V), P))[sl]
    assert np.all(np.isfinite(r_cyl))
    assert np.max(np.abs(r_cyl)) > 1e-6
    # the far-wake model choice changes the induced velocity
    assert np.max(np.abs(r_cyl - r_fil)) > 1e-8


def test_vortex_degree2_lifting():
    """degree_of_induced_velocity_lifting=2 (reference opts/default.py:139):
    near/far-wake contributions are lifted separately with their own fixing
    rows plus a linear superposition row; at iota=1 with zero guesses all
    rows vanish, and the row count triples."""
    from awebox_tpu.opti.homotopy import build_p_fix
    from awebox_tpu.opti.initialization import build_initial_guess, \
        build_reference

    options = make_vortex_options()
    options['model.aero.vortex.degree_of_induced_velocity_lifting'] = 2
    arch = Architecture({1: 0})
    built = options.build(arch)
    model = make_model(built, arch)
    ocp = build_ocp(model, built)

    names = model.layout.names('z')
    assert 'ui10' in names and 'uin10' in names and 'uif10' in names
    sl = ocp.eq_slices['vortex_induction']
    assert sl.stop - sl.start == 9 * ocp.n_k * (1 + ocp.d)

    V = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V))
    res1 = np.asarray(ocp.eq_fn(jnp.asarray(V), P))[sl]
    assert np.max(np.abs(res1)) < 1e-10     # iota=1, ui=uin=uif=0

    # at iota=0 the substructure fixing rows see the wake: finite + nonzero
    V0 = V.copy()
    V0[ocp.vstruct.phi_slice.start + 2] = 0.
    res0 = np.asarray(ocp.eq_fn(jnp.asarray(V0), P))[sl]
    assert np.all(np.isfinite(res0))
    assert np.max(np.abs(res0)) > 1e-6


@pytest.mark.slow
@pytest.mark.heavy
def test_vortex_e2e_solve():
    """A vortex-induction OCP driven through the full homotopy (initial ->
    fictitious -> induction -> power -> final), dense KKT path (the wake
    history couples intervals; VERDICT r2 item 6: no vortex OCP had ever
    been solved end-to-end)."""
    from awebox_tpu.api.trial import Trial

    options = make_vortex_options()
    options['nlp.n_k'] = 3
    options['nlp.collocation.d'] = 2
    options['model.aero.vortex.wake_nodes'] = 2
    trial = Trial(options, 'vortex_e2e').build()
    trial.optimize(verbose=False)
    assert trial.solve_succeeded, trial.solution.step_results
    go = trial.global_outputs()
    assert np.isfinite(go['avg_power_watts'])
    assert 10. < go['time_period'] < 120.
    # the converged solution carries a nonzero lifted induced velocity
    V = np.asarray(trial.solution.V_opt)
    ui_sl = trial.model.layout.slices['z']['ui10']
    z0 = np.asarray(trial.ocp.vstruct.get_z_all(V))[:, ui_sl]
    assert np.max(np.abs(z0)) > 1e-8

    # wake visualization renders from the solved trial (viz/wake.py analog)
    import matplotlib
    matplotlib.use('Agg')
    figs = trial.plot(['wake_isometric', 'wake_yz', 'induction_contour'],
                      n_points=30)
    assert len(figs) == 3
    import matplotlib.pyplot as plt
    plt.close('all')


@pytest.mark.slow
def test_vortex_state_representation_structure_and_fixing():
    """State (diff) representation (reference diff_repr_dir/): wake-node
    positions and ring strengths are lifted z-variables with fixing rows.
    At the initial guess (fill_state_z_guess) every fixing row must vanish
    and the ui rows must match the alg representation exactly — the lifted
    wake IS the convected wake there."""
    from awebox_tpu.opti.initialization import build_initial_guess, \
        build_reference
    from awebox_tpu.opti.homotopy import build_p_fix

    options = make_vortex_options()
    options['model.aero.vortex.representation'] = 'state'
    arch = Architecture({1: 0})
    built = options.build(arch)
    model = make_model(built, arch)
    ocp = build_ocp(model, built)

    names = model.layout.names('z')
    wake_nodes = 3
    for r in range(wake_nodes):
        assert f'wxm10_{r}' in names
        assert f'wxp10_{r}' in names
        assert f'wg10_{r}' in names

    sl = ocp.eq_slices['vortex_induction']
    # 3 ui rows + 7 fixing rows per ring per node
    expected = (3 + 7 * wake_nodes) * ocp.n_k * (1 + ocp.d)
    assert sl.stop - sl.start == expected

    V = build_initial_guess(ocp)
    P = build_p_fix(ocp, build_reference(ocp, V))
    res = np.asarray(ocp.eq_fn(jnp.asarray(V), P))[sl]
    assert np.all(np.isfinite(res))
    # the guess satisfies ALL vortex rows: fixing rows by construction
    # (fill_state_z_guess) and ui rows because ui = 0 at iota = 1
    assert np.max(np.abs(res)) < 1e-6, np.max(np.abs(res))


@pytest.mark.slow
@pytest.mark.heavy
def test_vortex_state_matches_alg_induction():
    """With the lifted wake pinned at its convected values, the state
    representation's Biot-Savart targets equal the alg representation's:
    evaluate both OCPs' vortex rows at iota=0 on the same guess and compare
    the ui residual rows."""
    from awebox_tpu.opti.initialization import build_initial_guess, \
        build_reference
    from awebox_tpu.opti.homotopy import build_p_fix

    arch = Architecture({1: 0})

    def rows(representation):
        options = make_vortex_options()
        options['model.aero.vortex.representation'] = representation
        built = options.build(arch)
        model = make_model(built, arch)
        ocp = build_ocp(model, built)
        V = build_initial_guess(ocp)
        V[ocp.vstruct.phi_slice.start + 2] = 0.   # iota = 0
        P = build_p_fix(ocp, build_reference(ocp, V))
        sl = ocp.eq_slices['vortex_induction']
        res = np.asarray(ocp.eq_fn(jnp.asarray(V), P))[sl]
        n_nodes = ocp.n_k * (1 + ocp.d)
        return res.reshape(n_nodes, -1)

    res_alg = rows('alg')
    res_state = rows('state')
    # state layout per node: [fixing(7*R) rows..., ui rows(3)] per kite —
    # the ui rows are the LAST 3 of each node block
    ui_state = res_state[:, -3:]
    ui_alg = res_alg.reshape(ui_state.shape[0], 3)
    np.testing.assert_allclose(ui_state, ui_alg, rtol=1e-6, atol=1e-9)


@pytest.mark.slow
@pytest.mark.heavy
def test_vortex_state_e2e_solve():
    """The state (diff) representation drives a full homotopy solve
    end-to-end (reference diff_repr_dir counterpart of
    test_vortex_e2e_solve); at the optimum the fixing rows hold, so the
    lifted wake equals the convected wake."""
    from awebox_tpu.api.trial import Trial

    options = make_vortex_options()
    options['nlp.n_k'] = 3
    options['nlp.collocation.d'] = 2
    options['model.aero.vortex.wake_nodes'] = 2
    options['model.aero.vortex.representation'] = 'state'
    trial = Trial(options, 'vortex_state_e2e').build()
    trial.optimize(verbose=False)
    assert trial.solve_succeeded, trial.solution.step_results
    go = trial.global_outputs()
    assert np.isfinite(go['avg_power_watts'])
    assert 10. < go['time_period'] < 120.
    V = np.asarray(trial.solution.V_opt)
    # the lifted wake-node positions sit on the convected positions
    sl = trial.ocp.eq_slices['vortex_induction']
    res = np.asarray(trial.ocp.eq_fn(jnp.asarray(V), trial.solution.P))[sl]
    assert np.max(np.abs(res)) < 1e-5
