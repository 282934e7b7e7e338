"""Phase-fix node classification and pumping-range bounds.

Compares the V-bound classification against the reference's rules
(/root/reference/awebox/ocp/var_bounds.py:113-221) on an n_k=10, d=4 grid:
reelout/reelin/switching control nodes, collocation nodes with control
freedom (poly controls) vs the Radau-overlap and zoh exemptions, and the
pumping_range l_t pins at the initial/switching control nodes.
"""
import numpy as np
import pytest

from awebox_tpu.api.trial import Trial
from tests.test_options import make_ampyx_options


def _build(u_param='zoh', pumping_range=None, n_k=10, d=4):
    options = make_ampyx_options()
    options['user_options.system_model.kite_dof'] = 3
    options['user_options.trajectory.lift_mode.phase_fix'] = 'single_reelout'
    options['nlp.n_k'] = n_k
    options['nlp.collocation.d'] = d
    options['nlp.collocation.u_param'] = u_param
    if pumping_range is not None:
        options['nlp.pumping_range'] = pumping_range
    return Trial(options, 'bounds').build()


@pytest.fixture(scope='module')
def zoh_trial():
    return _build('zoh')


@pytest.fixture(scope='module')
def poly_trial():
    return _build('poly')


def _dl_bounds_at(trial, k=None, coll=None):
    vs = trial.ocp.vstruct
    rel = trial.ocp.model.layout.slices['x']['dl_t'].start
    if coll is None:
        i = vs.x_slice(k).start + rel
    else:
        i = vs.coll_x_slice(k, coll).start + rel
    return trial.lb_nominal[i], trial.ub_nominal[i]


def test_control_node_classification(zoh_trial):
    ocp = zoh_trial.ocp
    sw = ocp.switch_kdx
    assert 0 < sw < ocp.n_k
    mb = ocp.model.variable_bounds_scaled
    rel = ocp.model.layout.slices['x']['dl_t']
    given_lb = mb['x'][0][rel][0]
    given_ub = mb['x'][1][rel][0]

    # periodic initial node: free (var_bounds.py:158-160)
    lo, hi = _dl_bounds_at(zoh_trial, k=0)
    assert lo == -np.inf and hi == np.inf
    # reelout nodes: [0, ub]
    lo, hi = _dl_bounds_at(zoh_trial, k=sw - 1)
    assert lo == 0. and hi == given_ub
    # switching node: pinned to 0
    lo, hi = _dl_bounds_at(zoh_trial, k=sw)
    assert lo == 0. and hi == 0.
    # reelin nodes: [lb, 0]
    lo, hi = _dl_bounds_at(zoh_trial, k=sw + 1)
    assert lo == given_lb and hi == 0.
    # periodic final node: pinned to 0
    lo, hi = _dl_bounds_at(zoh_trial, k=zoh_trial.ocp.n_k)
    assert lo == 0. and hi == 0.


def test_collocation_nodes_free_under_zoh(zoh_trial):
    """zoh controls leave every collocation dl_t unclassified
    (at_collocation_node_without_control_freedom, var_bounds.py:148-152)."""
    d = zoh_trial.ocp.d
    for k in (0, zoh_trial.ocp.switch_kdx, zoh_trial.ocp.n_k - 1):
        for j in range(d):
            lo, hi = _dl_bounds_at(zoh_trial, k=k, coll=j)
            assert lo == -np.inf and hi == np.inf, (k, j)


def test_collocation_classification_under_poly(poly_trial):
    """poly controls classify collocation nodes by phase, except the Radau
    node that overlaps the next control node (var_bounds.py:153-181)."""
    ocp = poly_trial.ocp
    d, sw = ocp.d, ocp.switch_kdx
    mb = ocp.model.variable_bounds_scaled
    rel = ocp.model.layout.slices['x']['dl_t']
    given_lb = mb['x'][0][rel][0]
    given_ub = mb['x'][1][rel][0]

    # interior collocation nodes classified by phase
    lo, hi = _dl_bounds_at(poly_trial, k=0, coll=0)
    assert lo == 0. and hi == given_ub
    lo, hi = _dl_bounds_at(poly_trial, k=sw, coll=0)
    assert lo == given_lb and hi == 0.
    # radau overlap node (j = d-1) stays free in both phases
    for k in (0, sw):
        lo, hi = _dl_bounds_at(poly_trial, k=k, coll=d - 1)
        assert lo == -np.inf and hi == np.inf, k


def test_collocation_x_mostly_unbounded(zoh_trial):
    """Non-phase-fix states stay unbounded at collocation nodes (deliberate
    deviation from var_bounds.py:42-102 — see ocp/bounds.py comment)."""
    ocp = zoh_trial.ocp
    vs = ocp.vstruct
    q_rel = ocp.model.layout.slices['x']['q10']
    i = vs.coll_x_slice(1, 0).start + q_rel.start
    assert np.all(np.isinf(zoh_trial.lb_nominal[i:i + 3]))


def test_pumping_range_pins_l_t():
    trial = _build('zoh', pumping_range=[400., 600.])
    ocp = trial.ocp
    vs = ocp.vstruct
    lt_rel = ocp.model.layout.slices['x']['l_t']
    scale = float(ocp.model.scaling['x'][lt_rel][0])
    i0 = vs.x_slice(0).start + lt_rel.start
    isw = vs.x_slice(ocp.switch_kdx).start + lt_rel.start
    assert trial.lb_nominal[i0] == trial.ub_nominal[i0] == 400. / scale
    assert trial.lb_nominal[isw] == trial.ub_nominal[isw] == 600. / scale


def test_pumping_range_requires_single_reelout():
    options = make_ampyx_options()
    options['user_options.system_model.kite_dof'] = 3
    options['nlp.n_k'] = 6
    options['nlp.collocation.d'] = 2
    options['nlp.pumping_range'] = [400., 600.]
    with pytest.raises(ValueError, match='pumping_range'):
        Trial(options, 'bad').build()
