"""End-to-end homotopy smoke test on a tiny 3-DOF problem.

Mirrors the reference's tiny-trial strategy (test/trials/test_trials.py:36-157
runs n_k=2..9 configs through build+optimize and asserts solve success)."""
import numpy as np
import pytest

from awebox_tpu.api.trial import Trial
from tests.test_options import make_ampyx_options


@pytest.fixture(scope='module')
def solved_trial():
    options = make_ampyx_options()
    options['user_options.system_model.kite_dof'] = 3
    options['nlp.n_k'] = 4
    options['nlp.collocation.d'] = 3
    trial = Trial(options, 'e2e_small').build()
    trial.optimize(verbose=False)
    return trial


def test_homotopy_completes(solved_trial):
    assert solved_trial.solve_succeeded
    results = solved_trial.solution.step_results
    assert 'final_0' in results
    assert results['final_0']['kkt_error'] < 1e-6


def test_solution_physical(solved_trial):
    go = solved_trial.global_outputs()
    assert 15. < go['time_period'] < 80.
    # invariants hold along the trajectory
    outputs = solved_trial.outputs_on_coll()
    c10 = np.asarray(outputs['invariants']['c10'])
    l_scale = solved_trial.options['processed']['scaling']['x']['l_t']
    assert np.max(np.abs(c10)) / l_scale ** 2 < 1e-2
    # tether force within the enforced envelope at the shooting nodes, which
    # is where path inequalities bind under zoh controls (both here and in the
    # reference, ocp/constraints.py:263-268); interior collocation nodes are
    # unconstrained and may dip below on a coarse n_k=4 grid.
    sh_outputs = solved_trial.outputs_on_shooting()
    force = np.asarray(sh_outputs['local_performance']['tether_force10'])
    assert force.min() > 45. and force.max() < 1900.


def test_interpolation_and_quality(solved_trial):
    plot_dict = solved_trial.interpolate(50)
    assert plot_dict['x']['l_t'].shape == (1, 50)
    assert np.isfinite(plot_dict['x']['q10']).all()
    results = solved_trial.check_quality(raise_exception=False)
    by_name = {r[0]: r for r in results}
    assert by_name['solve_succeeded'][1]
    assert by_name['invariant_c'][1]
    assert by_name['min_altitude'][1]


def test_csv_export(solved_trial, tmp_path):
    path = solved_trial.write_to_csv(str(tmp_path / 'sol.csv'), 20)
    import csv
    with open(path) as fh:
        rows = list(csv.reader(fh))
    assert len(rows) == 21
    assert 'x_q10_2' in rows[0]
