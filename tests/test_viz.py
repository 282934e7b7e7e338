"""Every plot flag renders without error on a solved tiny trial
(reference test/int/test_visualization.py:22-50)."""
import matplotlib
matplotlib.use('Agg')

import numpy as np
import pytest

# solved_trial fixture comes from tests/conftest.py (session scope)

pytestmark = pytest.mark.slow


def test_all_static_flags_render(solved_trial):  # noqa: F811
    from awebox_tpu.viz import visualization as viz
    figs = solved_trial.plot(sorted(viz.PLOT_REGISTRY), n_points=40)
    assert set(figs) == set(viz.PLOT_REGISTRY)
    import matplotlib.pyplot as plt
    plt.close('all')


def test_dynamic_flags_render(solved_trial):  # noqa: F811
    figs = solved_trial.plot(['states:l_t', 'controls:ddl_t',
                              'outputs:performance',
                              'outputs:local_performance'], n_points=30)
    assert len(figs) == 4
    import matplotlib.pyplot as plt
    plt.close('all')


def test_unknown_flag_raises(solved_trial):  # noqa: F811
    with pytest.raises(KeyError):
        solved_trial.plot(['not_a_flag'])


def test_save_prefix_writes_files(solved_trial, tmp_path):  # noqa: F811
    solved_trial.plot(['power'], n_points=20,
                      save_prefix=str(tmp_path / 'fig'))
    assert (tmp_path / 'fig_power.png').exists()
