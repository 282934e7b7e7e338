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
    # model-dependent flags raise a clear ValueError on models without the
    # needed variables (thrust needs actuator, induction factors need a
    # lifted induction model) — everything else must render
    figs = {}
    skipped = []
    for flag in sorted(viz.PLOT_REGISTRY):
        try:
            figs.update(solved_trial.plot([flag], n_points=40))
        except ValueError:
            skipped.append(flag)
    assert set(figs) | set(skipped) == set(viz.PLOT_REGISTRY)
    assert set(skipped) <= {'thrust', 'local_induction_factor',
                            'average_induction_factor'}, skipped
    import matplotlib.pyplot as plt
    plt.close('all')


def test_animation_gif_writes_file(solved_trial, tmp_path):  # noqa: F811
    """The true frame-by-frame animation (reference viz/animation.py)
    writes a playable GIF."""
    out = solved_trial.plot(['animation_gif'], n_points=30,
                            save_prefix=str(tmp_path / 'anim'))
    import os
    path = out['animation_gif']
    assert os.path.exists(path)
    assert os.path.getsize(path) > 10_000   # multi-frame, not a stub
    with open(path, 'rb') as fh:
        assert fh.read(6) in (b'GIF87a', b'GIF89a')


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
