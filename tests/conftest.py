"""Test configuration: force CPU backend with 8 virtual devices and f64.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware in CI); the solver core runs in f64 for IPOPT-comparable tolerances.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', 'true')

import jax  # noqa: E402

# the axon site hook overrides JAX_PLATFORMS at import; force local CPU here
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# persistent compilation cache: the model's nested-AD graphs dominate test
# runtime; repeat runs of the suite reuse compiled executables
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          '.jax_cache')
try:
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def solved_trial():
    """One fully homotopy-solved tiny 3-DOF trial shared by EVERY module
    that needs a solved solution (e2e, viz, mpc, trajectory types, ...) —
    session-scoped so the suite pays the solve exactly once."""
    from awebox_tpu.api.trial import Trial
    from tests.test_options import make_ampyx_options

    options = make_ampyx_options()
    options['user_options.system_model.kite_dof'] = 3
    options['nlp.n_k'] = 4
    options['nlp.collocation.d'] = 3
    trial = Trial(options, 'e2e_small').build()
    trial.optimize(verbose=False)
    assert trial.solve_succeeded
    return trial
