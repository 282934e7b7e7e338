"""Ampyx AP2 single-kite pumping-cycle trajectory — the canonical example.

TPU-native counterpart of /root/reference/examples/ampyx_ap2_trajectory.py:
a 6-DOF Ampyx AP2 on a single tether, lift-mode pumping cycle with one
winding, power-law wind profile, zoh controls, simple phase fixing. The
reference converges to ~4.7 kW average power over a ~35 s winding period
(ampyx_ap2_trajectory.py:118-131); the regression tolerance is +-20%
(test/reg/test_examples.py:30-44). Run `python examples/ampyx_ap2_trajectory.py`.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def make_options(n_k=40, d=4, kite_dof=6, overwrite_options=None):
    from awebox_tpu.options.options import Options
    from awebox_tpu.options.kite_data import ampyx_ap2_settings

    options = Options()
    ampyx_ap2_settings.set_ampyx_ap2_settings(options)
    options['user_options.system_model.architecture'] = {1: 0}
    options['user_options.system_model.kite_dof'] = kite_dof
    options['user_options.trajectory.type'] = 'power_cycle'
    options['user_options.trajectory.system_type'] = 'lift_mode'
    options['user_options.trajectory.lift_mode.windings'] = 1
    options['params.wind.z_ref'] = 100.0
    options['params.wind.power_wind.exp_ref'] = 0.15
    options['user_options.wind.model'] = 'power'
    options['user_options.wind.u_ref'] = 10.
    options['nlp.n_k'] = n_k
    options['nlp.collocation.d'] = d
    options['nlp.collocation.u_param'] = 'zoh'
    options['user_options.trajectory.lift_mode.phase_fix'] = 'simple'
    for key, val in (overwrite_options or {}).items():
        options[key] = val
    return options


def run(n_k=40, d=4, kite_dof=6, plot=False, save=None, verbose=True,
        overwrite_options=None):
    """Build + optimize; returns {'avg_power_kw', 'winding_period_s', 'trial'}."""
    from awebox_tpu.api.trial import Trial

    options = make_options(n_k=n_k, d=d, kite_dof=kite_dof,
                           overwrite_options=overwrite_options)
    trial = Trial(options, 'Ampyx_AP2').build()
    trial.optimize(verbose=verbose)

    go = trial.global_outputs()
    results = {
        'avg_power_kw': go['avg_power_watts'] / 1e3,
        'winding_period_s': go['time_period'],
        'trial': trial,
    }
    if verbose:
        print(f"average power:  {results['avg_power_kw']:.2f} kW "
              f"(reference ~4.7 kW)")
        print(f"winding period: {results['winding_period_s']:.1f} s "
              f"(reference ~35 s)")
        for name, passed, value, thresh in trial.check_quality():
            print(f"  quality {name}: {'pass' if passed else 'FAIL'} "
                  f"({value:.3g} vs {thresh:.3g})")
    if save:
        trial.save(save)
    if plot:
        trial.plot(['states', 'controls', 'isometric', 'power'],
                   save_prefix='ampyx_ap2')
    return results


if __name__ == '__main__':
    import jax
    if jax.devices()[0].platform == 'cpu':
        jax.config.update('jax_enable_x64', True)
    run(plot=True, save='ampyx_ap2_solution.pkl')
