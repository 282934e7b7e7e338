"""Closed-loop tracking NMPC around an optimized pumping cycle.

TPU-native counterpart of /root/reference/examples/mpc_closed_loop.py:19-87:
solve a periodic power-cycle OCP on a reference-grade grid (n_k=20; the
reference demo uses n_k=40 with N=10, d=4), build a tracking NMPC from the
optimal orbit (N-interval horizon, theta frozen, x0 pinned), and run the
plant (the optimized model's DAE under implicit collocation substeps) in
closed loop at sampling time ts. Reports the SI kite-position tracking error
and per-step MPC latency against the real-time budget ts (BASELINE.md MPC
target). Run `python examples/mpc_closed_loop.py`; pass cost_type='economic'
for the economic MPC mode (reference pmpc.py:141).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def run(n_k=20, d=3, kite_dof=3, n_sim=8, N=8, mpc_d=2, verbose=False,
        cost_type='tracking'):
    from ampyx_ap2_trajectory import make_options
    from awebox_tpu.api.sim import Simulation
    from awebox_tpu.api.trial import Trial

    options = make_options(n_k=n_k, d=d, kite_dof=kite_dof)
    trial = Trial(options, 'mpc_demo').build()
    trial.optimize(verbose=verbose)
    assert trial.solve_succeeded

    sim = Simulation(trial, 'closed_loop',
                     mpc_options={'N': N, 'd': mpc_d, 'max_iter': 40,
                                  'cost_type': cost_type})
    t0 = time.time()
    sim.run(n_sim, verbose=verbose)
    wall = time.time() - t0

    errs = sim.tracking_error()
    pos_err = sim.position_error_si()
    lat = sim.latency_report()
    print(f'closed loop ({cost_type}): {n_sim} samples at ts={lat["ts"]:.2f} '
          f's ({wall:.1f} s wall)')
    print(f'tracking error: kite position max {pos_err.max():.2f} m, '
          f'scaled rms max {errs.max():.3e}')
    print(f'mpc step latency: first(+compile) {lat["first_step_s"]:.2f} s, '
          f'steady median {lat["steady_median_s"]:.3f} s, budget ts = '
          f'{lat["ts"]:.2f} s -> latency/ts = {lat["latency_over_ts"]:.2f} '
          f'({"REAL-TIME" if lat["real_time_capable"] else "not real-time"} '
          f'on this host)')
    return {'tracking_error_max': float(errs.max()),
            'position_error_si_max': float(pos_err.max()),
            'mpc_latency_steady_s': float(lat['steady_median_s']),
            'latency_over_ts': float(lat['latency_over_ts']),
            'ts': float(lat['ts']), 'sim': sim, 'trial': trial}


if __name__ == '__main__':
    run(verbose=False)
