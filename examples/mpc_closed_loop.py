"""Closed-loop tracking NMPC around an optimized pumping cycle.

TPU-native counterpart of /root/reference/examples/mpc_closed_loop.py:19-87:
solve a periodic power-cycle OCP, build a tracking NMPC from the optimal
orbit (N-interval horizon, theta frozen, x0 pinned), and run the plant (the
optimized model's DAE under rk4root) in closed loop at sampling time ts.
Reports per-step MPC latency against the real-time budget ts (BASELINE.md
target). Run `python examples/mpc_closed_loop.py`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def run(n_k=10, d=3, kite_dof=3, n_sim=8, N=6, mpc_d=2, verbose=False):
    from ampyx_ap2_trajectory import make_options
    from awebox_tpu.api.sim import Simulation
    from awebox_tpu.api.trial import Trial

    options = make_options(n_k=n_k, d=d, kite_dof=kite_dof)
    trial = Trial(options, 'mpc_demo').build()
    trial.optimize(verbose=verbose)
    assert trial.solve_succeeded

    sim = Simulation(trial, 'closed_loop',
                     mpc_options={'N': N, 'd': mpc_d, 'max_iter': 40})
    t0 = time.time()
    sim.run(n_sim, verbose=verbose)
    wall = time.time() - t0

    errs = sim.tracking_error()
    lat = [s['wall_time'] for s in sim.mpc.stats]
    ts = sim.ts
    print(f'closed loop: {n_sim} samples at ts={ts:.2f} s '
          f'({wall:.1f} s wall)')
    print(f'tracking error (scaled rms): max {errs.max():.3e}')
    print(f'mpc step latency: first(+compile) {lat[0]:.2f} s, '
          f'steady median {sorted(lat[1:])[len(lat[1:]) // 2]:.3f} s, '
          f'budget ts = {ts:.2f} s')
    return {'tracking_error_max': float(errs.max()),
            'mpc_latency_steady_s': float(sorted(lat[1:])[len(lat[1:]) // 2]),
            'ts': float(ts), 'sim': sim, 'trial': trial}


if __name__ == '__main__':
    run(verbose=False)
