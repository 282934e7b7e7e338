"""Implicit-DAE wrapper: Newton rootfinder and rk4root integrator.

Counterpart of /root/reference/awebox/mdl/dae.py:36-136 and
tools/integrator_routines.py:33-96: the model's equality residual is an
index-1 implicit DAE F(x, xdot, z, u, theta) = 0; simulation solves the
algebraic vector zd = (xdot, z) by Newton at each evaluation (replacing
casadi's fast_newton rootfinder) and integrates states with RK4 whose stage
derivatives come from the rootfinder. Everything is jit/vmap-compatible:
Newton is a lax.fori_loop with a dense linear solve of the (nxd+nz)^2 system.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Dae:
    def __init__(self, model, theta_model, phi=None, newton_iters: int = 15):
        """theta_model: model theta vector (scaled) frozen from an optimized
        trial (trial_funcs.generate_optimal_model analog)."""
        self.model = model
        layout = model.layout
        self.nx = layout.dims['x']
        self.nxd = layout.dims['xdot']
        self.nz = layout.dims['z']
        self.nu = layout.dims['u']
        self.ntheta = layout.dims['theta']
        self.theta_model = jnp.asarray(theta_model)
        self.phi = jnp.zeros(7) if phi is None else jnp.asarray(phi)
        self.newton_iters = newton_iters

        x_off = layout.type_offsets['x']

        def residual(x, zd, u, theta0):
            v = jnp.concatenate([x, zd[:self.nxd], u, zd[self.nxd:],
                                 self.theta_model])
            return model.eq_fn(v, self.phi, theta0)

        self._residual = residual

        def rootfind(x, u, zd0, theta0):
            """Newton solve of residual(x, zd) = 0 for zd (dae.py:86-101)."""
            def body(_, zd):
                r = residual(x, zd, u, theta0)
                J = jax.jacfwd(lambda z: residual(x, z, u, theta0))(zd)
                step = jnp.linalg.solve(J, r)
                step = jnp.where(jnp.isfinite(step), step, 0.)
                return zd - step
            return jax.lax.fori_loop(0, self.newton_iters, body, zd0)

        self.rootfind = rootfind

        def xdot_of(x, u, zd0, theta0):
            zd = rootfind(x, u, zd0, theta0)
            return zd[:self.nxd], zd

        def rk4root_step(x, u, zd0, dt, theta0):
            """One RK4 step with per-stage rootfinding
            (integrator_routines.py:33-96). States and xdot share the same
            scaled layout, so xdot is directly the scaled state rate."""
            k1, zd = xdot_of(x, u, zd0, theta0)
            k2, zd = xdot_of(x + 0.5 * dt * k1, u, zd, theta0)
            k3, zd = xdot_of(x + 0.5 * dt * k2, u, zd, theta0)
            k4, zd = xdot_of(x + dt * k3, u, zd, theta0)
            x_next = x + dt / 6. * (k1 + 2. * k2 + 2. * k3 + k4)
            return x_next, zd

        self.rk4root_step = rk4root_step

        def integrate(x0, u, zd0, ts, n_steps, theta0):
            dt = ts / n_steps

            def body(carry, _):
                x, zd = carry
                x2, zd2 = rk4root_step(x, u, zd, dt, theta0)
                return (x2, zd2), None

            (xf, zdf), _ = jax.lax.scan(body, (x0, zd0), None, length=n_steps)
            return xf, zdf

        self.integrate = jax.jit(integrate, static_argnames=('n_steps',))

        # --- implicit collocation step (IDAS role; the reference's
        # 'collocation' integrator option, mdl/dae.py:103-136) --------------
        # One Radau-IIA step solved by Newton on the stacked stage system:
        # unknowns (x_j, z_j) for stages j=1..d, with the stage derivative
        # taken from the collocation differentiation matrix — identical
        # equations to one interval of the direct-collocation NLP, so
        # re-simulating a collocation solution with this integrator must
        # reproduce it to Newton tolerance (the cross-discretization
        # regression, reference test/reg/test_discretization.py:22-90).
        from ..ocp.collocation import Collocation

        def make_collocation_step(d=3, scheme='radau', iters=12):
            if self.nxd != self.nx:
                raise NotImplementedError(
                    'collocation step assumes one xdot entry per state')
            coll = Collocation.build(d, scheme)
            C = jnp.asarray(coll.coeff_collocation)      # (d+1, d+1)
            cont = jnp.asarray(coll.coeff_continuity)    # (d+1,)
            nx, nz = self.nx, self.nz

            def stage_residual(x0, stages, u, dt, theta0):
                xs = stages[:, :nx]                       # (d, nx)
                zs = stages[:, nx:]                       # (d, nz)
                x_stack = jnp.concatenate([x0[None, :], xs], axis=0)
                xdot = (C[:, 1:].T @ x_stack) / dt        # (d, nx)

                def node_res(xj, xdj, zj):
                    v = jnp.concatenate([xj, xdj[:self.nxd], u, zj,
                                         self.theta_model])
                    return model.eq_fn(v, self.phi, theta0)
                res = jax.vmap(node_res)(xs, xdot, zs)    # (d, n_eq_m)
                return res.reshape(-1)

            tau = jnp.asarray(coll.tau_root[1:])          # (d,)

            def step(x0, u, zd0, dt, theta0, stages_init=None):
                """x0 -> x_next over dt seconds; zd0 = (xdot, z) warm start.
                Returns (x_next, zd_next) matching rk4root_step's interface.
                Stage states initialize on the tangent ray x0 + dt*tau*xdot0
                (Newton from a flat x0 guess diverges on long intervals);
                pass stages_init (d, nx+nz) to warm start from a known
                trajectory (e.g. an NLP solution's collocation values)."""
                xdot0 = zd0[:self.nxd]
                z_guess = zd0[self.nxd:]
                if stages_init is None:
                    xs0 = x0[None, :] + dt * tau[:, None] * xdot0[None, :]
                    stages0 = jnp.concatenate(
                        [xs0, jnp.broadcast_to(z_guess, (d, nz))], axis=1)
                else:
                    stages0 = stages_init

                def body(_, stages):
                    r = stage_residual(x0, stages, u, dt, theta0)
                    J = jax.jacfwd(
                        lambda s: stage_residual(x0, s.reshape(d, -1), u,
                                                 dt, theta0))(stages.reshape(-1))
                    delta = jnp.linalg.solve(J, r)
                    delta = jnp.where(jnp.isfinite(delta), delta, 0.)
                    return stages - delta.reshape(d, -1)

                stages = jax.lax.fori_loop(0, iters, body, stages0)
                xs = stages[:, :nx]
                x_stack = jnp.concatenate([x0[None, :], xs], axis=0)
                x_next = cont @ x_stack
                xdot_last = ((C[:, 1:].T @ x_stack) / dt)[-1]
                zd_next = jnp.concatenate([xdot_last[:self.nxd],
                                           stages[-1, nx:]])
                return x_next, zd_next

            return step

        self.make_collocation_step = make_collocation_step

    # ------------------------------------------------------------------
    def consistent_zd(self, x, u, theta0, zd_guess=None):
        if zd_guess is None:
            zd_guess = jnp.concatenate([jnp.zeros(self.nxd), jnp.ones(self.nz)])
        return self.rootfind(x, u, zd_guess, theta0)


def dae_from_trial(trial):
    """Frozen-theta DAE of an optimized trial
    (trial_funcs.generate_optimal_model, trial_funcs.py:116-133)."""
    V = trial.solution.V_opt
    vs = trial.ocp.vstruct
    layout = trial.model.layout
    theta_model = np.zeros(layout.dims['theta'])
    for name in vs.theta_names:
        msl = layout.slices['theta'][name]
        val = np.asarray(V[vs.theta_slice(name)])
        if name == 't_f':
            theta_model[msl.start] = val[0]
        else:
            theta_model[msl] = val
    return Dae(trial.model, theta_model)
