"""Unit tests for the f32 augmented-KKT direction solver (parallel/batch.py
_auglu_solve): LU and QR factors, refresh/stale modes, ladder recovery.

Synthetic quasi-definite-like saddle systems with a known solution — fast
CPU tier. The production-scale validation (bench anchor, cond ~2e9) lives in
benchmarks/repro_f32_schur.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from awebox_tpu.parallel.batch import _auglu_solve


def make_system(seed=0, n=24, m=17, indefinite=True):
    rng = np.random.default_rng(seed)
    Wh = rng.standard_normal((n, n))
    W0 = (Wh + Wh.T) / 2
    if not indefinite:
        W0 = W0 @ W0.T / n + np.eye(n)
    # scale spread mimicking the real system's barrier diagonal
    W0 = W0 + np.diag(10.0 ** rng.uniform(-2, 5, n))
    A = rng.standard_normal((m, n)) * 10.0 ** rng.uniform(-2, 2, (m, 1))
    D = np.concatenate([1e-8 * np.ones(m - 5),
                        np.abs(rng.standard_normal(5)) * 1e-3])
    r1 = rng.standard_normal(n)
    r2 = rng.standard_normal(m)
    free = np.ones(n)
    return dict(W0=jnp.asarray(W0), A=jnp.asarray(A), D=jnp.asarray(D),
                r1=jnp.asarray(r1), r2=jnp.asarray(r2),
                free=jnp.asarray(free), n=n, m=m)


def aug_residual(d, dw, dnu, delta_w=1e-8, delta_ce=1e-8):
    W0 = np.asarray(d['W0'])
    A = np.asarray(d['A'])
    D = np.asarray(d['D'])
    rn = 1.0 / np.clip(np.abs(A).max(axis=1), 1e-10, 1e10)
    A_e = A * rn[:, None]
    D_e = D * rn * rn
    dnu_e = np.asarray(dnu) / rn
    r_w = np.asarray(d['r1']) - ((W0 + delta_w * np.eye(d['n'])) @ dw
                                 + A_e.T @ dnu_e)
    r_nu = -(np.asarray(d['r2']) * rn) - (A_e @ dw - (D_e + delta_ce) * dnu_e)
    return max(np.abs(r_w).max(), np.abs(r_nu).max())


@pytest.mark.parametrize('factor', ['lu', 'qr'])
def test_auglu_solves_indefinite_saddle(factor):
    d = make_system()
    dw, dnu, ok, fac = _auglu_solve(
        d['W0'], d['A'], d['D'], d['r1'], d['r2'], d['free'], d['n'],
        1e-8, 1e-8, 7, 100., factor=factor)
    assert bool(ok)
    res = aug_residual(d, np.asarray(dw), np.asarray(dnu))
    scale = max(np.abs(np.asarray(d['r1'])).max(),
                np.abs(np.asarray(d['r2'])).max())
    # attainable level for one guarded refinement sweep at cond ~1e10
    assert res <= 2e-3 * scale, f'{factor}: residual {res:.2e}'
    assert fac is None or factor == 'qr'


def test_auglu_refresh_returns_factor_and_stale_reuses_it():
    d = make_system(seed=3)
    dw_r, dnu_r, ok_r, fac = _auglu_solve(
        d['W0'], d['A'], d['D'], d['r1'], d['r2'], d['free'], d['n'],
        1e-8, 1e-8, 7, 100., factor='qr', mode='refresh')
    assert bool(ok_r) and fac is not None
    # perturb the system slightly (continuation step) and reuse the factor
    d2 = dict(d)
    d2['W0'] = d['W0'] + 1e-3 * jnp.eye(d['n'])
    d2['r1'] = d['r1'] * 1.01
    dw_s, dnu_s, ok_s, fac_s = _auglu_solve(
        d2['W0'], d2['A'], d2['D'], d2['r1'], d2['r2'], d2['free'], d2['n'],
        1e-8, 1e-8, 7, 100., factor='qr', mode='stale', fac=fac)
    assert bool(ok_s)
    res = aug_residual(d2, np.asarray(dw_s), np.asarray(dnu_s))
    scale = float(jnp.abs(d2['r1']).max())
    assert res <= 1e-3 * scale, f'stale residual {res:.2e}'
    assert fac_s is fac


def test_auglu_stale_rejects_drifted_factor():
    d = make_system(seed=5)
    *_, fac = _auglu_solve(
        d['W0'], d['A'], d['D'], d['r1'], d['r2'], d['free'], d['n'],
        1e-8, 1e-8, 7, 100., factor='qr', mode='refresh')
    # drift the system far beyond the factor's preconditioning reach
    d2 = dict(d)
    rng = np.random.default_rng(9)
    far = rng.standard_normal((d['n'], d['n']))
    d2['W0'] = jnp.asarray((far + far.T) * 50.0 + np.asarray(d['W0']))
    dw, dnu, ok, _ = _auglu_solve(
        d2['W0'], d2['A'], d2['D'], d2['r1'], d2['r2'], d2['free'], d2['n'],
        1e-8, 1e-8, 7, 100., factor='qr', mode='stale', fac=fac)
    # either the sweeps still recover a usable direction, or the gate trips;
    # what must NEVER happen is ok=True with a garbage direction
    if bool(ok):
        res = aug_residual(d2, np.asarray(dw), np.asarray(dnu))
        scale = float(jnp.abs(d2['r1']).max())
        assert res <= 1e-3 * scale


def test_auglu_ladder_recovers_singular_leading_block():
    d = make_system(seed=7)
    # make W0 exactly singular in a way delta_w repairs
    W0 = np.array(d['W0'])
    W0[:5, :5] = 0.0
    W0[:5, 5:] = 0.0
    W0[5:, :5] = 0.0
    d['W0'] = jnp.asarray(W0)
    dw, dnu, ok, _ = _auglu_solve(
        d['W0'], d['A'], d['D'], d['r1'], d['r2'], d['free'], d['n'],
        1e-8, 1e-8, 7, 100., factor='qr')
    assert np.isfinite(np.asarray(dw)).all()
    assert np.isfinite(np.asarray(dnu)).all()
