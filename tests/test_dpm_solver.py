"""DPM-Solver++ correctness on an analytically solvable diffusion.

For a data distribution that is a point mass at x*, the optimal eps
predictor is eps(x, t) = (x - alpha_t x*) / sigma_t, and the probability
flow ODE transports any x_T to exactly x* as t -> 0. The solver must
recover x* to high accuracy in few steps — this validates the schedule
math, the time parameterization, and the update formulas end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotdiffusion_tpu.models.schedules import make_beta_schedule
from slotdiffusion_tpu.ops.dpm_solver import VPSchedule, dpm_solver_sample

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def betas():
    return make_beta_schedule("linear", 1000, 0.0015, 0.0195)


def _optimal_eps(x_star, ns):
    def model_fn(x, t):
        a, s = ns.alpha(t), ns.sigma(t)
        return (x - a * x_star) / s
    return model_fn


def _exact_flow(ns, x_star, x_T, t_T, t_0):
    """Exact probability-flow solution for the point-mass model: the optimal
    x0-predictor is constant (== x*), so the ODE integrates in closed form to
    x(t0) = alpha(t0) x* + sigma(t0)/sigma(T) * (x_T - alpha(T) x*)."""
    a0, s0 = ns.alpha(t_0), ns.sigma(t_0)
    aT, sT = ns.alpha(t_T), ns.sigma(t_T)
    return a0 * x_star + (s0 / sT) * (x_T - aT * x_star)


@pytest.mark.parametrize("order,steps", [(1, 50), (2, 20), (3, 20)])
def test_singlestep_converges_to_point_mass(betas, order, steps):
    ns = VPSchedule(betas)
    x_star = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3),
                         jnp.float32)
    x_T = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 3),
                      jnp.float32)
    out = dpm_solver_sample(
        _optimal_eps(x_star, ns), betas, x_T, steps=steps, order=order,
        method="singlestep", model_type="eps")
    exact = _exact_flow(ns, np.asarray(x_star), np.asarray(x_T),
                        1.0, 1.0 / ns.N)
    err = float(jnp.abs(out - exact).max())
    # the constant-m model makes every solver order exact up to fp error
    assert err < 1e-3, f"order {order} err {err}"
    # and the endpoint is close to x* up to the sigma(t_0) residual floor
    assert float(jnp.abs(out - x_star).max()) < 0.2


def test_multistep_converges(betas):
    ns = VPSchedule(betas)
    x_star = jnp.ones((1, 4, 4, 2), jnp.float32) * 0.5
    x_T = jnp.asarray(np.random.RandomState(2).randn(1, 4, 4, 2),
                      jnp.float32)
    out = dpm_solver_sample(
        _optimal_eps(x_star, ns), betas, x_T, steps=20, order=2,
        method="multistep", model_type="eps")
    exact = _exact_flow(ns, np.asarray(x_star), np.asarray(x_T),
                        1.0, 1.0 / ns.N)
    assert float(jnp.abs(out - exact).max()) < 1e-3
    assert float(jnp.abs(out - x_star).max()) < 0.2


def test_correcting_fn_applied(betas):
    ns = VPSchedule(betas)
    x_star = jnp.ones((1, 4, 4, 1), jnp.float32) * 3.0  # outside [-1, 1]
    x_T = jnp.zeros((1, 4, 4, 1), jnp.float32)
    out = dpm_solver_sample(
        _optimal_eps(x_star, ns), betas, x_T, steps=10, order=2,
        model_type="eps", correcting_x0_fn=lambda x: jnp.clip(x, -1, 1))
    assert float(out.max()) <= 1.0 + 1e-4


def test_vp_schedule_roundtrip(betas):
    ns = VPSchedule(betas)
    for t in (0.01, 0.3, 0.77, 1.0):
        lam = ns.lam(t)
        t2 = ns.inverse_lambda(lam)
        assert t2 == pytest.approx(t, abs=2e-3)
    # alpha^2 + sigma^2 == 1
    for t in (0.05, 0.5, 0.95):
        assert ns.alpha(t) ** 2 + ns.sigma(t) ** 2 == pytest.approx(1.0,
                                                                    abs=1e-9)


@pytest.mark.parametrize("return_intermediate", [False, True])
def test_denoise_to_zero_correcting_step_index(betas, return_intermediate):
    """The final correcting_xt_fn call after denoise_to_zero must receive
    the reference's `last_step + 1` index regardless of whether
    intermediates are collected (ADVICE r4: with return_intermediate=False
    the old code passed len(intermediates) == 0)."""
    ns = VPSchedule(betas)
    x_star = jnp.ones((1, 4, 4, 1), jnp.float32) * 0.5
    x_T = jnp.zeros((1, 4, 4, 1), jnp.float32)
    seen = []

    def correcting_xt_fn(x, t, step):
        seen.append(step)
        return x

    steps = 6
    out = dpm_solver_sample(
        _optimal_eps(x_star, ns), betas, x_T, steps=steps, order=2,
        method="multistep", model_type="eps",
        correcting_xt_fn=correcting_xt_fn, denoise_to_zero=True,
        return_intermediate=return_intermediate)
    if return_intermediate:
        out = out[0]
    # multistep _post runs at steps 0..steps, then denoise_to_zero at +1
    assert seen == list(range(steps + 1)) + [steps + 1]
    assert np.isfinite(np.asarray(out)).all()
