import numpy as np
import pytest

from slotdiffusion_tpu.models.schedules import (
    GaussianSchedule, make_beta_schedule, make_ddim_sampling_parameters,
    make_ddim_timesteps, make_gaussian_schedule)

pytestmark = pytest.mark.fast


def test_linear_schedule_golden():
    """Golden values from the reference formula: linspace(sqrt(start),
    sqrt(end), N)^2 (ddpm/utils.py:21-27)."""
    betas = make_beta_schedule("linear", 1000, 0.0015, 0.0195)
    assert betas.shape == (1000,)
    assert betas[0] == pytest.approx(0.0015)
    assert betas[-1] == pytest.approx(0.0195)
    mid = (np.sqrt(0.0015) + (np.sqrt(0.0195) - np.sqrt(0.0015)) *
           (500 / 999)) ** 2
    assert betas[500] == pytest.approx(mid)
    assert np.all(np.diff(betas) > 0)


def test_cosine_schedule_properties():
    betas = make_beta_schedule("cosine", 1000)
    assert np.all(betas > 0) and np.all(betas <= 0.999)


def test_sqrt_schedules():
    b1 = make_beta_schedule("sqrt_linear", 10, 1e-4, 2e-2)
    assert b1[0] == pytest.approx(1e-4) and b1[-1] == pytest.approx(2e-2)
    b2 = make_beta_schedule("sqrt", 10, 1e-4, 2e-2)
    np.testing.assert_allclose(b2, b1 ** 0.5)


def test_gaussian_schedule_identities():
    s = make_gaussian_schedule("linear", 100, 1e-4, 2e-2)
    alphas = 1.0 - s.betas
    np.testing.assert_allclose(
        s.alphas_bar, np.cumprod(alphas), rtol=1e-6)
    np.testing.assert_allclose(
        s.sqrt_alphas_bar ** 2 + s.sqrt_one_minus_alphas_bar ** 2,
        1.0, atol=1e-6)
    # posterior variance: beta_t * (1 - abar_{t-1}) / (1 - abar_t)
    pv = s.betas * (1 - s.alphas_bar_prev) / (1 - s.alphas_bar)
    # stored tables are computed in float64 then cast; the float32
    # recomputation here needs an absolute tolerance near t=0
    np.testing.assert_allclose(s.posterior_variance, pv, rtol=1e-4,
                               atol=1e-7)
    # q posterior mean coefficients sum: for x0 = x_t = x the posterior mean
    # must interpolate between them consistently
    assert s.posterior_mean_coef1[0] + s.posterior_mean_coef2[0] == \
        pytest.approx(1.0, abs=1e-5)


def test_ddim_timesteps():
    ts = make_ddim_timesteps(200, 1000)
    assert len(ts) == 200
    assert ts[0] == 1  # +1 shift (ddpm/utils.py:69)
    assert ts[-1] == 996
    sig, al, alp = make_ddim_sampling_parameters(
        make_gaussian_schedule("linear", 1000).alphas_bar.astype(np.float64),
        np.clip(ts, 0, 999), eta=0.0)
    assert np.all(sig == 0.0)
    assert alp[0] == pytest.approx(
        make_gaussian_schedule("linear", 1000).alphas_bar[0])
