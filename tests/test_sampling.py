"""Diffusion sampling integration: ancestral / DDIM / DPM-Solver paths.

The reference exercises these only through trained checkpoints
(cond_ddpm.py:119-195); here we pin shape/finiteness contracts and the
`same_noise` temporal-consistency trick (identical conditioning + shared
start noise must give identical samples across the batch,
ddpm/utils.py:125-129) on a tiny untrained CondDDPM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotdiffusion_tpu.models.diffusion import CondDDPM

RES = (8, 8)


@pytest.fixture(scope="module")
def model_and_vars():
    model = CondDDPM(
        resolution=RES,
        unet_dict=dict(in_channels=3, model_channels=16, out_channels=3,
                       num_res_blocks=1, attention_resolutions=(1,),
                       dropout=0.0, channel_mult=(1, 2),
                       num_head_channels=8, context_dim=16),
        diffusion_dict=dict(pred_target="eps", timesteps=20,
                            beta_schedule="linear", linear_start=0.0015,
                            linear_end=0.0195, log_every_t=10),
        conditioning_key="crossattn",
        cond_stage_key="slots")
    cond = jnp.ones((2, 4, 16), jnp.float32)
    x = jnp.zeros((2, *RES, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1)},
        x, context=cond, method=model.loss_function)
    return model, variables, cond


def _gen(model, variables, cond, **kw):
    return model.apply(
        variables, jax.random.PRNGKey(7), cond=cond, **kw,
        method=model.generate_imgs)


def test_ancestral_sampling(model_and_vars):
    model, variables, cond = model_and_vars
    out = _gen(model, variables, cond)
    assert out.shape == (2, *RES, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_sampling(model_and_vars):
    model, variables, cond = model_and_vars
    out = _gen(model, variables, cond, use_ddim=True)
    assert out.shape == (2, *RES, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dpm_sampling(model_and_vars):
    model, variables, cond = model_and_vars
    out = _gen(model, variables, cond, use_dpm=True)
    assert out.shape == (2, *RES, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("kw", [dict(), dict(use_ddim=True),
                                dict(use_dpm=True)])
def test_same_noise_identical_across_batch(model_and_vars, kw):
    """Identical conditioning + same_noise=True -> identical samples for
    every batch item (the reference's temporal-consistency trick)."""
    model, variables, cond = model_and_vars
    out = np.asarray(_gen(model, variables, cond, same_noise=True, **kw))
    np.testing.assert_allclose(out[0], out[1], atol=1e-5)


def test_different_noise_differs(model_and_vars):
    model, variables, cond = model_and_vars
    out = np.asarray(_gen(model, variables, cond, same_noise=False))
    assert np.abs(out[0] - out[1]).max() > 1e-3
