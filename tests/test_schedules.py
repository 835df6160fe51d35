"""Golden tests for beta schedules and derived DDPM constants against the
closed-form equations (reference: ddpm_modules/diffusion.py:11-49,111-154)."""

import math

import numpy as np
import pytest

from diffsplitting_tpu.diffusion.schedules import build_ddpm_schedule, make_beta_schedule


def test_linear_schedule():
    betas = make_beta_schedule("linear", 10, 1e-4, 2e-2)
    assert betas.shape == (10,)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(2e-2)
    assert np.all(np.diff(betas) > 0)


def test_quad_schedule():
    betas = make_beta_schedule("quad", 5, 1e-4, 2e-2)
    expected = np.linspace(1e-2, math.sqrt(2e-2), 5) ** 2
    np.testing.assert_allclose(betas, expected, rtol=1e-12)


def test_warmup_schedules():
    betas10 = make_beta_schedule("warmup10", 100, 1e-4, 2e-2)
    assert np.all(betas10[10:] == 2e-2)
    assert betas10[0] == pytest.approx(1e-4)
    betas50 = make_beta_schedule("warmup50", 100, 1e-4, 2e-2)
    assert np.all(betas50[50:] == 2e-2)
    assert np.all(np.diff(betas50[:50]) > 0)


def test_const_and_jsd():
    assert np.all(make_beta_schedule("const", 7, linear_end=0.5) == 0.5)
    jsd = make_beta_schedule("jsd", 4)
    np.testing.assert_allclose(jsd, [1 / 4, 1 / 3, 1 / 2, 1.0], rtol=1e-12)


def test_cosine_schedule():
    betas = make_beta_schedule("cosine", 50)
    s = 8e-3
    ts = np.arange(51, dtype=np.float64) / 50 + s
    alphas = np.cos(ts / (1 + s) * math.pi / 2) ** 2
    alphas = alphas / alphas[0]
    expected = np.clip(1 - alphas[1:] / alphas[:-1], None, 0.999)
    np.testing.assert_allclose(betas, expected, rtol=1e-12)
    assert betas.max() <= 0.999


def test_unknown_schedule_raises():
    with pytest.raises(NotImplementedError):
        make_beta_schedule("nope", 10)


def test_ddpm_schedule_derived_quantities():
    opt = {"schedule": "linear", "n_timestep": 20, "linear_start": 1e-6, "linear_end": 1e-2}
    sched = build_ddpm_schedule(opt)
    betas = make_beta_schedule("linear", 20, 1e-6, 1e-2)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])

    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.sqrt_alphas_cumprod), np.sqrt(acp), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_recipm1_alphas_cumprod), np.sqrt(1 / acp - 1), rtol=1e-5
    )
    post_var = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(np.asarray(sched.posterior_variance), post_var, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_log_variance_clipped),
        np.log(np.maximum(post_var, 1e-20)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef1),
        betas * np.sqrt(acp_prev) / (1 - acp),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef2),
        (1 - acp_prev) * np.sqrt(alphas) / (1 - acp),
        rtol=1e-6,
    )
    # sqrt_alphas_cumprod_prev is length T+1 with a leading 1 (sr3 diffusion.py:105-106)
    assert sched.sqrt_alphas_cumprod_prev.shape == (21,)
    assert float(sched.sqrt_alphas_cumprod_prev[0]) == 1.0
    assert sched.num_timesteps == 20
