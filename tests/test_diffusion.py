"""Math/semantics tests for DDPM, SR3, InDI, JointInDI processes.

Golden values computed from the closed-form equations at
ddpm_modules/diffusion.py:163-203,266-283 and indi.py:62-124.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.diffusion import (
    DDPMProcess,
    InDIProcess,
    JointInDIProcess,
    SR3Process,
    build_ddpm_schedule,
)

SCHED_OPT = {"schedule": "linear", "n_timestep": 10, "linear_start": 1e-4, "linear_end": 2e-2}


@pytest.fixture
def sched():
    return build_ddpm_schedule(SCHED_OPT)


def identity_denoise(x, t):
    return x


# --------------------------------------------------------------------- DDPM
def test_ddpm_q_sample_golden(sched, rng):
    proc = DDPMProcess(image_size=8, channels=2, conditional=False)
    x0 = jnp.ones((2, 8, 8, 2))
    noise = jnp.full_like(x0, 0.5)
    t = jnp.array([0, 5])
    xt = proc.q_sample(sched, x0, t, noise)
    sa = np.asarray(sched.sqrt_alphas_cumprod)
    so = np.asarray(sched.sqrt_one_minus_alphas_cumprod)
    for b, ti in enumerate([0, 5]):
        np.testing.assert_allclose(
            np.asarray(xt[b]), sa[ti] * 1.0 + so[ti] * 0.5, rtol=1e-6
        )


def test_ddpm_predict_start_roundtrip(sched, rng):
    """predict_start_from_noise inverts q_sample exactly."""
    proc = DDPMProcess(image_size=8, channels=2, conditional=False)
    k1, k2 = jax.random.split(rng)
    x0 = jax.random.normal(k1, (3, 8, 8, 2))
    noise = jax.random.normal(k2, x0.shape)
    t = jnp.array([1, 4, 9])
    xt = proc.q_sample(sched, x0, t, noise)
    x0_rec = proc.predict_start_from_noise(sched, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_ddpm_posterior_golden(sched):
    proc = DDPMProcess(image_size=4, channels=1, conditional=False)
    x0 = jnp.full((1, 4, 4, 1), 0.3)
    xt = jnp.full((1, 4, 4, 1), -0.2)
    t = jnp.array([5])
    mean, var, logvar = proc.q_posterior(sched, x0, xt, t)
    c1 = float(sched.posterior_mean_coef1[5])
    c2 = float(sched.posterior_mean_coef2[5])
    np.testing.assert_allclose(np.asarray(mean), c1 * 0.3 + c2 * -0.2, rtol=1e-6)
    np.testing.assert_allclose(float(var[0, 0, 0, 0]), float(sched.posterior_variance[5]))


def test_ddpm_p_losses_finite(sched, rng):
    proc = DDPMProcess(image_size=8, channels=2, conditional=True, lr_reduction="mean")
    batch = {
        "target": jax.random.normal(rng, (2, 8, 8, 2)),
        "input": jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 8, 1)),
    }
    denoise = lambda x, t: x[..., :2]  # (B,8,8,3) -> 2 ch
    loss = proc.p_losses(denoise, sched, rng, batch)
    assert loss.shape == ()
    assert np.isfinite(float(loss))


def test_ddpm_sample_loop_shapes(sched, rng):
    proc = DDPMProcess(image_size=8, channels=2, conditional=True)
    cond = jnp.zeros((1, 8, 8, 1))
    denoise = lambda x, t: jnp.zeros(x.shape[:-1] + (2,), x.dtype)
    out = proc.p_sample_loop(denoise, sched, rng, cond, continuous=False)
    assert out.shape == (1, 8, 8, 2)
    frames = proc.p_sample_loop(denoise, sched, rng, cond, continuous=True)
    # T=10, inter = 1|(10//10) = 1 -> all 10 steps captured + initial
    assert frames.shape == (11, 1, 8, 8, 2)


def test_ddpm_unconditional_sample(sched, rng):
    proc = DDPMProcess(image_size=8, channels=2, conditional=False)
    denoise = lambda x, t: jnp.zeros_like(x)
    out = proc.sample(denoise, sched, rng, batch_size=2)
    assert out.shape == (2, 8, 8, 2)


# --------------------------------------------------------------------- SR3
def test_sr3_q_sample_golden():
    proc = SR3Process(image_size=8, channels=2, conditional=False)
    x0 = jnp.ones((1, 4, 4, 1))
    noise = jnp.full_like(x0, 2.0)
    g = jnp.full((1, 1, 1, 1), 0.8)
    xt = proc.q_sample(x0, g, noise)
    np.testing.assert_allclose(np.asarray(xt), 0.8 + np.sqrt(1 - 0.64) * 2.0, rtol=1e-6)


def test_sr3_p_losses_and_loop(sched, rng):
    proc = SR3Process(image_size=8, channels=1, conditional=True, loss_type="l2")
    batch = {
        "target": jax.random.normal(rng, (2, 8, 8, 1)),
        "input": jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 8, 1)),
    }
    denoise = lambda x, t: x[..., :1]
    loss = proc.p_losses(denoise, sched, rng, batch)
    assert np.isfinite(float(loss))

    out = proc.p_sample_loop(denoise, sched, rng, batch["input"], continuous=False)
    assert out.shape == (2, 8, 8, 1)


def test_sr3_gamma_in_range(sched, rng):
    """Training gammas must lie within [√ᾱ_T, √ᾱ_0-prev] = [min, 1]."""
    proc = SR3Process(image_size=8, channels=1, conditional=False)
    seen = []

    def denoise(x, t):
        seen.append(t)
        return x

    batch = {"target": jnp.zeros((4, 8, 8, 1))}
    for i in range(5):
        proc.p_losses(denoise, sched, jax.random.PRNGKey(i), batch)
    prev = np.asarray(sched.sqrt_alphas_cumprod_prev)
    for g in seen:
        g = np.asarray(g)
        assert np.all(g >= prev.min() - 1e-6) and np.all(g <= 1.0 + 1e-6)


# --------------------------------------------------------------------- InDI
def test_indi_q_sample_golden(rng):
    proc = InDIProcess(image_size=8, channels=2, out_channel=2, conditional=False, e=0.01)
    x0 = jnp.zeros((1, 4, 4, 2))
    x1 = jnp.ones((1, 4, 4, 2))
    noise = jnp.full_like(x0, 3.0)
    t = jnp.array([0.5])
    xt = proc.q_sample(x0, x1, t, noise)
    # (1-t)*0 + t*1 + 3 * (e*t) = 0.5 + 3*0.005
    np.testing.assert_allclose(np.asarray(xt), 0.5 + 3 * 0.005, rtol=1e-6)


def test_indi_identity_denoiser_is_fixed_point(rng):
    """With x̂0 = x_t and e=0 the update x_{t-δ} = (δ/t)x + (1-δ/t)x = x."""
    proc = InDIProcess(
        image_size=8, channels=2, out_channel=2, conditional=False, noise_mode="none"
    )
    x_in = jax.random.normal(rng, (2, 8, 8, 1))
    out = proc.inference(identity_denoise, rng, x_in, num_timesteps=10)
    expected = np.tile(np.asarray(x_in), (1, 1, 1, 2))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n_timestep", [1, 2, 10])
def test_indi_trajectory_frame_count(n_timestep, rng):
    """Port of reference tests/test_joint_indi.py (fixed: the stale
    super_resolution call is `inference` now): continuous output has
    n_timestep+1 frames for n_timestep <= 20."""
    proc = InDIProcess(
        image_size=8, channels=2, out_channel=2, conditional=False, noise_mode="none"
    )
    x_in = jnp.zeros((1, 8, 8, 1))
    frames = proc.inference(
        identity_denoise, rng, x_in, continuous=True, num_timesteps=n_timestep
    )
    assert frames.shape[0] == n_timestep + 1


def test_indi_sample_t_ranges(rng):
    T = 20
    proc = InDIProcess(image_size=8, out_channel=2, conditional=False)
    for mode in ["linear_indi", "uniform", "uniform_in_range", "linear_ramp",
                 "quadratic_ramp"]:
        proc.t_sampling_mode = mode
        t = np.asarray(proc.sample_t(rng, 512, T))
        assert t.min() >= 0.0 and t.max() <= 1.0
        if mode == "linear_indi":
            # snap probability 1 - 1/(a+1) = 0.5 for a=1
            frac_max = (t == 1.0).mean()
            assert 0.35 < frac_max < 0.65
        if mode == "uniform_in_range":
            # reference indi.py:139-140 — t ∈ {(2T)//3 .. T}/T
            scaled = np.unique(np.round(t * T).astype(int))
            assert scaled.min() >= (2 * T) // 3 and scaled.max() <= T
            # all integer values in the range appear at 512 draws over 8 values
            assert set(scaled) == set(range((2 * T) // 3, T + 1))
        if mode in ("linear_ramp", "quadratic_ramp"):
            assert (t == 0.0).mean() == 0.0  # zero weight at t=0


def test_indi_custom_t_variants(rng):
    T = 20
    for variant, tmax in [("custom_t", 0.5), ("full_translation", None)]:
        proc = InDIProcess(image_size=8, out_channel=2, conditional=False, t_variant=variant)
        t = np.asarray(proc.sample_t(rng, 512, T))
        assert t.min() > 0
        if variant == "custom_t":
            assert t.max() <= 0.5
            assert (t == 0.5).mean() > 0.3  # snap mass at 0.5
        else:
            assert t.max() < 1.0
            assert (t == 0.5).mean() > 0.3


def test_indi_p_losses(rng):
    proc = InDIProcess(image_size=8, channels=2, out_channel=2, conditional=False,
                       lr_reduction="mean")
    batch = {
        "target": jax.random.normal(rng, (2, 8, 8, 2)),
        "input": jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 8, 1)),
    }
    loss = proc.p_losses(identity_denoise, rng, batch, num_timesteps=20)
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------- JointInDI
def test_joint_indi_loss_and_inference(rng):
    proc = JointInDIProcess(
        image_size=8, channels=1, out_channel=1, conditional=False,
        lr_reduction="mean", num_timesteps=20, val_num_timesteps=4,
    )
    batch = {"target": jax.random.normal(rng, (2, 8, 8, 2))}
    loss, logs = proc.p_losses(identity_denoise, identity_denoise, rng, batch, num_timesteps=20)
    assert np.isfinite(float(loss))
    assert "loss_splitting" in logs

    x_in = jax.random.normal(rng, (1, 8, 8, 1))
    out = proc.inference(identity_denoise, identity_denoise, rng, x_in, num_timesteps=4)
    assert out.shape == (1, 8, 8, 2)


def test_joint_indi_extra_params():
    extra = JointInDIProcess.init_extra_params()
    logs = JointInDIProcess.extra_param_logs(extra)
    assert float(logs["alpha"]) == pytest.approx(0.5)
    assert float(logs["scale"]) == 1.0
