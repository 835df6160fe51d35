"""Parallel-in-time InDI sampling: exactness after N sweeps + fast convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.diffusion import InDIProcess
from diffsplitting_tpu.diffusion.parallel_sampling import indi_inference_parallel


def make_proc(e=0.0):
    return InDIProcess(
        image_size=8, channels=2, out_channel=2, conditional=False,
        noise_mode="none" if e == 0.0 else "gaussian", e=e,
    )


def sequential(proc, denoise, rng, x_in, N, t_start=1.0):
    return np.asarray(
        proc.inference(denoise, rng, x_in, continuous=False,
                       num_timesteps=N, t_float_start=t_start)
    )


def test_identity_denoiser_fixed_point(rng):
    proc = make_proc()
    x_in = jax.random.normal(rng, (2, 8, 8, 1))
    out = indi_inference_parallel(proc, lambda x, t: x, rng, x_in,
                                  num_timesteps=8, num_sweeps=1)
    np.testing.assert_allclose(
        np.asarray(out), np.tile(np.asarray(x_in), (1, 1, 1, 2)), rtol=1e-5
    )


def test_exact_after_n_sweeps_linear_denoiser(rng):
    """A linear denoiser D(x)=0.5x+c: N sweeps must equal the sequential chain."""
    proc = make_proc()
    c = 0.3
    denoise = lambda x, t: 0.5 * x + c
    x_in = jax.random.normal(rng, (1, 8, 8, 1))
    N = 6
    seq = sequential(proc, denoise, rng, x_in, N)
    par = np.asarray(
        indi_inference_parallel(proc, denoise, rng, x_in, num_timesteps=N,
                                num_sweeps=N)
    )
    np.testing.assert_allclose(par, seq, rtol=1e-4, atol=1e-5)


def test_exact_after_n_sweeps_nonlinear(rng):
    proc = make_proc()
    denoise = lambda x, t: jnp.tanh(x) + 0.1 * t[:, None, None, None]
    x_in = jax.random.normal(rng, (2, 8, 8, 1))
    N = 5
    seq = sequential(proc, denoise, rng, x_in, N)
    par = np.asarray(
        indi_inference_parallel(proc, denoise, rng, x_in, num_timesteps=N,
                                num_sweeps=N)
    )
    np.testing.assert_allclose(par, seq, rtol=1e-4, atol=1e-5)


def test_tolerance_mode_converges(rng):
    proc = make_proc()
    denoise = lambda x, t: jnp.tanh(x)
    x_in = jax.random.normal(rng, (1, 8, 8, 1))
    N = 10
    seq = sequential(proc, denoise, rng, x_in, N)
    par = np.asarray(
        indi_inference_parallel(proc, denoise, rng, x_in, num_timesteps=N,
                                tol=1e-6)
    )
    np.testing.assert_allclose(par, seq, rtol=1e-3, atol=1e-4)


def test_sweep_error_decreases_monotonically(rng):
    """More sweeps → closer to the sequential trajectory; K=12 of N=16 ≈ exact."""
    proc = make_proc()
    denoise = lambda x, t: jnp.tanh(x)
    x_in = jax.random.normal(rng, (1, 8, 8, 1))
    N = 16
    seq = sequential(proc, denoise, rng, x_in, N)

    errs = []
    for k in (2, 5, 8, 12, 16):
        par = np.asarray(
            indi_inference_parallel(proc, denoise, rng, x_in, num_timesteps=N,
                                    num_sweeps=k)
        )
        errs.append(np.abs(par - seq).max())
    assert errs[0] > errs[1] > errs[2] > errs[3]
    assert errs[4] == pytest.approx(0.0, abs=1e-6), "N sweeps must be exact"


def test_jittable(rng):
    proc = make_proc()
    denoise = lambda x, t: jnp.tanh(x)
    x_in = jax.random.normal(rng, (1, 8, 8, 1))
    f = jax.jit(lambda r, x: indi_inference_parallel(
        proc, denoise, r, x, num_timesteps=6, num_sweeps=3))
    out = f(rng, x_in)
    assert out.shape == (1, 8, 8, 2)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------- DDPM chain
def test_ddpm_parallel_exact_after_T_sweeps(rng):
    from diffsplitting_tpu.diffusion import DDPMProcess, build_ddpm_schedule
    from diffsplitting_tpu.diffusion.parallel_sampling import ddpm_sample_parallel

    T = 6
    sched = build_ddpm_schedule(
        {"schedule": "linear", "n_timestep": T, "linear_start": 1e-4, "linear_end": 2e-2}
    )
    proc = DDPMProcess(image_size=8, channels=1, conditional=True)
    cond = jax.random.normal(rng, (1, 8, 8, 1))
    denoise = lambda x, t: 0.3 * x[..., -1:]  # eps-prediction from last channel

    par = np.asarray(
        ddpm_sample_parallel(proc, denoise, sched, rng, cond, num_sweeps=T)
    )

    # sequential chain with the SAME frozen init + per-step noises
    r, init_rng = jax.random.split(rng)
    img = jax.random.normal(init_rng, (1, 8, 8, 1))
    keys = jax.random.split(r, T)
    noises = [jax.random.normal(k, img.shape) for k in keys]
    x = img
    for i, ti in enumerate(range(T - 1, -1, -1)):
        t_vec = jnp.array([ti])
        eps = denoise(jnp.concatenate([cond, x], -1), t_vec.astype(jnp.float32))
        x0 = proc.predict_start_from_noise(sched, x, t_vec, eps)
        x0 = jnp.clip(x0, -1, 1)
        mean, _, logvar = proc.q_posterior(sched, x0, x, t_vec)
        mask = 1.0 if ti > 0 else 0.0
        x = mean + mask * jnp.exp(0.5 * logvar) * noises[i]
    np.testing.assert_allclose(par, np.asarray(x), rtol=1e-4, atol=1e-5)


def test_ddpm_parallel_unconditional_and_tol(rng):
    from diffsplitting_tpu.diffusion import DDPMProcess, build_ddpm_schedule
    from diffsplitting_tpu.diffusion.parallel_sampling import ddpm_sample_parallel

    T = 8
    sched = build_ddpm_schedule(
        {"schedule": "linear", "n_timestep": T, "linear_start": 1e-4, "linear_end": 2e-2}
    )
    proc = DDPMProcess(image_size=8, channels=2, conditional=False)
    denoise = lambda x, t: 0.1 * jnp.tanh(x)
    out = ddpm_sample_parallel(
        proc, denoise, sched, rng, (2, 8, 8, 2), tol=1e-5
    )
    ref = ddpm_sample_parallel(
        proc, denoise, sched, rng, (2, 8, 8, 2), num_sweeps=T
    )
    assert out.shape == (2, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-4)
