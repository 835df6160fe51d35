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


# ------------------------------------------------- sliding-window (ParaDiGMS)
def _ddpm_setup(rng, T=12, conditional=True):
    from diffsplitting_tpu.diffusion import DDPMProcess, build_ddpm_schedule

    sched = build_ddpm_schedule(
        {"schedule": "linear", "n_timestep": T, "linear_start": 1e-4, "linear_end": 2e-2}
    )
    proc = DDPMProcess(image_size=8, channels=1, conditional=conditional)
    cond = jax.random.normal(rng, (2, 8, 8, 1))
    denoise = lambda x, t: 0.3 * jnp.tanh(x[..., -1:])  # noqa: E731
    return proc, sched, cond, denoise


def _ddpm_sequential_foldin(proc, sched, denoise, rng, cond, T):
    """Sequential chain with the sliding-window sampler's own noise layout
    (init from split(rng)[1], step-k noise from fold_in(split(rng)[0], k))."""
    r, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, cond.shape[:-1] + (proc.channels,), cond.dtype)
    for k, ti in enumerate(range(T - 1, -1, -1)):
        t_vec = jnp.full((cond.shape[0],), ti, jnp.int32)
        eps = denoise(jnp.concatenate([cond, x], -1), t_vec.astype(jnp.float32))
        x0 = jnp.clip(proc.predict_start_from_noise(sched, x, t_vec, eps), -1, 1)
        mean, _, logvar = proc.q_posterior(sched, x0, x, t_vec)
        mask = 1.0 if ti > 0 else 0.0
        x = mean + mask * jnp.exp(0.5 * logvar) * jax.random.normal(
            jax.random.fold_in(r, k), x.shape, x.dtype
        )
    return np.asarray(x)


def test_sliding_window_w1_is_sequential(rng):
    """W=1, tau=0 IS the sequential frozen-noise chain — bit-level semantics."""
    from diffsplitting_tpu.diffusion.parallel_sampling import (
        ddpm_sample_sliding_window,
    )

    T = 12
    proc, sched, cond, denoise = _ddpm_setup(rng, T)
    seq = _ddpm_sequential_foldin(proc, sched, denoise, rng, cond, T)
    out, sweeps = ddpm_sample_sliding_window(
        proc, denoise, sched, rng, cond, window=1, tau=0.0
    )
    assert int(sweeps) == T
    np.testing.assert_allclose(np.asarray(out), seq, rtol=1e-4, atol=1e-5)


def test_sliding_window_exact_any_window(rng):
    """tau=0 forces advance=1/sweep: any window width reproduces W=1 exactly."""
    from diffsplitting_tpu.diffusion.parallel_sampling import (
        ddpm_sample_sliding_window,
    )

    T = 12
    proc, sched, cond, denoise = _ddpm_setup(rng, T)
    ref, _ = ddpm_sample_sliding_window(
        proc, denoise, sched, rng, cond, window=1, tau=0.0
    )
    for W in (4, 7, 16):  # incl. W > T
        out, sweeps = ddpm_sample_sliding_window(
            proc, denoise, sched, rng, cond, window=W, tau=0.0
        )
        assert int(sweeps) == T
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


def test_sliding_window_tau_reduces_sweeps(rng):
    """A loose tolerance must advance faster than 1 step/sweep and stay close
    to the exact chain (per-step drift bounded by tau·sigma²)."""
    from diffsplitting_tpu.diffusion.parallel_sampling import (
        ddpm_sample_sliding_window,
    )

    from diffsplitting_tpu.diffusion import DDPMProcess, build_ddpm_schedule

    # the toy needs a genuinely contracting chain to converge mid-window: a
    # big-beta schedule (posterior variance, and hence the tolerance scale,
    # O(0.1)) + an eps=x denoiser whose x0 prediction is stable (~0)
    T = 24
    sched = build_ddpm_schedule(
        {"schedule": "linear", "n_timestep": T, "linear_start": 0.05, "linear_end": 0.4}
    )
    proc = DDPMProcess(image_size=8, channels=1, conditional=True)
    cond = jax.random.normal(rng, (2, 8, 8, 1))
    denoise = lambda x, t: x[..., -1:]  # noqa: E731
    ref, sweeps_exact = ddpm_sample_sliding_window(
        proc, denoise, sched, rng, cond, window=8, tau=0.0
    )
    out, sweeps = ddpm_sample_sliding_window(
        proc, denoise, sched, rng, cond, window=8, tau=0.1
    )
    assert int(sweeps_exact) == T
    assert int(sweeps) < T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.25)


def test_sliding_window_unconditional(rng):
    from diffsplitting_tpu.diffusion.parallel_sampling import (
        ddpm_sample_sliding_window,
    )

    proc, sched, _, _ = _ddpm_setup(rng, T=8, conditional=False)
    denoise = lambda x, t: 0.1 * jnp.tanh(x)  # noqa: E731
    out, sweeps = ddpm_sample_sliding_window(
        proc, denoise, sched, rng, (2, 8, 8, 1), window=4, tau=0.0
    )
    assert out.shape == (2, 8, 8, 1)
    assert int(sweeps) == 8
    assert np.isfinite(np.asarray(out)).all()


def test_sliding_window_traced_tau(rng):
    """tau as a TRACED jit argument (how bench_sliding_window sweeps it
    without recompiling) must match the python-float call."""
    from diffsplitting_tpu.diffusion.parallel_sampling import (
        ddpm_sample_sliding_window,
    )

    proc, sched, cond, denoise = _ddpm_setup(rng, T=8)
    f = jax.jit(
        lambda r, c, W, tau: ddpm_sample_sliding_window(
            proc, denoise, sched, r, c, window=W, tau=tau
        ),
        static_argnums=(2,),
    )
    out, sweeps = f(rng, cond, 4, 0.1)
    ref, sweeps_ref = ddpm_sample_sliding_window(
        proc, denoise, sched, rng, cond, window=4, tau=0.1
    )
    assert int(sweeps) == int(sweeps_ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_sliding_window_jittable(rng):
    from diffsplitting_tpu.diffusion.parallel_sampling import (
        ddpm_sample_sliding_window,
    )

    proc, sched, cond, denoise = _ddpm_setup(rng, T=10)
    f = jax.jit(
        lambda r, c: ddpm_sample_sliding_window(
            proc, denoise, sched, r, c, window=4, tau=0.1
        )
    )
    out, sweeps = f(rng, cond)
    ref, _ = ddpm_sample_sliding_window(
        proc, denoise, sched, rng, cond, window=4, tau=0.1
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_sliding_window_sr3_noise_level_conditioning(rng):
    """SR3 nets condition on √ᾱ_{t+1}, not raw t (sr3.py:60): with the
    `t_cond` hook the windowed chain must match a sequential fold_in chain
    that feeds the denoiser the noise level."""
    from diffsplitting_tpu.diffusion import SR3Process, build_ddpm_schedule
    from diffsplitting_tpu.diffusion.parallel_sampling import (
        ddpm_sample_sliding_window,
    )

    T = 10
    sched = build_ddpm_schedule(
        {"schedule": "linear", "n_timestep": T, "linear_start": 1e-4, "linear_end": 2e-2}
    )
    proc = SR3Process(image_size=8, channels=1, conditional=True)
    cond = jax.random.normal(rng, (2, 8, 8, 1))
    # conditioning-sensitive denoiser: wrong t-argument → wrong output
    denoise = lambda x, lvl: 0.3 * jnp.tanh(x[..., -1:]) * lvl[:, None, None, None]  # noqa: E731
    t_cond = lambda t: sched.sqrt_alphas_cumprod_prev[t + 1]  # noqa: E731

    # sequential chain with the windowed sampler's noise layout but the
    # reference SR3 conditioning
    r, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, (2, 8, 8, 1), cond.dtype)
    for k, ti in enumerate(range(T - 1, -1, -1)):
        lvl = jnp.full((2,), sched.sqrt_alphas_cumprod_prev[ti + 1], x.dtype)
        eps = denoise(jnp.concatenate([cond, x], -1), lvl)
        # SR3Process uses scalar-t indexing (sr3.py:49-57)
        x0 = jnp.clip(proc.predict_start_from_noise(sched, x, ti, eps), -1, 1)
        mean, logvar = proc.q_posterior(sched, x0, x, ti)
        mask = 1.0 if ti > 0 else 0.0
        x = mean + mask * jnp.exp(0.5 * logvar) * jax.random.normal(
            jax.random.fold_in(r, k), x.shape, x.dtype
        )

    out, sweeps = ddpm_sample_sliding_window(
        proc, denoise, sched, rng, cond, window=4, tau=0.0, t_cond=t_cond
    )
    assert int(sweeps) == T
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_indi_sliding_window_exact_and_tol(rng):
    from diffsplitting_tpu.diffusion.parallel_sampling import (
        indi_inference_sliding_window,
    )

    proc = make_proc(e=0.3)
    denoise = lambda x, t: jnp.tanh(x)  # noqa: E731
    x_in = jax.random.normal(rng, (1, 8, 8, 1))
    N = 10
    ref, sweeps1 = indi_inference_sliding_window(
        proc, denoise, rng, x_in, num_timesteps=N, window=1, tau=0.0
    )
    assert int(sweeps1) == N
    for W in (3, 12):
        out, sweeps = indi_inference_sliding_window(
            proc, denoise, rng, x_in, num_timesteps=N, window=W, tau=0.0
        )
        assert int(sweeps) == N
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )
    out, sweeps = indi_inference_sliding_window(
        proc, denoise, rng, x_in, num_timesteps=N, window=5, tau=1.0
    )
    assert int(sweeps) < N
    # approximate mode: bounded drift from the exact chain (tol ∝ tau·σ²)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.5)
