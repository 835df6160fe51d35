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
