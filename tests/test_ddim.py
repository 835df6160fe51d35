"""Respaced DDIM sampler math (diffusion/ddim.py).

Golden anchors: η=1 over the full sequence is algebraically the ancestral
posterior step (σ² == posterior_variance), so the sampler must reproduce a
hand-written ancestral chain with the same rng layout; η=0 is deterministic;
the respaced subsequence always spans [0, T-1].
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffsplitting_tpu.diffusion import (
    DDPMProcess,
    SR3Process,
    build_ddpm_schedule,
)
from diffsplitting_tpu.diffusion.ddim import (
    ddim_coefficients,
    ddim_sample_loop,
    ddim_timesteps,
)


def _sched(T, start=1e-4, end=2e-2):
    return build_ddpm_schedule(
        {"schedule": "linear", "n_timestep": T, "linear_start": start,
         "linear_end": end}
    )


def test_timesteps_respacing():
    np.testing.assert_array_equal(ddim_timesteps(10, 10),
                                  np.arange(9, -1, -1))
    taus = ddim_timesteps(2000, 50)
    assert len(taus) == 50
    assert taus[0] == 1999 and taus[-1] == 0
    assert np.all(np.diff(taus) < 0)
    # oversized request clamps to the full sequence
    np.testing.assert_array_equal(ddim_timesteps(6, 100),
                                  np.arange(5, -1, -1))
    # S=1 must keep the trained-prior timestep, not collapse to tau=[0]
    np.testing.assert_array_equal(ddim_timesteps(10, 1), [9])
    np.testing.assert_array_equal(ddim_timesteps(10, 2), [9, 0])


def test_eta1_sigma_equals_posterior_variance():
    """The DDIM σ at η=1 over the FULL sequence IS the ancestral posterior
    std — the algebraic identity that makes η=1 the DDPM chain."""
    T = 64
    sched = _sched(T)
    _, _, sigma, _ = ddim_coefficients(sched, T, eta=1.0)
    # step i applies timestep T-1-i; final step (t=0) has σ=0 both ways
    post_std = np.sqrt(np.asarray(sched.posterior_variance, np.float64))
    # schedule buffers are f32 (parity with the reference's registered
    # buffers) — the identity holds to f32 rounding
    np.testing.assert_allclose(sigma[:-1], post_std[::-1][:-1],
                               rtol=1e-4, atol=1e-8)
    assert sigma[-1] == 0.0


def _manual_ancestral_foldkeys(proc, sched, denoise, rng, cond, clip=True):
    """Sequential ancestral chain with ddim_sample_loop's exact rng layout
    (init from split(rng)[1], step-i noise from split(split(rng)[0], T)[i])."""
    T = sched.num_timesteps
    r, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, cond.shape[:-1] + (proc.channels,),
                          cond.dtype)
    keys = jax.random.split(r, T)
    post_std = np.sqrt(np.asarray(sched.posterior_variance, np.float64))
    for i, ti in enumerate(range(T - 1, -1, -1)):
        t_vec = jnp.full((cond.shape[0],), ti, jnp.int32)
        eps = denoise(jnp.concatenate([cond, x], -1),
                      t_vec.astype(jnp.float32))
        x0 = proc.predict_start_from_noise(sched, x, t_vec, eps)
        if clip:
            x0 = jnp.clip(x0, -1, 1)
        mean, _, _ = proc.q_posterior(sched, x0, x, t_vec)
        sig = float(post_std[ti]) if ti > 0 else 0.0
        x = mean + sig * jax.random.normal(keys[i], x.shape, x.dtype)
    return np.asarray(x)


def test_eta1_full_sequence_is_ancestral_chain(rng):
    T = 12
    sched = _sched(T)
    proc = DDPMProcess(image_size=8, channels=1, conditional=True)
    cond = jax.random.normal(rng, (2, 8, 8, 1))
    denoise = lambda x, t: 0.3 * jnp.tanh(x[..., -1:])  # noqa: E731

    want = _manual_ancestral_foldkeys(proc, sched, denoise, rng, cond)
    got = ddim_sample_loop(proc, denoise, sched, rng, cond, steps=T, eta=1.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_eta0_deterministic_and_respaced_shapes(rng):
    T = 20
    sched = _sched(T)
    proc = DDPMProcess(image_size=8, channels=1, conditional=True)
    cond = jax.random.normal(rng, (2, 8, 8, 1))
    denoise = lambda x, t: 0.3 * jnp.tanh(x[..., -1:])  # noqa: E731

    a = ddim_sample_loop(proc, denoise, sched, rng, cond, steps=5, eta=0.0)
    b = ddim_sample_loop(proc, denoise, sched, rng, cond, steps=5, eta=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(a)).all()
    # a different respacing is a different (finite) result
    c = ddim_sample_loop(proc, denoise, sched, rng, cond, steps=10, eta=0.0)
    assert np.isfinite(np.asarray(c)).all()


def test_unconditional_shape(rng):
    T = 8
    sched = _sched(T)
    proc = DDPMProcess(image_size=8, channels=2, conditional=False)
    denoise = lambda x, t: 0.1 * jnp.tanh(x)  # noqa: E731
    out = ddim_sample_loop(proc, denoise, sched, rng, (2, 8, 8, 2), steps=4)
    assert out.shape == (2, 8, 8, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_sr3_noise_level_conditioning(rng):
    """With the t_cond hook the net sees √ᾱ_{τ+1} (sr3.py:60) — pinned by a
    conditioning-sensitive denoiser vs a manual respaced loop."""
    T = 16
    S = 4
    sched = _sched(T)
    proc = SR3Process(image_size=8, channels=1, conditional=True)
    cond = jax.random.normal(rng, (2, 8, 8, 1))
    denoise = lambda x, lvl: 0.3 * jnp.tanh(x[..., -1:]) * lvl[:, None, None, None]  # noqa: E731
    t_cond = lambda t: sched.sqrt_alphas_cumprod_prev[t + 1]  # noqa: E731

    taus, ab_prev, sigma, dir_coef = ddim_coefficients(sched, S, eta=0.0)
    r, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, (2, 8, 8, 1), cond.dtype)
    sr = np.asarray(sched.sqrt_recip_alphas_cumprod, np.float64)
    srm1 = np.asarray(sched.sqrt_recipm1_alphas_cumprod, np.float64)
    lvls = np.asarray(sched.sqrt_alphas_cumprod_prev, np.float64)
    for i, ti in enumerate(taus):
        lvl = jnp.full((2,), float(lvls[ti + 1]), x.dtype)
        eps = denoise(jnp.concatenate([cond, x], -1), lvl)
        x0 = jnp.clip(float(sr[ti]) * x - float(srm1[ti]) * eps, -1, 1)
        eps = (float(sr[ti]) * x - x0) / float(srm1[ti])
        x = float(np.sqrt(ab_prev[i])) * x0 + float(dir_coef[i]) * eps

    got = ddim_sample_loop(proc, denoise, sched, rng, cond, steps=S, eta=0.0,
                           t_cond=t_cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


def test_chunked_equals_single_scan(rng):
    """⌈S/K⌉ chunked DDIM reproduces the single scan (same pre-split keys,
    same shared step body) for every K incl. K>S."""
    from diffsplitting_tpu.diffusion.ddim import ddim_sample_loop_chunked

    T = 20
    S = 7
    sched = _sched(T)
    proc = DDPMProcess(image_size=8, channels=1, conditional=True)
    cond = jax.random.normal(rng, (2, 8, 8, 1))
    denoise = lambda x, t: 0.3 * jnp.tanh(x[..., -1:])  # noqa: E731
    want = np.asarray(
        ddim_sample_loop(proc, denoise, sched, rng, cond, steps=S, eta=0.7)
    )
    da = lambda p, x, t: denoise(x, t)  # noqa: E731
    for K in (1, 3, 7, 10):
        got = np.asarray(ddim_sample_loop_chunked(
            proc, da, None, sched, rng, cond, steps=S, chunk_size=K, eta=0.7
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_jittable(rng):
    T = 10
    sched = _sched(T)
    proc = DDPMProcess(image_size=8, channels=1, conditional=True)
    cond = jax.random.normal(rng, (1, 8, 8, 1))
    denoise = lambda x, t: 0.3 * jnp.tanh(x[..., -1:])  # noqa: E731
    f = jax.jit(lambda r, c: ddim_sample_loop(proc, denoise, sched, r, c,
                                              steps=4, eta=0.0))
    out = f(rng, cond)
    ref = ddim_sample_loop(proc, denoise, sched, rng, cond, steps=4, eta=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
