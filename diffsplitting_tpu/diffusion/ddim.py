"""Respaced DDIM sampling for the DDPM/SR3 reverse chains.

The reference serves its SR models with the full T-step ancestral chain
(/root/reference/model/sr3_modules/diffusion.py:198-218, T=2000 for the
README numbers) — there is no fewer-step sampler upstream. DDIM (Song et
al., "Denoising Diffusion Implicit Models", ICLR 2021, eq. 12) generalizes
that chain to a non-Markovian family sharing the same trained network: a
sub-sequence τ of S ≪ T timesteps is traversed with

    x_{τ'} = √ᾱ_{τ'}·x̂0 + √(1-ᾱ_{τ'}-σ²)·ε̂ + σ·z,
    σ = η·√((1-ᾱ_{τ'})/(1-ᾱ_τ))·√(1-ᾱ_τ/ᾱ_{τ'}),

which at η=1 over the FULL sequence is algebraically the ancestral posterior
step (σ² = posterior_variance — tested), and at η=0 is the deterministic
probability-flow sampler that keeps quality at S ~ T/40..T/8. That makes it
the largest serving lever in the stack: a 2000-step chain served in 50-250
steps, orthogonal to batching and compatible with every trained checkpoint.

TPU framing: the respaced subsequence is STATIC, so every per-step
coefficient is precomputed as an (S,) numpy constant and the whole sampler
is ONE `lax.scan` of S net forwards — same compile unit shape as the exact
chain, just shorter.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import DDPMSchedule


def ddim_timesteps(T: int, steps: int) -> np.ndarray:
    """Uniform respaced timestep subsequence, descending (τ_S-1 ... τ_0).

    steps=T returns the full sequence T-1..0 (→ η=1 reproduces the
    ancestral chain); endpoints are always included so the chain starts at
    the trained prior and ends at t=0.
    """
    S = int(steps)
    if S >= T:
        return np.arange(T - 1, -1, -1, dtype=np.int64)
    assert S >= 1, "need at least one DDIM step"
    # built from T-1 DOWN so S=1 keeps the trained-prior timestep (a 0-based
    # ascending linspace would collapse S=1 to τ=[0]: a chain that never
    # leaves the nearly-clean noise level)
    taus = np.unique(np.round(np.linspace(T - 1, 0, S)).astype(np.int64))
    return taus[::-1].copy()


def ddim_coefficients(sched: DDPMSchedule, steps: int, eta: float):
    """Static per-step (S,) coefficient arrays for the respaced chain.

    Returns (taus, ab_prev, sigma, dir_coef) as float64 numpy — the scan
    consumes them as constants (no gathers in the compiled program).
    """
    T = sched.num_timesteps
    taus = ddim_timesteps(T, steps)
    ab = np.asarray(sched.alphas_cumprod, np.float64)
    ab_t = ab[taus]
    # target ᾱ of each transition: the next (smaller) τ, and exactly 1.0
    # for the final step (x0 output, σ=0 there for any η)
    ab_prev = np.append(ab[taus[1:]], 1.0)
    sigma = (
        float(eta)
        * np.sqrt((1.0 - ab_prev) / (1.0 - ab_t))
        * np.sqrt(1.0 - ab_t / ab_prev)
    )
    dir_coef = np.sqrt(np.maximum(1.0 - ab_prev - sigma**2, 0.0))
    return taus, ab_prev, sigma, dir_coef


def ddim_sample_loop(
    process,
    denoise_fn: Callable,
    sched: DDPMSchedule,
    rng,
    x_in,
    steps: int,
    eta: float = 0.0,
    clip_denoised: bool = True,
    condition_x=None,
    t_cond: Optional[Callable] = None,
):
    """Respaced DDIM reverse chain as one S-step `lax.scan`.

    Same conditioning contract as the exact samplers: `x_in` is the
    condition when `process.conditional` (else a shape tuple/array for
    unconditional generation), and `t_cond` maps the static (S,) int64
    NUMPY timestep vector to the denoiser's conditioning and must return a
    host array (it runs at trace time — index a numpy copy of the schedule,
    not the jnp array). Default raw t as float32 (DDPM nets, ddpm.py:91);
    SR3 nets need `sqrt_alphas_cumprod_prev[t + 1]` (sr3.py:60).

    ε̂ is re-derived from the CLIPPED x̂0 so the update direction stays
    consistent with clipping (the exact chain clips x̂0 the same way).

    Returns the final image (B, H, W, C).
    """
    img, cond, xs = _ddim_setup(process, sched, rng, x_in, steps, eta,
                                t_cond, condition_x)

    def body(x, inp):
        return _ddim_step(denoise_fn, cond, x, inp, clip_denoised), None

    img, _ = jax.lax.scan(body, img, xs)
    return img


def _ddim_setup(process, sched, rng, x_in, steps, eta, t_cond,
                condition_x=None):
    """Shared preamble of both DDIM loops: initial noise, condition, and the
    per-step (S,)-stacked scan inputs (keys + static coefficients)."""
    S_taus, ab_prev, sigma, dir_coef = ddim_coefficients(sched, steps, eta)
    S = len(S_taus)
    if t_cond is None:
        tcv = S_taus.astype(np.float32)
    else:
        tcv = np.asarray(t_cond(S_taus), np.float32)

    rng, init_rng = jax.random.split(rng)
    if process.conditional:
        cond = x_in if condition_x is None else condition_x
        shape = cond.shape[:-1] + (process.channels,)
        img = jax.random.normal(init_rng, shape, dtype=cond.dtype)
    else:
        cond = None
        shape = tuple(x_in) if isinstance(x_in, (tuple, list)) else x_in.shape
        img = jax.random.normal(init_rng, shape, dtype=jnp.float32)

    c_sr = np.asarray(sched.sqrt_recip_alphas_cumprod, np.float64)[S_taus]
    c_srm1 = np.asarray(sched.sqrt_recipm1_alphas_cumprod, np.float64)[S_taus]

    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    xs = (
        jax.random.split(rng, S),
        f32(tcv),
        f32(c_sr),
        f32(c_srm1),
        f32(np.sqrt(ab_prev)),
        f32(sigma),
        f32(dir_coef),
    )
    return img, cond, xs


def _ddim_update(key, x, eps, sr, srm1, sq_ab_prev, sig, dirc, clip_denoised):
    """The x_τ → x_τ' update given ε̂ — shared with the DeepCache-cached DDIM
    loops (deepcache.py) so every route compiles the same transition math."""
    x0 = sr * x - srm1 * eps
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
    eps = (sr * x - x0) / srm1
    noise = jax.random.normal(key, x.shape, x.dtype)
    return sq_ab_prev * x0 + dirc * eps + sig * noise


def _ddim_step(denoise_fn, cond, x, inp, clip_denoised):
    """One respaced transition x_τ → x_τ' (shared by the single-scan and
    chunked loops so both compile the same step body)."""
    key, tc, sr, srm1, sq_ab_prev, sig, dirc = inp
    b = x.shape[0]
    net_in = x if cond is None else jnp.concatenate([cond, x], axis=-1)
    eps = denoise_fn(net_in, jnp.full((b,), tc, x.dtype))
    return _ddim_update(key, x, eps, sr, srm1, sq_ab_prev, sig, dirc,
                        clip_denoised)


def ddim_sample_loop_chunked(
    process,
    denoise_apply: Callable,
    params,
    sched: DDPMSchedule,
    rng,
    x_in,
    steps: int,
    chunk_size: int,
    eta: float = 0.0,
    clip_denoised: bool = True,
    t_cond: Optional[Callable] = None,
    runner=None,
):
    """`ddim_sample_loop` as ⌈S/K⌉ jitted K-step scans + a host loop.

    Identical rng discipline and step body as the single scan — chunking
    changes compilation units, not math (common.chunked_reverse_scan) —
    for shapes whose full program breaks the compiler (the 512²-class
    chains, CLAUDE.md). `denoise_apply(params, x, t)` keeps params/condition
    as jit arguments (tunnel remote-compile payload limit).
    """
    img, cond, step_inputs = _ddim_setup(process, sched, rng, x_in, steps,
                                         eta, t_cond)

    def step_fn(consts, x, inp):
        p, c = consts
        dn = lambda xx, tt: denoise_apply(p, xx, tt)  # noqa: E731
        return _ddim_step(dn, c, x, inp, clip_denoised)

    from .common import chunked_reverse_scan

    return chunked_reverse_scan(step_fn, (params, cond), img, step_inputs,
                                chunk_size, runner=runner)
