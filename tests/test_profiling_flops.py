"""StepTimer / flops counter / t-refinement unit tests."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diffsplitting_tpu.utils.flops import unet_forward_flops
from diffsplitting_tpu.utils.profiling import StepTimer, peak_flops_per_chip
from diffsplitting_tpu.utils.t_refinement import estimate_time_using_PSNR
from diffsplitting_tpu.diffusion import InDIProcess


def test_step_timer_metrics():
    t = StepTimer(flops_per_step=1e9)
    for _ in range(3):
        with t.step():
            time.sleep(0.01)
    m = t.metrics()
    assert 0.005 < m["step_time_s"] < 0.1
    assert m["steps_per_sec"] > 5
    assert m["mfu"] > 0
    assert peak_flops_per_chip() > 0


def test_unet_flops_scaling():
    base = unet_forward_flops(32, 2, 2, 16, (1, 2, 4, 8), (), 1)
    double_batch = unet_forward_flops(32, 2, 2, 16, (1, 2, 4, 8), (), 1, batch=2)
    assert double_batch == 2 * base
    # 2x resolution ≈ 4x flops (conv-dominated)
    big = unet_forward_flops(64, 2, 2, 16, (1, 2, 4, 8), (), 1)
    assert 3.5 < big / base < 4.6
    with_attn = unet_forward_flops(32, 2, 2, 16, (1, 2, 4, 8), (16,), 1)
    assert with_attn > base


def test_unet_flops_magnitude():
    """The SR3 128px UNet is ~90 GFLOP/image (hand-checked order of magnitude)."""
    f = unet_forward_flops(128, 6, 3, 64, (1, 2, 4, 8, 8), (16,), 2)
    assert 5e10 < f < 3e11


def test_psnr_based_t_refinement_recovers_t(rng):
    """With perfect 1-step denoisers, the PSNR grid search lands near the true t."""
    t_true = 0.3
    B, H, W = 1, 16, 16
    key1, key2 = jax.random.split(rng)
    c1 = jax.random.normal(key1, (B, H, W, 1))
    c2 = jax.random.normal(key2, (B, H, W, 1))
    inp = t_true * c1 + (1 - t_true) * c2

    proc = InDIProcess(image_size=H, channels=1, out_channel=1, conditional=False,
                       noise_mode="none")

    # oracle denoisers: x0-prediction returns the exact channel
    d1 = lambda x, t: jnp.broadcast_to(c1, x.shape)
    d2 = lambda x, t: jnp.broadcast_to(c2, x.shape)
    classifier = lambda x: jnp.full((x.shape[0],), 1 - t_true)  # predicts t for ch2

    per_sample_t, consensus_t = estimate_time_using_PSNR(
        inp, proc, proc, d1, d2, classifier, rng=rng
    )
    assert abs(consensus_t - t_true) <= 0.1
    assert np.all(np.abs(per_sample_t - t_true) <= 0.15)
