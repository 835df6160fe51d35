"""DeepCache: CachedUNet must bind the plain UNet's params bit-exactly, and
the cached sampler at interval=1 must reproduce p_sample_loop exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.diffusion import DDPMProcess, SR3Process, build_ddpm_schedule
from diffsplitting_tpu.diffusion.deepcache import (
    cached_p_sample_loop,
    make_cached_denoisers,
)
from diffsplitting_tpu.models import UNet
from diffsplitting_tpu.models.deepcache import CachedUNet


def _net(cond_type, attn=(4,), mults=(1, 2, 4), res_blocks=2):
    return UNet(
        in_channel=6, out_channel=3, inner_channel=8, norm_groups=4,
        channel_mults=mults, attn_res=attn, res_blocks=res_blocks,
        dropout=0.0, image_size=16, cond_type=cond_type, dtype=jnp.bfloat16,
    )


@pytest.mark.parametrize("cond_type", ["noise_level", "time"])
def test_cached_unet_full_is_bit_exact(cond_type):
    net = _net(cond_type)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 6), jnp.float32)
    t = jnp.array([0.3, 0.8], jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, t)
    ref = np.asarray(net.apply(v, x, t))
    for depth in (1, 2):
        cnet = CachedUNet.from_unet(net, depth)
        out, deep = cnet.apply(v, x, t)
        np.testing.assert_array_equal(np.asarray(out), ref)
        assert deep.shape == cnet.deep_shape(2)
        # shallow pass re-fed the fresh cache reproduces the full output
        out2, deep2 = cnet.apply(v, x, t, deep)
        np.testing.assert_array_equal(np.asarray(out2), ref)
        np.testing.assert_array_equal(np.asarray(deep2), np.asarray(deep))


def test_cached_unet_other_shapes():
    # res_blocks=1 and no attention — different skip bookkeeping
    net = _net("noise_level", attn=(), mults=(1, 2, 2, 4), res_blocks=1)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 6), jnp.float32)
    t = jnp.array([0.5], jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, t)
    ref = np.asarray(net.apply(v, x, t))
    for depth in (1, 2, 3):
        out, _ = CachedUNet.from_unet(net, depth).apply(v, x, t)
        np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("which", ["sr3", "ddpm"])
def test_interval1_matches_p_sample_loop(which):
    cond_type = "noise_level" if which == "sr3" else "time"
    net = _net(cond_type)
    proc_cls = SR3Process if which == "sr3" else DDPMProcess
    process = proc_cls(image_size=16, channels=3, conditional=True)
    sched = build_ddpm_schedule(
        {"schedule": "linear", "n_timestep": 6, "linear_start": 1e-6,
         "linear_end": 1e-2}
    )
    cond = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)), jnp.ones((1,)))

    denoise = lambda xx, tt: net.apply(v, xx, tt)  # noqa: E731
    ref = process.p_sample_loop(denoise, sched, jax.random.PRNGKey(7), cond,
                                continuous=False)

    full, shallow, cnet = make_cached_denoisers(net, v, cache_depth=2)
    out = cached_p_sample_loop(
        process, sched, jax.random.PRNGKey(7), cond, full, shallow, interval=1,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_interval3_runs_and_differs_gracefully():
    net = _net("noise_level")
    process = SR3Process(image_size=16, channels=3, conditional=True)
    sched = build_ddpm_schedule(
        {"schedule": "linear", "n_timestep": 9, "linear_start": 1e-6,
         "linear_end": 1e-2}
    )
    cond = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)), jnp.ones((1,)))
    full, shallow, cnet = make_cached_denoisers(net, v, cache_depth=1)
    out = jax.jit(
        lambda r, c: cached_p_sample_loop(
            process, sched, r, c, full, shallow, interval=3,
        )
    )(jax.random.PRNGKey(7), cond)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()

    # refresh_override (traced flags) must equal the interval= path exactly
    rf = np.zeros(9, np.int32)
    rf[::3] = 1
    out2 = jax.jit(
        lambda r, c, flags: cached_p_sample_loop(
            process, sched, r, c, full, shallow, interval=1,
            refresh_override=flags,
        )
    )(jax.random.PRNGKey(7), cond, jnp.asarray(rf))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))


def test_indi_interval1_matches_inference():
    from diffsplitting_tpu.diffusion import InDIProcess
    from diffsplitting_tpu.diffusion.deepcache import cached_indi_inference

    net = UNet(in_channel=2, out_channel=2, inner_channel=8, norm_groups=4,
               channel_mults=(1, 2), attn_res=(), res_blocks=1,
               image_size=16, cond_type="time")  # f32: equality up to fusion
    proc = InDIProcess(image_size=16, channels=2, out_channel=2,
                       conditional=False, num_timesteps=10)
    x_in = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 1), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 2)), jnp.ones((1,)))

    ref = proc.inference(lambda xx, tt: net.apply(v, xx, tt),
                         jax.random.PRNGKey(5), x_in, num_timesteps=10)
    full, shallow, _ = make_cached_denoisers(net, v, 1)
    out = cached_indi_inference(proc, jax.random.PRNGKey(5), x_in, full, shallow,
                                interval=1, num_timesteps=10)
    # two separately-compiled scans: identical math up to f32 fusion rounding
    # (bf16 nets drift visibly through the unclipped GN-amplified chain)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    out3 = jax.jit(
        lambda r, c: cached_indi_inference(proc, r, c, full, shallow,
                                           interval=3, num_timesteps=10)
    )(jax.random.PRNGKey(5), x_in)
    assert np.isfinite(np.asarray(out3)).all()


def test_joint_indi_cached_matches_exact():
    from diffsplitting_tpu.diffusion import JointInDIProcess
    from diffsplitting_tpu.diffusion.deepcache import cached_joint_indi_inference

    nets = [
        UNet(in_channel=2, out_channel=2, inner_channel=8, norm_groups=4,
             channel_mults=(1, 2), attn_res=(), res_blocks=1,
             image_size=16, cond_type="time")
        for _ in range(2)
    ]
    proc = JointInDIProcess(image_size=16, channels=1, conditional=False,
                            num_timesteps=8)
    x_in = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 1), jnp.float32)
    vs = [n.init(jax.random.PRNGKey(i), jnp.zeros((1, 16, 16, 2)), jnp.ones((1,)))
          for i, n in enumerate(nets)]

    ref = proc.inference(
        lambda xx, tt: nets[0].apply(vs[0], xx, tt),
        lambda xx, tt: nets[1].apply(vs[1], xx, tt),
        jax.random.PRNGKey(5), x_in, num_timesteps=8,
    )
    a1 = make_cached_denoisers(nets[0], vs[0], 1)[:2]
    a2 = make_cached_denoisers(nets[1], vs[1], 1)[:2]
    out = cached_joint_indi_inference(proc, jax.random.PRNGKey(5), x_in, a1, a2,
                                      interval=1, num_timesteps=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
