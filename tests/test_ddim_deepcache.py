"""DDIM × DeepCache composition: the cached respaced chain must reproduce
the plain DDIM chain at interval=1 (single-scan and chunked), and the
trainer must route the combined config through it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.diffusion import DDPMProcess, SR3Process, build_ddpm_schedule
from diffsplitting_tpu.diffusion.ddim import ddim_sample_loop
from diffsplitting_tpu.diffusion.deepcache import (
    cached_ddim_sample_loop,
    cached_ddim_sample_loop_chunked,
    make_cached_denoisers,
)
from diffsplitting_tpu.models import UNet


def _setup(which):
    net = UNet(in_channel=6, out_channel=3, inner_channel=8, norm_groups=4,
               channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0,
               image_size=16,
               cond_type="noise_level" if which == "sr3" else "time")
    cls = SR3Process if which == "sr3" else DDPMProcess
    process = cls(image_size=16, channels=3, conditional=True)
    sched = build_ddpm_schedule(
        {"schedule": "linear", "n_timestep": 20, "linear_start": 1e-6,
         "linear_end": 1e-2})
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)), jnp.ones((1,)))
    cond = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3), jnp.float32)
    if which == "sr3":
        _lvls = np.asarray(sched.sqrt_alphas_cumprod_prev)
        t_cond = lambda t: _lvls[t + 1]  # noqa: E731
    else:
        t_cond = None
    return net, process, sched, v, cond, t_cond


@pytest.mark.parametrize("which", ["sr3", "ddpm"])
@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_interval1_matches_plain_ddim(which, eta):
    net, process, sched, v, cond, t_cond = _setup(which)
    want = np.asarray(ddim_sample_loop(
        process, lambda x, t: net.apply(v, x, t), sched,
        jax.random.PRNGKey(7), cond, steps=8, eta=eta, t_cond=t_cond))

    full, shallow, _ = make_cached_denoisers(net, v, cache_depth=1)
    got = np.asarray(cached_ddim_sample_loop(
        process, sched, jax.random.PRNGKey(7), cond, full, shallow,
        steps=8, eta=eta, interval=1, t_cond=t_cond))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_chunked_matches_single_scan_cached():
    from diffsplitting_tpu.diffusion.common import ChunkRunner

    net, process, sched, v, cond, t_cond = _setup("sr3")
    full, shallow, cnet = make_cached_denoisers(net, v, cache_depth=1)
    want = np.asarray(cached_ddim_sample_loop(
        process, sched, jax.random.PRNGKey(7), cond, full, shallow,
        steps=8, eta=1.0, interval=3, t_cond=t_cond))

    full_p = lambda p, ni, lvl: cnet.apply(p, ni, lvl)  # noqa: E731
    shallow_p = lambda p, ni, lvl, d: cnet.apply(p, ni, lvl, d)  # noqa: E731
    runner = ChunkRunner()
    for _ in range(2):  # second call must reuse the runner's compiles
        got = np.asarray(cached_ddim_sample_loop_chunked(
            process, sched, jax.random.PRNGKey(7), cond, full_p, shallow_p, v,
            steps=8, chunk_size=3, eta=1.0, interval=3, t_cond=t_cond,
            runner=runner))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_trainer_routes_ddim_plus_deepcache(tmp_path):
    """config model.ddim × model.deepcache serve through the cached respaced
    chain; at interval=1 the route equals the ddim-only route."""
    from tests.test_trainer import synth_batch, tiny_opt

    from diffsplitting_tpu.train import DiffusionModel

    m = DiffusionModel(tiny_opt("sr3", tmp_path, conditional=True,
                                in_ch=3, out_ch=2, channels=2))
    m.feed_data(synth_batch(in_ch=1, out_ch=2))
    m.optimize_parameters()

    m.set_ddim(4, 1.0)
    m._rng_counter = 3
    want = np.asarray(m.test(continuous=False))

    m.set_deepcache(1, 1)  # interval=1: cached == plain respaced chain
    m._rng_counter = 3
    got = np.asarray(m.test(continuous=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    m.set_deepcache(2, 1)  # interval>1: runs, same shape, finite
    m._rng_counter = 3
    out = np.asarray(m.test(continuous=False))
    assert out.shape == want.shape and np.isfinite(out).all()

    # chunked composition (S > sampler_chunk)
    m.sampler_chunk = 2
    m._infer_cache.clear()
    m._rng_counter = 3
    out_c = np.asarray(m.test(continuous=False))
    assert out_c.shape == want.shape and np.isfinite(out_c).all()

    # sliding-window stays exclusive
    m.set_sliding_window(2, 0.0)
    with pytest.raises(ValueError, match="exclusive"):
        m.test(continuous=False)
    m.set_sliding_window(None)
    m.set_deepcache(None)
    m.set_ddim(None)


def test_trainer_unconditional_sample_ddim_deepcache():
    from tests.test_trainer import synth_batch, tiny_opt

    from diffsplitting_tpu.train import DiffusionModel

    m = DiffusionModel(tiny_opt("ddpm", conditional=False, in_ch=2,
                                out_ch=2, channels=2))
    m.feed_data(synth_batch(in_ch=2, out_ch=2, s=16))
    m.optimize_parameters()
    m.set_ddim(4, 0.0)
    m.set_deepcache(2, 1)
    out = np.asarray(m.sample(batch_size=2, continuous=False))
    assert out.shape == (2, 16, 16, 2) and np.isfinite(out).all()
