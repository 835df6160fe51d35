"""Chunked reverse sampling: ⌈T/K⌉ jitted K-step scans == the single scan.

The 512²×2000 SR3 chain kernel-faults the tunnel's TPU worker as ONE scan
(CLAUDE.md); `p_sample_loop_chunked` bounds the compile unit without changing
the math — these tests pin bit-identity against `p_sample_loop` on CPU, for
even and non-dividing chunk sizes, and through the trainer's
`model.sampler_chunk` config route.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.diffusion import DDPMProcess, SR3Process, build_ddpm_schedule
from diffsplitting_tpu.models import UNet


def _setup(which):
    net = UNet(in_channel=6, out_channel=3, inner_channel=8, norm_groups=4,
               channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0,
               image_size=16,
               cond_type="noise_level" if which == "sr3" else "time")
    cls = SR3Process if which == "sr3" else DDPMProcess
    process = cls(image_size=16, channels=3, conditional=True)
    sched = build_ddpm_schedule(
        {"schedule": "linear", "n_timestep": 10, "linear_start": 1e-6,
         "linear_end": 1e-2})
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)), jnp.ones((1,)))
    cond = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3), jnp.float32)
    return net, process, sched, v, cond


@pytest.mark.parametrize("which", ["sr3", "ddpm"])
@pytest.mark.parametrize("chunk", [3, 5, 10, 64])
def test_chunked_matches_single_scan(which, chunk):
    net, process, sched, v, cond = _setup(which)
    denoise = lambda xx, tt: net.apply(v, xx, tt)  # noqa: E731
    want = np.asarray(process.p_sample_loop(
        denoise, sched, jax.random.PRNGKey(7), cond, continuous=False))

    da = lambda p, xx, tt: net.apply(p, xx, tt)  # noqa: E731
    got = np.asarray(process.p_sample_loop_chunked(
        da, v, sched, jax.random.PRNGKey(7), cond, chunk_size=chunk))
    np.testing.assert_array_equal(got, want)


def test_cached_chunked_matches_cached_single_scan():
    """DeepCache × chunking: the chunk-carried cache reproduces the
    single-scan cached loop (and at interval=1, the exact chain)."""
    from diffsplitting_tpu.diffusion.deepcache import (
        cached_p_sample_loop,
        cached_p_sample_loop_chunked,
        make_cached_denoisers,
    )

    net, process, sched, v, cond = _setup("sr3")
    full, shallow, cnet = make_cached_denoisers(net, v, cache_depth=1)
    full_p = lambda p, ni, lvl: cnet.apply(p, ni, lvl)  # noqa: E731
    shallow_p = lambda p, ni, lvl, d: cnet.apply(p, ni, lvl, d)  # noqa: E731

    for interval in (1, 3):
        want = np.asarray(cached_p_sample_loop(
            process, sched, jax.random.PRNGKey(7), cond, full, shallow,
            interval=interval))
        got = np.asarray(cached_p_sample_loop_chunked(
            process, sched, jax.random.PRNGKey(7), cond, full_p, shallow_p,
            v, interval=interval, chunk_size=4))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    # interval=1 through the chunked cached loop == the exact chain
    denoise = lambda xx, tt: net.apply(v, xx, tt)  # noqa: E731
    exact = np.asarray(process.p_sample_loop(
        denoise, sched, jax.random.PRNGKey(7), cond, continuous=False))
    got1 = np.asarray(cached_p_sample_loop_chunked(
        process, sched, jax.random.PRNGKey(7), cond, full_p, shallow_p, v,
        interval=1, chunk_size=3))
    np.testing.assert_allclose(got1, exact, rtol=1e-5, atol=1e-6)


def test_trainer_deepcache_plus_chunk_route(tmp_path):
    """model.deepcache × model.sampler_chunk through test(): interval=1
    reproduces the plain-chunk (== exact) chain."""
    from tests.test_trainer import synth_batch, tiny_opt

    from diffsplitting_tpu.train import DiffusionModel

    batch = {"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]}

    opt = tiny_opt("sr3", tmp_path, conditional=True, in_ch=2, out_ch=1,
                   channels=1)
    plain = DiffusionModel(opt, seed=0)
    plain.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    plain.feed_data(batch)
    want = np.asarray(plain.test(continuous=False))

    opt2 = tiny_opt("sr3", tmp_path, conditional=True, in_ch=2, out_ch=1,
                    channels=1)
    opt2["model"]["sampler_chunk"] = 3
    from diffsplitting_tpu.config import dict_to_nonedict

    opt2["model"]["deepcache"] = dict_to_nonedict({"interval": 1, "depth": 1})
    both = DiffusionModel(opt2, seed=0)
    both.set_new_noise_schedule(opt2["model"]["beta_schedule"]["val"], "val")
    both.feed_data(batch)
    got = np.asarray(both.test(continuous=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # interval>1 still runs through the composed route
    both.set_deepcache(2, 1)
    out = np.asarray(both.test(continuous=False))
    assert out.shape == want.shape and np.isfinite(out).all()


def test_trainer_sampler_chunk_route(tmp_path):
    from tests.test_trainer import synth_batch, tiny_opt

    from diffsplitting_tpu.train import DiffusionModel

    opt = tiny_opt("sr3", tmp_path, conditional=True, in_ch=2, out_ch=1,
                   channels=1)
    batch = {"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]}

    plain = DiffusionModel(opt, seed=0)
    plain.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    plain.feed_data(batch)
    want = np.asarray(plain.test(continuous=False))

    opt2 = tiny_opt("sr3", tmp_path, conditional=True, in_ch=2, out_ch=1,
                    channels=1)
    opt2["model"]["sampler_chunk"] = 3  # T=4 -> chunks of 3 + remainder 1
    chunked = DiffusionModel(opt2, seed=0)
    assert chunked.sampler_chunk == 3
    chunked.set_new_noise_schedule(opt2["model"]["beta_schedule"]["val"], "val")
    chunked.feed_data(batch)
    got = np.asarray(chunked.test(continuous=False))
    np.testing.assert_array_equal(got, want)

    # trajectory requests bypass chunking (full scan still works)
    frames = np.asarray(chunked.test(continuous=True))
    assert frames.ndim == 5


def test_chunk_runner_reuses_compiles_across_calls():
    """Serving regression: without a ChunkRunner every chunked call builds a
    fresh @jax.jit and RE-TRACES (measured as tens of seconds per request
    through the TPU tunnel); with one, the second call must not trace at all
    and stays bit-identical to the runner-less path."""
    from diffsplitting_tpu.diffusion.common import ChunkRunner

    net, process, sched, v, cond = _setup("sr3")
    traces = [0]

    def da(p, xx, tt):
        traces[0] += 1  # increments only while tracing
        return net.apply(p, xx, tt)

    runner = ChunkRunner()
    out1 = np.asarray(process.p_sample_loop_chunked(
        da, v, sched, jax.random.PRNGKey(7), cond, chunk_size=4, runner=runner))
    n_first = traces[0]
    assert n_first > 0  # chunk 4 over T=10 → 4/4/2: two trace signatures
    out2 = np.asarray(process.p_sample_loop_chunked(
        da, v, sched, jax.random.PRNGKey(7), cond, chunk_size=4, runner=runner))
    assert traces[0] == n_first, "second call re-traced despite the runner"
    np.testing.assert_array_equal(out1, out2)

    da_plain = lambda p, xx, tt: net.apply(p, xx, tt)  # noqa: E731
    want = np.asarray(process.p_sample_loop_chunked(
        da_plain, v, sched, jax.random.PRNGKey(7), cond, chunk_size=4))
    np.testing.assert_array_equal(out1, want)
