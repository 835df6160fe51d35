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
