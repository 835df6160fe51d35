"""Integration test over the reference's shipped sample SR images (read-only)."""

import os

import numpy as np
import pytest

REF_ROOT = "/root/reference/dataset/celebahq_16_128"


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="sample dataset not present")
def test_lrhr_on_reference_sample():
    from diffsplitting_tpu.data.lrhr_dataset import LRHRDataset

    ds = LRHRDataset(REF_ROOT, "img", l_resolution=16, r_resolution=128,
                     split="val", data_len=-1, need_LR=True)
    assert len(ds) == 1
    s = ds[0]
    assert s["HR"].shape == (128, 128, 3)
    assert s["SR"].shape == (128, 128, 3)
    assert s["LR"].shape == (16, 16, 3)
    for k in ("HR", "SR", "LR"):
        assert -1.001 <= s[k].min() and s[k].max() <= 1.001
        assert np.isfinite(s[k]).all()


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="sample dataset not present")
def test_sr3_reverse_on_real_image():
    """A tiny SR3 net runs a 2-step reverse pass on the real 128px condition."""
    import jax

    from diffsplitting_tpu.data.lrhr_dataset import LRHRDataset
    from diffsplitting_tpu.diffusion import SR3Process, build_ddpm_schedule
    from diffsplitting_tpu.models import UNet

    ds = LRHRDataset(REF_ROOT, "img", 16, 128, split="val", data_len=-1, need_LR=False)
    cond = ds[0]["SR"][None]  # (1, 128, 128, 3)

    net = UNet(in_channel=6, out_channel=3, inner_channel=8, norm_groups=4,
               channel_mults=(1, 2), attn_res=(), res_blocks=1, image_size=128)
    params = net.init(jax.random.PRNGKey(0), np.zeros((1, 128, 128, 6), np.float32),
                      np.ones((1,), np.float32))
    proc = SR3Process(image_size=128, channels=3, conditional=True)
    sched = build_ddpm_schedule(
        {"schedule": "linear", "n_timestep": 2, "linear_start": 1e-6, "linear_end": 1e-2}
    )
    out = proc.p_sample_loop(
        lambda x, t: net.apply(params, x, t), sched, jax.random.PRNGKey(1),
        cond.astype(np.float32), continuous=False,
    )
    assert out.shape == (1, 128, 128, 3)
    assert np.isfinite(np.asarray(out)).all()
