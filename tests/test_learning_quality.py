"""Learning-quality smoke: a tiny InDI actually learns to split synthetic data.

The reference's de-facto quality check is the in-training validation PSNR
(split.py:163-248). Here: a structured synthetic task (channel 0 = horizontal
gradient patterns, channel 1 = vertical) where splitting is learnable by a
small net in a few hundred steps; the trained model must beat the trivial
"copy the input" baseline on PSNR.
"""

import numpy as np
import pytest

from diffsplitting_tpu.config import dict_to_nonedict
from diffsplitting_tpu.train import DiffusionModel
from diffsplitting_tpu.utils.psnr import PSNR

from tests.test_trainer import tiny_opt


def make_structured_batch(b, s, rng):
    """ch0: smooth horizontal stripes, ch1: vertical stripes (separable)."""
    xs = np.linspace(0, 2 * np.pi, s)
    ch0 = np.stack(
        [np.sin(xs * rng.uniform(1, 3))[None, :] * np.ones((s, 1)) for _ in range(b)]
    )[..., None]
    ch1 = np.stack(
        [np.sin(xs * rng.uniform(1, 3))[:, None] * np.ones((1, s)) for _ in range(b)]
    )[..., None]
    target = np.concatenate([ch0, ch1], axis=-1).astype(np.float32)
    inp = ((ch0 + ch1) / 2).astype(np.float32)
    return {"input": inp, "target": target}


@pytest.mark.slow
def test_indi_learns_to_split():
    opt = tiny_opt("indi", in_ch=2, out_ch=2)
    opt["train"]["optimizer"]["lr"] = 2e-3
    m = DiffusionModel(opt)
    rng = np.random.default_rng(0)

    for step in range(150):
        m.feed_data(make_structured_batch(8, 16, rng))
        m.optimize_parameters()

    # validate: 1-step inference from t=1
    m.set_new_noise_schedule({"n_timestep": 1}, "val")
    val = make_structured_batch(8, 16, np.random.default_rng(123))
    m.feed_data(val)
    pred = np.asarray(m.test(continuous=False))

    tgt = val["target"]
    baseline = np.repeat(val["input"], 2, axis=-1)  # "no splitting" prediction
    psnr_model = np.mean(
        [PSNR(tgt[..., c], pred[..., c]).mean() for c in range(2)]
    )
    psnr_base = np.mean(
        [PSNR(tgt[..., c], baseline[..., c]).mean() for c in range(2)]
    )
    assert np.isfinite(psnr_model)
    assert psnr_model > psnr_base + 1.0, (
        f"model {psnr_model:.2f} dB should beat copy-input baseline {psnr_base:.2f} dB"
    )
