"""W8A8 × DeepCache composition (models/quant_unet.py cached_unet_apply).

The cache-split walker re-runs `models.deepcache.CachedUNet`'s shallow/deep
split as a pure function with the per-node precision hook, so the cached
samplers (diffusion/deepcache.py) serve int8 full AND shallow passes. Pinned
here:
  1. plain-tree parity: cached_unet_apply == CachedUNet.apply for the full
     forward (out AND deep) and the shallow pass, at every valid depth;
  2. quant consistency: the full cached pass over a W8A8 tree equals
     quant_unet_apply (same walk, same hook);
  3. serving: model.quant × model.deepcache through DiffusionModel.test() —
     interval=1 equals the quant exact chain bit-for-bit; interval>1 runs;
     the DDIM × DeepCache × W8A8 triple route runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.config import dict_to_nonedict
from diffsplitting_tpu.models.deepcache import CachedUNet
from diffsplitting_tpu.models.quant_unet import (
    cached_unet_apply,
    collect_act_absmax,
    quant_unet_apply,
    quantize_unet_params,
)
from diffsplitting_tpu.models.unet import UNet

from tests.test_trainer import synth_batch, tiny_opt


def _unet(cond_type="noise_level", mults=(1, 2), rb=1):
    return UNet(
        in_channel=2, out_channel=1, inner_channel=8, norm_groups=4,
        channel_mults=mults, attn_res=(8,), res_blocks=rb, image_size=16,
        cond_type=cond_type,
    )


def _init(net, seed=0):
    x = jnp.asarray(np.random.default_rng(seed + 10).normal(
        size=(2, 16, 16, net.in_channel)), jnp.float32)
    t = jnp.ones((2,), jnp.float32) * 0.7
    v = net.init(jax.random.PRNGKey(seed), jnp.zeros_like(x), t)
    return v, x, t


@pytest.mark.parametrize("cond_type", ["time", "noise_level"])
@pytest.mark.parametrize("mults,rb", [((1, 2), 1), ((1, 2, 4), 2)])
def test_cached_walker_matches_cachedunet(cond_type, mults, rb):
    """Full pass (out + deep) and shallow pass equal CachedUNet.apply on a
    plain param tree, at every valid cache depth."""
    net = _unet(cond_type, mults, rb)
    v, x, t = _init(net)
    for d in range(1, len(mults)):
        cnet = CachedUNet.from_unet(net, d)
        want_out, want_deep = cnet.apply(v, x, t)
        got_out, got_deep = cached_unet_apply(net, v, x, t, cache_depth=d)
        np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_deep),
                                   np.asarray(want_deep),
                                   rtol=1e-5, atol=1e-5)

        # shallow pass from a perturbed cache (exercises the skip path)
        deep_in = want_deep + 0.1
        want_s, _ = cnet.apply(v, x, t, deep_in)
        got_s, got_carry = cached_unet_apply(net, v, x, t, deep_in,
                                             cache_depth=d)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_carry), np.asarray(deep_in),
                                   rtol=1e-6, atol=1e-6)


def test_cached_walker_full_equals_quant_walker():
    """Full cached pass over a W8A8 tree == quant_unet_apply (same ops)."""
    net = _unet()
    v, x, t = _init(net, seed=3)
    _, stats = collect_act_absmax(net, v, x, t)
    qp = {"params": quantize_unet_params(
        v["params"], {k: float(s) for k, s in stats.items()})}
    want = np.asarray(quant_unet_apply(net, qp, x, t))
    out, deep = cached_unet_apply(net, qp, x, t, cache_depth=1)
    np.testing.assert_array_equal(np.asarray(out), want)
    # and the shallow pass stays finite and cache-shaped
    s_out, _ = cached_unet_apply(net, qp, x, t, deep, cache_depth=1)
    assert np.isfinite(np.asarray(s_out)).all()
    assert deep.shape == CachedUNet.from_unet(net, 1).deep_shape(2)


# ------------------------------------------------------------ serving surface
def _sr3_opt(tmp_path, **model_keys):
    opt = tiny_opt("sr3", tmp_path, conditional=True, in_ch=2, out_ch=1,
                   channels=1)
    for k, val in model_keys.items():
        opt["model"][k] = dict_to_nonedict(val) if isinstance(val, dict) else val
    return opt


def test_quant_deepcache_interval1_matches_quant_exact(tmp_path):
    """model.quant × model.deepcache{interval:1} == the quant exact chain
    (every step is a full int8 refresh — bit-equal)."""
    batch = {"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]}

    model = DiffusionModelFactory(tmp_path, quant={"bits": 8, "calib": 4})
    model.feed_data(batch)
    model._rng_counter = 77
    want = np.asarray(model.test(continuous=False))

    model.set_deepcache(1, 1)
    model._rng_counter = 77
    got = np.asarray(model.test(continuous=False))
    np.testing.assert_array_equal(got, want)

    # interval>1 runs the int8 shallow pass and stays sane
    model.set_deepcache(2, 1)
    model._rng_counter = 77
    fast = np.asarray(model.test(continuous=False))
    assert fast.shape == want.shape and np.isfinite(fast).all()


def DiffusionModelFactory(tmp_path, **model_keys):
    from diffsplitting_tpu.train import DiffusionModel

    m = DiffusionModel(_sr3_opt(tmp_path, **model_keys), seed=0)
    m.set_new_noise_schedule(m.opt["model"]["beta_schedule"]["val"], "val")
    return m


def test_quant_ddim_deepcache_triple_route(tmp_path):
    """model.quant × model.ddim × model.deepcache serves through the cached
    respaced chain with int8 forwards."""
    model = DiffusionModelFactory(tmp_path, quant={"bits": 8, "calib": 4})
    model.set_ddim(2, 1.0)
    model.set_deepcache(2, 1)
    model.feed_data({"input": synth_batch(b=1, in_ch=1, out_ch=1)["input"]})
    out = np.asarray(model.test(continuous=False))
    assert out.shape == (1, 16, 16, 1) and np.isfinite(out).all()


def test_quant_deepcache_unconditional_sample(tmp_path):
    """Unconditional generation (sample.py path) through quant × deepcache."""
    from diffsplitting_tpu.train import DiffusionModel

    opt = tiny_opt("sr3", tmp_path, conditional=False, in_ch=1, out_ch=1,
                   channels=1)
    opt["model"]["quant"] = dict_to_nonedict({"bits": 8, "calib": 4})
    model = DiffusionModel(opt, seed=0)
    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"],
                                 "val")
    model.set_deepcache(2, 1)
    out = np.asarray(model.sample(batch_size=1, continuous=False))
    assert out.shape == (1, 16, 16, 1) and np.isfinite(out).all()
