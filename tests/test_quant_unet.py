"""W8A8 quantized serving path (models/quant_unet.py + ops/quant.py).

The int8 walker is a serving accelerator for v5e's 2× int8 MXU rate
(results/probe_int8.json); these tests pin (1) the walker's numerical parity
with `UNet.apply` when nothing is quantized, (2) the calibrate→quantize→apply
round trip staying close to the exact forward, and (3) the production
surfaces: `model.quant` config / `set_quant()` routing `DiffusionModel.test()`
through the int8 forward, composing with DDIM/chunked sampling (the
DeepCache composition lives in tests/test_quant_deepcache.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.models.quant_unet import (
    collect_act_absmax,
    is_quantized_tree,
    iter_quant_sites,
    plain_unet_apply,
    quant_unet_apply,
    quantize_unet_params,
)
from diffsplitting_tpu.models.unet import UNet

from tests.test_trainer import synth_batch, tiny_opt


def _tiny_unet(cond_type="noise_level", attn=True, use_affine_level=False):
    return UNet(
        in_channel=2, out_channel=1, inner_channel=8, norm_groups=4,
        channel_mults=(1, 2), attn_res=(8,) if attn else (),
        res_blocks=1, image_size=16, cond_type=cond_type,
        use_affine_level=use_affine_level,
    )


def _init(net, seed=0):
    x = jnp.zeros((2, 16, 16, net.in_channel), jnp.float32)
    t = jnp.ones((2,), jnp.float32) * 0.7
    v = net.init(jax.random.PRNGKey(seed), x, t)
    return v, x, t


@pytest.mark.parametrize("cond_type", ["time", "noise_level", "none"])
def test_walker_matches_flax_apply(cond_type):
    """plain_unet_apply (the quant walker with bf16/f32 convs) must equal
    UNet.apply — the correctness anchor for every quantized variant."""
    net = _tiny_unet(cond_type)
    v, _, t = _init(net)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 16, 16, 2)), jnp.float32)
    want = net.apply(v, x, t)
    got = plain_unet_apply(net, v, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_walker_matches_flax_apply_single_stage():
    """M == 1 (single channel-mult stage): the last stage has no Downsample
    in the flax UNet, and the walker's deep-feats bookkeeping must be empty
    (round-3 advisor finding: the old walker raised KeyError here)."""
    net = UNet(in_channel=2, out_channel=1, inner_channel=8, norm_groups=4,
               channel_mults=(1,), attn_res=(), res_blocks=1,
               image_size=16, cond_type="noise_level")
    v, _, t = _init(net)
    x = jnp.asarray(np.random.default_rng(7).normal(
        size=(2, 16, 16, 2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(plain_unet_apply(net, v, x, t)),
        np.asarray(net.apply(v, x, t)), rtol=1e-5, atol=1e-5)


def test_walker_matches_flax_apply_affine_level():
    net = _tiny_unet("noise_level", use_affine_level=True)
    v, _, t = _init(net)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 16, 16, 2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(plain_unet_apply(net, v, x, t)),
        np.asarray(net.apply(v, x, t)), rtol=1e-5, atol=1e-5)


def test_collect_absmax_covers_conv_sites():
    net = _tiny_unet()
    v, x, t = _init(net)
    out, stats = jax.jit(lambda v, x, t: collect_act_absmax(net, v, x, t))(
        v, x, t)
    assert out.shape == (2, 16, 16, 1)
    # stem + head + every ResnetBlock's two Block convs must be recorded
    assert "Conv_0" in stats and "Block_0/Conv_0" in stats
    block_sites = [k for k in stats
                   if "/Block_" in k and k.endswith("/Conv_0")
                   and k.startswith("ResnetBlockWithAttn")]
    # mults (1,2), res_blocks 1: enc 2 + mid 2 + dec 4 = 8 blocks × 2 convs
    assert len(block_sites) == 16
    for k, s in stats.items():
        assert float(s) >= 0.0, k


def test_quantized_forward_close_to_exact():
    net = _tiny_unet()
    v, _, t = _init(net)
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 16, 16, 2)), jnp.float32)
    _, stats = collect_act_absmax(net, v, x, t)
    qp = quantize_unet_params(
        v["params"], {k: float(s) for k, s in stats.items()})
    assert is_quantized_tree(qp) and not is_quantized_tree(v["params"])
    sites = dict(iter_quant_sites(qp))
    assert len(sites) == 16  # Block convs only by default
    assert all(n["kernel_i8"].dtype == np.int8 for n in sites.values())

    want = np.asarray(plain_unet_apply(net, v, x, t))
    got = np.asarray(jax.jit(
        lambda q, x, t: quant_unet_apply(net, {"params": q}, x, t))(qp, x, t))
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
    assert rel < 0.15, f"W8A8 rel L2 error {rel:.3f}"


def test_quantize_coverage_flags():
    net = _tiny_unet()
    v, x, t = _init(net)
    _, stats = collect_act_absmax(net, v, x, t)
    stats = {k: float(s) for k, s in stats.items()}
    base = len(dict(iter_quant_sites(quantize_unet_params(v["params"], stats))))
    wide = dict(iter_quant_sites(quantize_unet_params(
        v["params"], stats, updown=True, shortcut=True, stem=True, head=True)))
    assert len(wide) > base
    assert "Conv_0" in wide and "Block_0/Conv_0" in wide
    # attention stays bf16 unless attn=True; Dense never quantized (the
    # time-MLP carries <0.05% of forward FLOPs — see quantize_unet_params)
    assert not any("SelfAttention" in k or "Dense" in k for k in wide)
    # the quantized forward still runs and stays sane at full coverage
    qp = quantize_unet_params(v["params"], stats, updown=True, shortcut=True)
    got = np.asarray(quant_unet_apply(net, {"params": qp},
                                      jnp.asarray(x), t))
    assert np.isfinite(got).all()


def test_quantize_attn_sites():
    """attn=True extends int8 to the SelfAttention QKV + proj 1×1 convs and
    the forward stays close to exact (set_quant(..., attn=True) /
    --w8a8_sites attn serving route)."""
    net = _tiny_unet()
    v, _, t = _init(net)
    xr = jnp.asarray(np.random.default_rng(5).normal(
        size=(2, 16, 16, 2)), jnp.float32)
    # calibrate on a representative batch (the serving path calibrates on
    # chain-spanning inputs, trainer._calib_inputs) — not on zeros
    _, stats = collect_act_absmax(net, v, xr, t)
    stats = {k: float(s) for k, s in stats.items()}
    qp = quantize_unet_params(v["params"], stats, updown=True, shortcut=True,
                              attn=True)
    sites = dict(iter_quant_sites(qp))
    attn_sites = [k for k in sites if "SelfAttention" in k]
    # mults (1,2) attn@8: 1 encoder + mid + 2 decoder attn blocks... count
    # structurally instead of hardcoding: both Conv_0 (qkv) and Conv_1 (proj)
    # of every attention block must be present
    assert attn_sites and all(
        k.endswith(("Conv_0", "Conv_1")) for k in attn_sites)
    qkv = [k for k in attn_sites if k.endswith("Conv_0")]
    proj = [k for k in attn_sites if k.endswith("Conv_1")]
    assert len(qkv) == len(proj) > 0
    # qkv has no bias in the flax UNet — the quant node must not invent one
    assert all("bias" not in sites[k] for k in qkv)

    want = np.asarray(plain_unet_apply(net, v, xr, t))
    got = np.asarray(jax.jit(
        lambda q, x, t: quant_unet_apply(net, {"params": q}, x, t))(qp, xr, t))
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
    assert rel < 0.1, f"W8A8+attn rel L2 error {rel:.3f}"


# ------------------------------------------------------------ serving surface
def _sr3_opt(tmp_path, quant=None, **kw):
    from diffsplitting_tpu.config import dict_to_nonedict

    opt = tiny_opt("sr3", tmp_path, conditional=True, in_ch=2, out_ch=1,
                   channels=1)
    if quant is not None:
        opt["model"]["quant"] = dict_to_nonedict(quant)
    for k, val in kw.items():
        opt["model"][k] = val
    return opt


def test_quant_serving_sr3(tmp_path):
    from diffsplitting_tpu.train import DiffusionModel

    batch = {"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]}
    model = DiffusionModel(_sr3_opt(tmp_path), seed=0)
    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"], "val")
    model.feed_data(batch)

    model._rng_counter = 100
    exact = np.asarray(model.test(continuous=False))

    model.set_quant(8)
    model._rng_counter = 100  # same sampler rng
    fast = np.asarray(model.test(continuous=False))
    assert fast.shape == exact.shape and np.isfinite(fast).all()
    assert model._quant_trees  # the int8 tree was actually built
    # 4-step chain on a random-init net: same rng, close trajectories
    assert np.linalg.norm(fast - exact) / np.linalg.norm(exact) < 0.5

    # quant-tree cache: second call must reuse the calibrated tree
    n_trees = sum(len(v) for v in model._quant_trees.values())
    model.test(continuous=False)
    assert sum(len(v) for v in model._quant_trees.values()) == n_trees

    # back to the exact chain, bit-equal to the first run
    model.set_quant(None)
    model._rng_counter = 100
    again = np.asarray(model.test(continuous=False))
    np.testing.assert_array_equal(again, exact)


def test_quant_composes_with_ddim_and_deepcache(tmp_path):
    from diffsplitting_tpu.train import DiffusionModel

    batch = {"input": synth_batch(b=1, in_ch=1, out_ch=1)["input"]}
    model = DiffusionModel(
        _sr3_opt(tmp_path, quant={"bits": 8, "calib": 4}), seed=0)
    assert model.quant is not None  # config path
    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"], "val")
    model.feed_data(batch)

    model.set_ddim(2, 1.0)
    out = np.asarray(model.test(continuous=False))
    assert out.shape == (1, 16, 16, 1) and np.isfinite(out).all()

    # W8A8 × DeepCache compose (the cache-split walker serves int8 full and
    # shallow passes; equality tests in tests/test_quant_deepcache.py)
    model.set_ddim(None)
    model.set_deepcache(2, 1)
    out = np.asarray(model.test(continuous=False))
    assert out.shape == (1, 16, 16, 1) and np.isfinite(out).all()


def test_quant_serving_indi(tmp_path):
    from diffsplitting_tpu.train import DiffusionModel

    opt = tiny_opt("indi", tmp_path, in_ch=2, out_ch=2)
    model = DiffusionModel(opt, seed=0)
    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"], "val")
    model.feed_data(synth_batch(b=1))
    model.set_quant(8, calib=4)
    out = np.asarray(model.test(continuous=False))
    assert out.shape == (1, 16, 16, 2) and np.isfinite(out).all()
