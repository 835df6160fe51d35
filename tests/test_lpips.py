"""LPIPS scaffold tests (random weights — real weights are a file-drop away)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.utils.lpips import (
    FEATURE_CHANNELS,
    load_lpips_weights,
    lpips,
    lpips_grayscale,
    params_from_torch_state_dicts,
    random_lpips_params,
    save_lpips_weights,
)


@pytest.fixture(scope="module")
def params():
    return random_lpips_params(jax.random.PRNGKey(0))


def test_lpips_zero_on_identical(params):
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), minval=-1, maxval=1)
    d = np.asarray(lpips(params, x, x))
    assert d.shape == (2,)
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_lpips_positive_and_orders(params):
    k = jax.random.PRNGKey(2)
    x = jax.random.uniform(k, (1, 64, 64, 3), minval=-1, maxval=1)
    small = jnp.clip(x + 0.05 * jax.random.normal(jax.random.fold_in(k, 1), x.shape), -1, 1)
    big = jnp.clip(x + 0.5 * jax.random.normal(jax.random.fold_in(k, 2), x.shape), -1, 1)
    d_small = float(lpips(params, x, small)[0])
    d_big = float(lpips(params, x, big)[0])
    assert 0 < d_small < d_big


def test_lpips_grayscale(params):
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 1), minval=-1, maxval=1)
    d = np.asarray(lpips_grayscale(params, x, -x))
    assert d.shape == (2,) and (d > 0).all()


def test_weights_npz_roundtrip(tmp_path, params):
    p = str(tmp_path / "lpips.npz")
    save_lpips_weights(params, p)
    loaded = load_lpips_weights(p)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3), minval=-1, maxval=1)
    y = -x
    np.testing.assert_allclose(
        np.asarray(lpips(params, x, y)), np.asarray(lpips(loaded, x, y)), rtol=1e-6
    )


def test_torch_state_dict_conversion(params):
    """A synthetic torchvision-AlexNet + lpips lin state dict converts to the
    exact same pytree values (OIHW→HWIO, (1,C,1,1)→(C,))."""
    rng = np.random.default_rng(0)
    conv_idx = (0, 3, 6, 8, 10)
    kshapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
               (256, 384, 3, 3), (256, 256, 3, 3)]
    alex_sd = {}
    lp_sd = {}
    for i, (j, ks) in enumerate(zip(conv_idx, kshapes)):
        alex_sd[f"features.{j}.weight"] = rng.normal(size=ks).astype(np.float32)
        alex_sd[f"features.{j}.bias"] = rng.normal(size=ks[0]).astype(np.float32)
        lp_sd[f"lin{i}.model.1.weight"] = np.abs(
            rng.normal(size=(1, ks[0], 1, 1))
        ).astype(np.float32)
    out = params_from_torch_state_dicts(alex_sd, lp_sd)
    for i, ks in enumerate(kshapes):
        np.testing.assert_array_equal(
            np.asarray(out[f"conv{i}"]["kernel"]),
            alex_sd[f"features.{conv_idx[i]}.weight"].transpose(2, 3, 1, 0),
        )
        np.testing.assert_array_equal(
            np.asarray(out[f"lin{i}"]["weight"]),
            lp_sd[f"lin{i}.model.1.weight"].reshape(-1),
        )
    assert tuple(out[f"conv{i}"]["kernel"].shape[-1] for i in range(5)) == FEATURE_CHANNELS


def test_load_torch_pth(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    conv_idx = (0, 3, 6, 8, 10)
    kshapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
               (256, 384, 3, 3), (256, 256, 3, 3)]
    alex_sd = {}
    lp_sd = {}
    for i, (j, ks) in enumerate(zip(conv_idx, kshapes)):
        alex_sd[f"features.{j}.weight"] = torch.from_numpy(
            rng.normal(size=ks).astype(np.float32))
        alex_sd[f"features.{j}.bias"] = torch.from_numpy(
            rng.normal(size=ks[0]).astype(np.float32))
        lp_sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.normal(size=(1, ks[0], 1, 1))).astype(np.float32))
    p = str(tmp_path / "lpips.pth")
    torch.save({"alexnet": alex_sd, "lpips": lp_sd}, p)
    params = load_lpips_weights(p)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3), minval=-1, maxval=1)
    d = float(lpips(params, x, -x)[0])
    assert np.isfinite(d) and d > 0
