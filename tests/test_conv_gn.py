"""Fused conv+GN kernel: interpret-mode equivalence, pair layout, affine fold.

The kernel replaces the Block hot path GroupNorm→Swish→Conv3×3 (reference
ddpm_modules/unet.py:64-75) with a one-write-one-read Pallas chain; these
tests pin its semantics against the jnp reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.experimental.conv_gn import (
    channel_stats,
    conv_gn_fused,
    conv_gn_reference,
    fold_gn_affine,
    pair_pack,
    pair_stats_fold,
    pair_unpack,
    pair_vec,
    pair_weights,
)


def _t(rng, *s):
    return jnp.asarray(rng.normal(size=s).astype(np.float32))


@pytest.mark.parametrize(
    "B,H,W,Cin,Cout,act,res,skip",
    [
        (2, 32, 16, 128, 128, True, False, False),
        (2, 32, 16, 128, 128, False, False, False),
        (1, 16, 8, 128, 128, True, True, False),    # identity residual
        (2, 8, 8, 128, 128, True, True, True),      # projected residual
        (1, 8, 8, 128, 128, False, False, False),   # T == 1
    ],
)
def test_kernel_matches_reference(B, H, W, Cin, Cout, act, res, skip):
    rng = np.random.default_rng(0)
    x = _t(rng, B, H, W, Cin)
    w = _t(rng, 3, 3, Cin, Cout) * 0.1
    b = _t(rng, Cout)
    sc = _t(rng, B, Cin) * 0.2 + 1 if act else None
    sh = _t(rng, B, Cin) * 0.1 if act else None
    Cres = Cin if skip else Cout
    r = _t(rng, B, H, W, Cres) if res else None
    ws = _t(rng, Cres, Cout) * 0.1 if skip else None

    y1, s1, q1 = conv_gn_reference(x, w, b, sc, sh, r, ws)
    y2, s2, q2 = conv_gn_fused(x, w, b, sc, sh, r, ws, interpret=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=3e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-4, atol=1e-2)


def test_unaligned_channels_fall_back():
    rng = np.random.default_rng(1)
    x = _t(rng, 1, 8, 8, 24)
    w = _t(rng, 3, 3, 24, 24) * 0.1
    b = _t(rng, 24)
    y1, s1, q1 = conv_gn_reference(x, w, b)
    y2, s2, q2 = conv_gn_fused(x, w, b)  # dispatch → reference (no pallas)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_pair_layout_exact():
    """Pair space-to-depth: pack → block-Toeplitz conv ≡ standard conv."""
    rng = np.random.default_rng(2)
    B, H, W, C = 2, 8, 16, 64
    x = _t(rng, B, H, W, C)
    w = _t(rng, 3, 3, C, C) * 0.1
    b = _t(rng, C)
    sc = _t(rng, B, C) * 0.2 + 1
    sh = _t(rng, B, C) * 0.1

    y_ref, s_ref, q_ref = conv_gn_reference(x, w, b, sc, sh)

    x2 = pair_pack(x)
    assert pair_unpack(x2).shape == x.shape
    np.testing.assert_array_equal(np.asarray(pair_unpack(x2)), np.asarray(x))

    y2, s2, q2 = conv_gn_reference(
        x2, pair_weights(w), pair_vec(b), pair_vec(sc), pair_vec(sh)
    )
    np.testing.assert_allclose(
        np.asarray(pair_unpack(y2)), np.asarray(y_ref), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(pair_stats_fold(s2)), np.asarray(s_ref), rtol=1e-4, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(pair_stats_fold(q2)), np.asarray(q_ref), rtol=1e-4, atol=1e-2
    )


def test_pair_layout_kernel():
    """Paired tensors drive the Pallas kernel (lane dim 128-aligned)."""
    rng = np.random.default_rng(3)
    B, H, W, C = 1, 16, 16, 64
    x = _t(rng, B, H, W, C)
    w = _t(rng, 3, 3, C, C) * 0.1
    b = _t(rng, C)
    y_ref, s_ref, _ = conv_gn_reference(x, w, b)
    y2, s2, _ = conv_gn_fused(
        pair_pack(x), pair_weights(w), pair_vec(b), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(pair_unpack(y2)), np.asarray(y_ref), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(pair_stats_fold(s2)), np.asarray(s_ref), rtol=1e-4, atol=1e-2
    )


def test_fold_gn_affine_equals_groupnorm():
    """x·scale+shift from carried stats ≡ GroupNorm(x)·γ+β (torch semantics)."""
    rng = np.random.default_rng(4)
    B, H, W, C, G = 2, 8, 8, 16, 4
    x = _t(rng, B, H, W, C)
    gamma = _t(rng, C) * 0.3 + 1
    beta = _t(rng, C) * 0.2

    sums, sumsqs = channel_stats(x)
    scale, shift = fold_gn_affine(sums, sumsqs, H * W, gamma, beta, G)
    got = x * scale[:, None, None, :] + shift[:, None, None, :]

    xf = np.asarray(x, np.float64).reshape(B, H, W, G, C // G)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    ref = ((xf - mean) / np.sqrt(var + 1e-5)).reshape(B, H, W, C)
    ref = ref * np.asarray(gamma) + np.asarray(beta)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_channel_shift_stat_absorption():
    """FiLM additive conditioning (h + t[B,C]) absorbs into carried stats:
    stats'(h+t) derived from stats(h) — the algebra the fused ResnetBlock
    uses to avoid re-reading h (reference sr3 unet.py:34-50 conditioning)."""
    rng = np.random.default_rng(5)
    B, H, W, C = 2, 4, 4, 8
    h = _t(rng, B, H, W, C)
    t = _t(rng, B, C)
    s, q = channel_stats(h)
    n = H * W
    s2 = s + n * t
    q2 = q + 2 * t * s + n * t * t
    s_ref, q_ref = channel_stats(h + t[:, None, None, :])
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s_ref), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q_ref), rtol=1e-4, atol=1e-3)
