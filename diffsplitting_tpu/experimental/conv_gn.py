"""Fused [GroupNorm→Swish] → 3×3 conv → [+residual] → stats — Pallas TPU.

The UNet hot path is Block = GroupNorm→Swish→Conv3×3 (reference
ddpm_modules/unet.py:64-75) chained through ResnetBlocks. Round-1 device
traces showed 56% of sampler time in GroupNorm convert+reduce fusions — XLA
re-reads every conv output from HBM to compute GN statistics, then again to
normalize. This kernel makes the whole chain one-write-one-read per tensor:

  * prologue: the GN normalize + γ/β (+ any channelwise FiLM) is folded by
    the caller into per-(batch, channel) `scale`/`shift` vectors (tiny XLA
    math over the carried statistics, see `fold_gn_affine`) and applied with
    swish in VMEM as the conv reads its input — no normalized tensor ever
    hits HBM;
  * body: the 3×3 conv as 3 row-shifted (TILE_H·Wp, 3·Cin) @ (3·Cin, Cout)
    MXU matmuls accumulated in f32 (the 3 kw taps concat on lanes);
  * epilogue: bias, optional residual add (identity or 1×1-projected — the
    ResnetBlock skip, reference ddpm_modules/unet.py:94-96), and per-channel
    f32 Σy / Σy² over the spatial dims — the statistics the NEXT GroupNorm
    needs, emitted for free while the tile is still in VMEM.

Mosaic constrains HBM row slicing (and XLA may hand ANY-space inputs in
lane-padded layouts), so the kernel requires ALL channel dims ≡ 0 mod 128:
grid (B·T,), each step double-buffer-DMAs a fixed-size (TILE_H+2)-row halo
window (source start clamped into range, destination offset compensating;
out-of-range halo rows land on stale scratch and are zeroed by an
in-register validity mask — the conv's zero padding — so the input is never
materialized padded in HBM). Unaligned-channel levels (C = 64, 192 …) go
through the PAIR space-to-depth layout (`pair_pack`/`pair_weights`) which
doubles the lane dim and quadruples MXU fill; callers keep whole segments
packed. Anything else falls back to the XLA reference.

Inference-path kernel: training keeps the XLA path (dropout, autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ------------------------------------------------------------------ helpers
def pick_tile_h(H: int, W: int) -> int:
    """Rows per grid tile: target ≥ DSP_CONV_GN_ROWS (default 2048) MXU rows,
    divide H exactly. Bigger tiles amortize per-step DMA/mask/stats overhead;
    measured sweet spot on v5e is 2048 rows."""
    import os

    target = int(os.environ.get("DSP_CONV_GN_ROWS", 2048))
    t = max(8, min(H, target // max(W, 1)))
    while H % t:
        t -= 1
    return max(t, 1)


def fold_gn_affine(sums, sumsqs, count: int, gamma, beta, num_groups: int,
                   eps: float = 1e-5):
    """Per-(B,C) scale/shift implementing GroupNorm(x)·γ+β from carried stats.

    sums/sumsqs: (B, C) f32 spatial Σx / Σx²; count = elements per CHANNEL
    (H·W). Returns (scale, shift) such that
    x·scale + shift  ≡  (x-μ_g)·rsqrt(σ²_g+eps)·γ + β.
    """
    B, C = sums.shape
    G = num_groups
    cs = C // G
    n = count * cs
    mean_g = sums.reshape(B, G, cs).sum(-1) / n
    sq_g = sumsqs.reshape(B, G, cs).sum(-1) / n
    var_g = jnp.maximum(sq_g - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    inv_c = jnp.repeat(inv_g, cs, axis=-1)  # (B, C)
    mean_c = jnp.repeat(mean_g, cs, axis=-1)
    scale = inv_c * gamma[None, :].astype(jnp.float32)
    shift = beta[None, :].astype(jnp.float32) - mean_c * scale
    return scale, shift


# ------------------------------------------------------ pair (W/2,2C) layout
# At C=64 the MXU runs quarter-filled (K=N=64). Space-to-depth by 2 along W
# turns the 3×3 conv into 9 full (128,128) MXU taps with block-Toeplitz
# weights: 2× raw FLOPs, ~4× utilization (measured 2.7× net on v5e at
# 32×128²×64). Tensors stay packed across a whole fused segment; only entry/
# exit pay a relayout pass.
def pair_pack(x):
    """(B,H,W,C) → (B,H,W/2,2C); pair p holds [even-pixel chans | odd-pixel]."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // 2, 2 * C)


def pair_unpack(x):
    """(B,H,W/2,2C) → (B,H,W,C)."""
    B, H, W2, C2 = x.shape
    return x.reshape(B, H, W2 * 2, C2 // 2)


def pair_weights(w):
    """(3,3,Cin,Cout) HWIO → (3,3,2Cin,2Cout) block-Toeplitz for pair layout.

    y_pair[w'] = Σ_ptap x_pair[w'+ptap-1] @ W2[kh, ptap]; slot layout
    [even|odd] on both sides.  Derivation: y[2w']=Σ_d x[2w'+d]K[d],
    y[2w'+1]=Σ_d x[2w'+1+d]K[d] for d∈{-1,0,1} (K[d]=w[:, d+1]).
    """
    import numpy as np

    K = np.asarray(w, np.float32)
    _, _, Cin, Cout = K.shape
    w2 = np.zeros((3, 3, 2 * Cin, 2 * Cout), np.float32)
    for kh in range(3):
        w2[kh, 0, Cin:, :Cout] = K[kh, 0]          # x[2w'-1] → y[2w']   (d=-1)
        w2[kh, 1, :Cin, :Cout] = K[kh, 1]          # x[2w']   → y[2w']   (d=0)
        w2[kh, 1, Cin:, :Cout] = K[kh, 2]          # x[2w'+1] → y[2w']   (d=+1)
        w2[kh, 1, :Cin, Cout:] = K[kh, 0]          # x[2w']   → y[2w'+1] (d=-1)
        w2[kh, 1, Cin:, Cout:] = K[kh, 1]          # x[2w'+1] → y[2w'+1] (d=0)
        w2[kh, 2, :Cin, Cout:] = K[kh, 2]          # x[2w'+2] → y[2w'+1] (d=+1)
    return jnp.asarray(w2, jnp.asarray(w).dtype)


def pair_vec(v):
    """Duplicate a per-channel vector for the [even|odd] pair layout:
    (C,)→(2C,) or (B,C)→(B,2C)."""
    return jnp.concatenate([v, v], axis=-1)


def pair_stats_fold(sums2):
    """Kernel stats in pair layout (B,2C) → true per-channel (B,C)."""
    C = sums2.shape[-1] // 2
    return sums2[:, :C] + sums2[:, C:]


def channel_stats(x):
    """Standalone per-channel f32 stats (B,C): for tensors produced outside
    the fused path (stem via XLA, attention outputs, …)."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=(1, 2)), jnp.sum(xf * xf, axis=(1, 2))


# ------------------------------------------------------------ XLA reference
def conv_gn_reference(x, w, b, scale=None, shift=None, residual=None,
                      w_skip=None, out_dtype=None):
    """jnp reference with identical semantics to the kernel.

    x: (B,H,W,Cin). w: (3,3,Cin,Cout) HWIO. b: (Cout,).
    scale/shift: optional (B,Cin) f32 prologue affine; swish applied iff given.
    residual: optional (B,H,W,Cres); w_skip: optional (Cres,Cout) 1×1 kernel.
    Returns (y, sums, sumsqs): y in out_dtype (default x.dtype), stats f32
    computed from the f32 accumulator (pre-cast).
    """
    out_dtype = out_dtype or x.dtype
    if scale is not None:
        xa = x.astype(jnp.float32) * scale[:, None, None, :] + shift[:, None, None, :]
        xa = (xa * jax.nn.sigmoid(xa)).astype(x.dtype)
    else:
        xa = x
    y = jax.lax.conv_general_dilated(
        xa, w.astype(xa.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    if residual is not None:
        r = residual
        if w_skip is not None:
            r = jnp.einsum(
                "bhwc,cd->bhwd", r, w_skip.astype(r.dtype),
                preferred_element_type=jnp.float32,
            )
        y = y + r.astype(jnp.float32)
    sums = jnp.sum(y, axis=(1, 2))
    sumsqs = jnp.sum(y * y, axis=(1, 2))
    return y.astype(out_dtype), sums, sumsqs


# --------------------------------------------------------- shared tile body
def _window_conv(window, t_idx, sc, sh, w_ref, *, H, W, Cin, Cout, TILE_H, act):
    """One output tile: (TILE_H+2, W, Cin) halo window → (TILE_H, W, Cout) f32.

    Applies the prologue affine+swish (when act) and zeroes out-of-range halo
    rows via a validity mask, then runs the 9 conv taps on the MXU.

    Tap layout trick: the padded window is flattened to 2-D with the row
    stride padded to Wp = W+8 (a sublane multiple), so each (kh, kw) tap is a
    row slice of the flat buffer at offset kh·Wp+kw. The three kh offsets are
    sublane-ALIGNED (free slices); only the three kw shifts need a vector
    roll — 2 rolls total instead of 9 strided patch copies (the v1 profile
    was relayout-bound). The 8 pad columns produce garbage outputs that wrap
    into discarded positions and are sliced away before stats/bias.
    """
    Wp = W + 8
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_H + 2, 1, 1), 0)
    grow = t_idx * TILE_H - 1 + row_ids
    valid = (grow >= 0) & (grow < H)  # stale halo rows → conv zero padding
    if act:
        xa = window.astype(jnp.float32) * sc + sh
        xa = xa * jax.nn.sigmoid(xa)
        xa = jnp.where(valid, xa, 0.0).astype(window.dtype)
    else:
        xa = jnp.where(valid, window, jnp.zeros((), window.dtype))
    zl = jnp.zeros((TILE_H + 2, 1, Cin), xa.dtype)
    zr = jnp.zeros((TILE_H + 2, Wp - W - 1, Cin), xa.dtype)
    flat = jnp.concatenate([zl, xa, zr], axis=1).reshape((TILE_H + 2) * Wp, Cin)

    zrow = jnp.zeros((2, Cin), flat.dtype)
    # out[j] = flat[j+kw]: one unaligned sublane slice (relayout copy) per kw
    # shift — Mosaic has no bf16 sublane rotate; tail rows only ever feed
    # discarded pad-column outputs, zeros keep them harmless. The three shifts
    # concat on LANES so each kh row-slice is ONE K=3·Cin MXU dot (the w_ref
    # layout (3, 3Cin, Cout) is exactly w.reshape(3,3,Cin,Cout) kw-major).
    xcat = jnp.concatenate(
        [flat] + [jnp.concatenate([flat[kw:], zrow[:kw]], 0) for kw in (1, 2)],
        axis=-1,
    )  # ((TILE_H+2)·Wp, 3·Cin)
    acc = jnp.zeros((TILE_H * Wp, Cout), jnp.float32)
    for kh in range(3):
        patch = xcat[kh * Wp : kh * Wp + TILE_H * Wp]  # aligned, free
        acc = acc + jnp.dot(
            patch, w_ref[kh], preferred_element_type=jnp.float32
        )
    # drop the garbage pad columns
    return acc.reshape(TILE_H, Wp, Cout)[:, :W, :]


def _finish_tile(acc, b_ref, r2, wskip_ref, has_skip):
    """acc: (TILE_H, W, Cout) f32; r2: optional (TILE_H·W, Cres)."""
    TILE_H, W, Cout = acc.shape
    acc = acc + b_ref[0].astype(jnp.float32)
    if r2 is not None:
        if has_skip:
            proj = jnp.dot(r2, wskip_ref[:], preferred_element_type=jnp.float32)
            acc = acc + proj.reshape(TILE_H, W, Cout)
        else:
            acc = acc + r2.reshape(TILE_H, W, Cout).astype(jnp.float32)
    return acc


# -------------------------------------------------- variant A: row-tiled DMA
def _in_dma_rows(x_hbm, xt, sems, step, slot, *, H, TILE_H, T):
    """Fixed-size halo DMA: TILE_H+2 rows from clamp(row0, 0, H-(TILE_H+2)),
    destination offset compensating (scratch has TILE_H+4 rows; the logical
    window lives at rows [1, TILE_H+3))."""
    bb = jax.lax.div(step, T)
    if T == 1:
        return pltpu.make_async_copy(
            x_hbm.at[bb, :, :, :],
            xt.at[slot, pl.ds(2, H), :, :],
            sems.at[slot],
        )
    tt = jax.lax.rem(step, T)
    row0 = tt * TILE_H - 1
    start = jnp.clip(row0, 0, H - (TILE_H + 2))
    dst0 = 1 - (row0 - start)  # ∈ {0, 1, 2}
    return pltpu.make_async_copy(
        x_hbm.at[bb, pl.ds(start, TILE_H + 2), :, :],
        xt.at[slot, pl.ds(dst0, TILE_H + 2), :, :],
        sems.at[slot],
    )


def _res_dma_rows(r_hbm, rt, rsems, step, slot, *, TILE_H, T):
    bb = jax.lax.div(step, T)
    tt = jax.lax.rem(step, T)
    return pltpu.make_async_copy(
        r_hbm.at[bb, pl.ds(tt * TILE_H, TILE_H), :, :],
        rt.at[slot],
        rsems.at[slot],
    )


def _kernel_rows(
    x_hbm, scale_ref, shift_ref, w_ref, b_ref, r_hbm, wskip_ref,
    y_ref, stats_ref,
    xt, rt, sems, rsems,
    *, B, H, W, Cin, Cout, TILE_H, T, act, has_res, has_skip, out_dtype,
):
    i = pl.program_id(0)
    N = B * T
    in_dma = functools.partial(_in_dma_rows, x_hbm, xt, sems, H=H,
                               TILE_H=TILE_H, T=T)
    res_dma = functools.partial(_res_dma_rows, r_hbm, rt, rsems, TILE_H=TILE_H, T=T)

    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        in_dma(0, 0).start()
        if has_res:
            res_dma(0, 0).start()

    @pl.when(i + 1 < N)
    def _():
        in_dma(i + 1, nslot).start()
        if has_res:
            res_dma(i + 1, nslot).start()

    in_dma(i, slot).wait()
    if has_res:
        res_dma(i, slot).wait()

    b_idx = jax.lax.div(i, T)
    t_idx = jax.lax.rem(i, T)

    sc = scale_ref[b_idx, :][None, None, :] if act else None
    sh = shift_ref[b_idx, :][None, None, :] if act else None
    window = xt[slot, pl.ds(1, TILE_H + 2)]
    acc = _window_conv(window, t_idx, sc, sh, w_ref, H=H, W=W, Cin=Cin,
                       Cout=Cout, TILE_H=TILE_H, act=act)
    r2 = rt[slot].reshape(TILE_H * W, rt.shape[-1]) if has_res else None
    acc = _finish_tile(acc, b_ref, r2, wskip_ref, has_skip)

    # stats accumulate into a per-batch block revisited across the T tiles
    # (same block index for consecutive steps → stays resident in VMEM);
    # row 0 = Σy, row 1 = Σy² (rows 2-7 pad to the (8,128) block tile)
    @pl.when(t_idx == 0)
    def _():
        stats_ref[0] = jnp.zeros((8, Cout), jnp.float32)

    stats_ref[0, 0, :] += jnp.sum(acc, axis=(0, 1))
    stats_ref[0, 1, :] += jnp.sum(acc * acc, axis=(0, 1))
    y_ref[0] = acc.astype(out_dtype)


# ----------------------------------------------------------------- dispatch
def conv_gn_fused(
    x,
    w,
    b,
    scale=None,
    shift=None,
    residual=None,
    w_skip=None,
    out_dtype=None,
    interpret: bool = False,
):
    """Fused [affine+swish]→conv3×3→[+residual]→stats. Same contract as
    `conv_gn_reference`; returns (y, sums, sumsqs). Requires every channel
    dim ≡ 0 mod 128 (use the pair layout helpers for C=64/192 levels); falls
    back to the XLA reference otherwise."""
    B, H, W, Cin = x.shape
    assert w.shape[:3] == (3, 3, Cin), w.shape
    Cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    act = scale is not None
    has_res = residual is not None
    has_skip = w_skip is not None
    assert not (has_skip and not has_res), "w_skip requires residual"
    if has_res and not has_skip:
        assert residual.shape[-1] == Cout, (residual.shape, Cout)

    TILE_H = pick_tile_h(H, W)
    T = H // TILE_H
    Cres = residual.shape[-1] if has_res else 1

    aligned = (
        Cin % 128 == 0 and Cout % 128 == 0
        and (not has_res or Cres % 128 == 0)
        and W % 8 == 0 and H % 8 == 0
    )
    if not aligned:
        return conv_gn_reference(x, w, b, scale, shift, residual, w_skip,
                                 out_dtype)

    dtype = x.dtype
    wk = w.reshape(3, 3 * Cin, Cout).astype(dtype)  # kh-major, K=[kw0|kw1|kw2]
    if act:
        scale = scale.astype(jnp.float32)
        shift = shift.astype(jnp.float32)
    else:  # dummies (never read)
        scale = jnp.zeros((B, Cin), jnp.float32)
        shift = jnp.zeros((B, Cin), jnp.float32)
    if not has_res:
        residual = jnp.zeros((1, 1, 1, 1), dtype)  # dummy, never DMA'd
    residual = residual.astype(dtype)
    w_skip = w_skip.astype(dtype) if has_skip else jnp.zeros((1, 1), dtype)

    kern = functools.partial(
        _kernel_rows,
        B=B, H=H, W=W, Cin=Cin, Cout=Cout, TILE_H=TILE_H, T=T,
        act=act, has_res=has_res, has_skip=has_skip, out_dtype=out_dtype,
    )

    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    grid = (B * T,)
    y_spec = pl.BlockSpec(
        (1, TILE_H, W, Cout),
        lambda i, T=T: (jax.lax.div(i, T), jax.lax.rem(i, T), 0, 0),
        memory_space=pltpu.VMEM,
    )
    stats_spec = pl.BlockSpec(
        (1, 8, Cout), lambda i, T=T: (jax.lax.div(i, T), 0, 0),
        memory_space=pltpu.VMEM,
    )
    x_scratch = pltpu.VMEM((2, TILE_H + 4, W, Cin), dtype)
    r_scratch = (pltpu.VMEM((2, TILE_H, W, residual.shape[-1]), dtype)
                 if has_res else pltpu.VMEM((1, 8, 128), dtype))

    y, stats = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            const(B, Cin),                                 # scale
            const(B, Cin),                                 # shift
            const(3, 3 * Cin, Cout),                       # w
            const(1, Cout),                                # bias
            pl.BlockSpec(memory_space=pl.ANY),          # residual (HBM)
            const(*w_skip.shape),                          # w_skip
        ],
        out_specs=[y_spec, stats_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, Cout), out_dtype),
            jax.ShapeDtypeStruct((B, 8, Cout), jnp.float32),
        ],
        scratch_shapes=[
            x_scratch,
            r_scratch,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * Cin * Cout,
            bytes_accessed=(B * H * W * (Cin + Cout)) * x.dtype.itemsize,
            transcendentals=B * H * W * Cin if act else 0,
        ),
        interpret=interpret,
    )(x, scale, shift, wk, b.reshape(1, Cout), residual, w_skip)
    return y, stats[:, 0, :], stats[:, 1, :]
