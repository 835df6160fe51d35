"""Stat-carried fused UNet inference forward (TPU fast path).

Runs the SAME flax params as `models.unet.UNet` but executes the forward as a
chain of fused Pallas conv+GN blocks (experimental/conv_gn.py): every activation is
written to HBM once and read once; GroupNorm statistics ride along as (B, C)
per-channel Σ/Σ² emitted by each conv's epilogue, so no tensor is ever
re-read for normalization. Channelwise FiLM conditioning and the additive
DDPM time bias are absorbed algebraically into the carried stats and the next
conv's prologue affine (reference sr3_modules/unet.py:34-50 /
ddpm_modules/unet.py:78-96 semantics, verified numerically in tests).

Layouts: levels whose channel counts aren't 128-lane aligned (inner=64
SR3/DDPM level 0, and decoder concats like 192) run in the PAIR
space-to-depth layout — (B, H, W/2, 2C) with a per-lane (channel, parity)
map so channel-concat never physically permutes lanes; the block-Toeplitz
weight builder absorbs any lane permutation for free. Packed segments span
whole resolution levels; pack/unpack relayouts happen only at level
boundaries.

Fallbacks: convs that are neither lane-aligned nor worth pairing (boundary
convs at ≤64² with odd channel mixes), the stem, head, up/down-sampling
convs with unaligned channels, and attention internals run through XLA
(`conv_gn_reference` computes their stats in the same fusion).

Inference only (dropout ignored); training uses the standard flax path.
Topology parity: /root/reference/model/ddpm_modules/unet.py:147-243 and
sr3_modules/unet.py:161-259 — same assembler as models/unet.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffsplitting_tpu.experimental.conv_gn import (
    channel_stats,
    conv_gn_fused,
    conv_gn_reference,
    fold_gn_affine,
)
from diffsplitting_tpu.models.blocks import GN_EPS, swish
from diffsplitting_tpu.models.forward_utils import (
    _conv_xla,
    _dense,
    _positional_encoding,
    _time_embedding,
    apply_unet,
    fused_enabled,
)

# pair a conv only at large spatial dims — at ≤64² XLA's conv is close enough
# that the 2× raw-FLOP pair overhead loses (measured, BENCH_NOTES round 2)
_PAIR_MIN_W = 96


# --------------------------------------------------------------- stat tensor
@dataclasses.dataclass
class ST:
    """Activation + carried per-REAL-channel stats (+ pending channel affine).

    data: (B, H, W, C) unpaired, or (B, H, W/2, L) paired with lane l holding
    real channel chan[l] of the even (par[l]==0) / odd (par[l]==1) pixel.
    True tensor = data·cscale + cbias (per (B, C_real) pending FiLM, never
    materialized — absorbed into the next conv's prologue).
    sums/sumsqs are for the TRUE tensor over real channels, f32 (B, C_real).
    """

    data: jnp.ndarray
    sums: jnp.ndarray
    sumsqs: jnp.ndarray
    chan: Optional[np.ndarray] = None   # static lane→channel map (paired only)
    par: Optional[np.ndarray] = None
    cbias: Optional[jnp.ndarray] = None   # (B, C_real)
    cscale: Optional[jnp.ndarray] = None  # (B, C_real)

    @property
    def paired(self) -> bool:
        return self.chan is not None

    @property
    def channels(self) -> int:
        return int(self.sums.shape[-1])

    @property
    def hw(self) -> int:
        d = self.data
        return d.shape[1] * d.shape[2] * (2 if self.paired else 1)


def std_map(C: int):
    return np.concatenate([np.arange(C), np.arange(C)]), np.concatenate(
        [np.zeros(C, np.int64), np.ones(C, np.int64)]
    )


def st_from(data, sums=None, sumsqs=None) -> ST:
    if sums is None:
        sums, sumsqs = channel_stats(data)
    return ST(data, sums, sumsqs)


def materialize(st: ST) -> jnp.ndarray:
    """Unpaired data with pending affine applied (for XLA consumers)."""
    assert not st.paired
    d = st.data
    if st.cscale is not None:
        d = d * st.cscale[:, None, None, :].astype(d.dtype)
    if st.cbias is not None:
        d = d + st.cbias[:, None, None, :].astype(d.dtype)
    return d


def pack(st: ST) -> ST:
    """Unpaired → paired std layout. The reshape is a relayout copy on TPU
    (lane tiling changes); do it once per level segment."""
    assert not st.paired
    B, H, W, C = st.data.shape
    chan, par = std_map(C)
    return ST(st.data.reshape(B, H, W // 2, 2 * C), st.sums, st.sumsqs,
              chan, par, st.cbias, st.cscale)


def unpack(st: ST) -> ST:
    assert st.paired
    chan, par = std_map(st.channels)
    assert np.array_equal(chan, st.chan) and np.array_equal(par, st.par), (
        "unpack requires the standard lane order"
    )
    B, H, W2, L = st.data.shape
    return ST(st.data.reshape(B, H, W2 * 2, L // 2), st.sums, st.sumsqs,
              None, None, st.cbias, st.cscale)


def st_concat(a: ST, b: ST) -> ST:
    """Channel concat; paired tensors concat lanes and lane maps (no data
    permutation — the next conv's weight builder absorbs the order)."""
    assert a.paired == b.paired
    assert a.cbias is None and b.cbias is None and a.cscale is None and b.cscale is None
    Ca = a.channels
    data = jnp.concatenate([a.data, b.data], axis=-1)
    sums = jnp.concatenate([a.sums, b.sums], axis=-1)
    sumsqs = jnp.concatenate([a.sumsqs, b.sumsqs], axis=-1)
    if a.paired:
        chan = np.concatenate([a.chan, b.chan + Ca])
        par = np.concatenate([a.par, b.par])
        return ST(data, sums, sumsqs, chan, par)
    return ST(data, sums, sumsqs)


def st_add_channel_affine(st: ST, bias=None, scale=None) -> ST:
    """Pending per-(B,C) affine: true' = true·scale + bias. Stats updated
    exactly; data untouched (absorbed downstream).

    Composition with an existing pending (cs, cb): true = d·cs + cb, so
    true' = d·(cs·a) + (cb·a + b)."""
    n = st.hw
    s, q = st.sums, st.sumsqs
    cs, cb = st.cscale, st.cbias
    if scale is not None:
        q = scale * scale * q
        s = scale * s
        cs = scale if cs is None else cs * scale
        cb = None if cb is None else cb * scale
    if bias is not None:
        q = q + 2 * bias * s + n * bias * bias
        s = s + n * bias
        cb = bias if cb is None else cb + bias
    return ST(st.data, s, q, st.chan, st.par, cb, cs)


# ------------------------------------------------------- lane-mapped weights
def mapped_pair_weights(K, chan, par):
    """(3,3,Cin,Cout) conv kernel → (3,3,L,2Cout) block-Toeplitz weights for a
    paired input with lane map (chan, par) and STANDARD paired output.

    y[2w'+p_out] = Σ_d x[2w'+p_out+d]·K[d]; an input lane (c,p_in) of pair
    tap `ptap` is pixel 2(w'+ptap-1)+p_in ⇒ d = 2·ptap-2+p_in-p_out.
    """
    Cout = K.shape[-1]
    chan = np.asarray(chan)
    par = np.asarray(par)
    halves = []
    for pout in (0, 1):
        taps = []
        for ptap in range(3):
            d = 2 * ptap - 2 + par - pout
            valid = (d >= -1) & (d <= 1)
            kwi = np.clip(d + 1, 0, 2)
            blk = K[:, kwi, chan, :]  # (3, L, Cout) static gather
            taps.append(blk * valid[None, :, None].astype(K.dtype))
        halves.append(jnp.stack(taps, axis=1))  # (3, 3, L, Cout)
    return jnp.concatenate(halves, axis=-1)  # (3, 3, L, 2·Cout)


def mapped_pair_skip(Wsk, chan, par):
    """1×1 skip kernel (Cres,Cout) → (L, 2Cout) for a mapped paired residual
    and standard paired output (parity-preserving)."""
    base = Wsk[np.asarray(chan), :]  # (L, Cout)
    p = np.asarray(par)
    return jnp.concatenate(
        [base * (p == 0)[:, None].astype(base.dtype),
         base * (p == 1)[:, None].astype(base.dtype)],
        axis=-1,
    )


def lane_vec(v, st: ST):
    """(B, C_real) → per-lane (B, L) for st's layout."""
    if st.paired:
        return v[:, np.asarray(st.chan)]
    return v


# ------------------------------------------------------------- fused conv op
def gn_conv(st: ST, gn_scale, gn_bias, groups, K, bias, *, residual: Optional[ST],
            w_skip, act=True, interpret=False) -> ST:
    """[GN(st stats)→swish]→conv3×3→[+residual] with stats epilogue.

    Output is always in st's pairing (std lane order). `w_skip` projects the
    residual when channel counts differ. Pending FiLM on `st` is folded into
    the prologue affine; `residual` must have no pending affine.
    """
    dtype = st.data.dtype
    if act:
        scale_raw, shift = fold_gn_affine(st.sums, st.sumsqs, st.hw, gn_scale,
                                          gn_bias, groups, GN_EPS)
        # absorb pending affine: normalize(d·cs+cb) = d·(cs·s_raw)+(cb·s_raw+shift)
        scale = scale_raw if st.cscale is None else scale_raw * st.cscale
        if st.cbias is not None:
            shift = shift + st.cbias * scale_raw
    else:
        assert st.cbias is None and st.cscale is None
        scale = shift = None

    Cout = K.shape[-1]
    if st.paired:
        wk = mapped_pair_weights(K.astype(dtype), st.chan, st.par)
        b2 = jnp.concatenate([bias, bias])
        sc = lane_vec(scale, st) if act else None
        sh = lane_vec(shift, st) if act else None
        r = residual.data if residual is not None else None
        wsk = None
        if residual is not None and w_skip is not None:
            wsk = mapped_pair_skip(w_skip.astype(dtype), residual.chan,
                                   residual.par)
        elif residual is not None:
            # identity add needs matching std lane order
            assert residual.channels == Cout
            assert np.array_equal(residual.chan, std_map(Cout)[0])
        y, s2, q2 = conv_gn_fused(st.data, wk, b2, sc, sh, r, wsk,
                                  interpret=interpret)
        sums = s2[:, :Cout] + s2[:, Cout:]
        sumsqs = q2[:, :Cout] + q2[:, Cout:]
        chan, par = std_map(Cout)
        return ST(y, sums, sumsqs, chan, par)

    r = residual.data if residual is not None else None
    wsk = w_skip.astype(dtype) if w_skip is not None else None
    y, sums, sumsqs = conv_gn_fused(st.data, K.astype(dtype), bias, scale,
                                    shift, r, wsk, interpret=interpret)
    return ST(y, sums, sumsqs)


# ------------------------------------------------------------------ the walk




def _fuse_widths():
    """Optional whitelist of spatial widths to fuse (in-graph A/B tuning):
    DSP_FUSE_WIDTHS="128,16" → only those resolutions take the kernel."""
    import os

    lst = os.environ.get("DSP_FUSE_WIDTHS")
    if not lst:
        return None
    return {int(s) for s in lst.split(",")}


def _plan_conv(W, Cin, Cout, Cres=None) -> str:
    allowed = _fuse_widths()
    if allowed is not None and W not in allowed:
        return "xla"
    dims = [Cin, Cout] + ([Cres] if Cres is not None else [])
    if all(d % 128 == 0 for d in dims):
        return "std"
    if W >= _PAIR_MIN_W and all(d % 64 == 0 for d in dims):
        return "pair"
    return "xla"


def _xla_block(st: ST, bp, groups, dtype, Cout, residual: Optional[ST] = None,
               w_skip=None) -> ST:
    """GN→swish→conv through XLA (conv_gn_reference) for unaligned sites."""
    assert not st.paired
    scale_raw, shift = fold_gn_affine(st.sums, st.sumsqs, st.hw, bp["gn_scale"],
                                      bp["gn_bias"], groups, GN_EPS)
    scale = scale_raw if st.cscale is None else scale_raw * st.cscale
    if st.cbias is not None:
        shift = shift + st.cbias * scale_raw
    r = residual.data if residual is not None else None
    y, s, q = conv_gn_reference(
        st.data, bp["Conv_0"]["kernel"].astype(dtype), bp["Conv_0"]["bias"],
        scale, shift, r, w_skip.astype(dtype) if w_skip is not None else None,
    )
    return ST(y, s, q)





def fused_unet_apply(net, variables, x, time=None, *, interpret=False):
    """Inference forward for `models.unet.UNet` with fused conv+GN chaining.

    net: the UNet module instance (static config); variables: {'params': ...}
    as returned by net.init. Matches net.apply(...) numerically (bf16
    tolerance; GN statistics are computed in f32 both ways).
    """
    p = variables["params"]
    cfg = net
    compute_dtype = cfg.dtype or x.dtype
    x = x.astype(compute_dtype)

    # ---------------------------------------------------------- conditioning
    if cfg.cond_type == "time":
        t = _time_embedding(time, cfg.inner_channel)
    elif cfg.cond_type == "noise_level":
        t = _positional_encoding(time, cfg.inner_channel)
    elif cfg.cond_type == "none":
        t = None
    else:
        raise ValueError(cfg.cond_type)
    if t is not None:
        t = _dense(p["Dense_0"], t.astype(compute_dtype))
        t = swish(t)
        t = _dense(p["Dense_1"], t).astype(compute_dtype)

    groups = cfg.norm_groups
    rbwa = iter(range(10_000))
    down_i = iter(range(10_000))
    up_i = iter(range(10_000))

    def film_bias(rp, dim_out):
        """Per-(B,C) conditioning injected after block1 (scale, bias)."""
        if t is None:
            return None, None
        if cfg.cond_type == "time":
            emb = _dense(rp["Dense_0"], swish(t))
            return None, emb.astype(jnp.float32)
        emb = _dense(rp["FeatureWiseAffine_0"]["Dense_0"], t)
        if cfg.use_affine_level:
            gamma, beta = jnp.split(emb.astype(jnp.float32), 2, axis=-1)
            return 1.0 + gamma, beta
        return None, emb.astype(jnp.float32)

    def resnet_block(st: ST, rp, dim_out, W_real) -> ST:
        dim_in = st.channels
        plan1 = _plan_conv(W_real, dim_in, dim_out)
        plan2 = _plan_conv(W_real, dim_out, dim_out,
                           dim_in if dim_in != dim_out else None)
        w_skip = (rp["Conv_0"]["kernel"][0, 0] if dim_in != dim_out else None)

        # keep pairing consistent within the block
        want_pair = plan1 == "pair" or plan2 == "pair"
        if want_pair and not st.paired:
            st = pack(st)
        if not want_pair and st.paired:
            st = unpack(st)

        b1, b2 = rp["Block_0"], rp["Block_1"]
        if want_pair or plan1 == "std":
            h = gn_conv(st, b1["gn_scale"], b1["gn_bias"], groups,
                        b1["Conv_0"]["kernel"], b1["Conv_0"]["bias"],
                        residual=None, w_skip=None, interpret=interpret)
        else:
            h = _xla_block(st, b1, groups, compute_dtype, dim_out)

        fscale, fbias = film_bias(rp, dim_out)
        if fbias is not None or fscale is not None:
            h = st_add_channel_affine(h, fbias, fscale)

        if want_pair or plan2 == "std":
            res, wsk = st, w_skip
            if not st.paired and wsk is not None and dim_in % 128 != 0:
                # unaligned residual channels: project via XLA 1×1 and add
                # as an identity residual in the kernel
                proj = jnp.einsum(
                    "bhwc,cd->bhwd", st.data, wsk.astype(st.data.dtype)
                ).astype(st.data.dtype)
                res = ST(proj, h.sums, h.sumsqs)  # stats unused on residuals
                wsk = None
            out = gn_conv(h, b2["gn_scale"], b2["gn_bias"], groups,
                          b2["Conv_0"]["kernel"], b2["Conv_0"]["bias"],
                          residual=res, w_skip=wsk, interpret=interpret)
        else:
            out = _xla_block(h, b2, groups, compute_dtype, dim_out,
                             residual=st, w_skip=w_skip)
        return out

    def attention(st: ST, ap) -> ST:
        assert not st.paired
        B, H, W, C = st.data.shape
        from diffsplitting_tpu.ops import fused_attention

        scale, shift = fold_gn_affine(st.sums, st.sumsqs, st.hw,
                                      ap["GroupNorm_0"]["scale"],
                                      ap["GroupNorm_0"]["bias"], groups, GN_EPS)
        xd = materialize(st)
        h = (xd.astype(jnp.float32) * scale[:, None, None, :]
             + shift[:, None, None, :]).astype(compute_dtype)
        qkv = _conv_xla(ap["Conv_0"], h, dtype=compute_dtype)
        qkv = qkv.reshape(B, H * W, 1, 3, C)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        out = fused_attention(q, k, v, 1.0 / math.sqrt(C)).reshape(B, H, W, C)
        out = _conv_xla(ap["Conv_1"], out, dtype=compute_dtype) + xd
        return st_from(out)

    def rb_with_attn(st: ST, dim_out, with_attn, W_real) -> ST:
        rp = p[f"ResnetBlockWithAttn_{next(rbwa)}"]
        st = resnet_block(st, rp["ResnetBlock_0"], dim_out, W_real)
        if with_attn:
            if st.paired:
                st = unpack(st)
            st = attention(st, rp["SelfAttention_0"])
        return st

    num_mults = len(cfg.channel_mults)
    now_res = cfg.image_size

    # -------------------------------------------------------------- encoder
    stem = _conv_xla(p["Conv_0"], x, dtype=compute_dtype)
    h = st_from(stem)
    if _plan_conv(now_res, cfg.inner_channel, cfg.inner_channel) == "pair":
        h = pack(h)  # level 0 runs paired: pack once, skips stay packed
    feats = [h]
    for ind in range(num_mults):
        is_last = ind == num_mults - 1
        use_attn = now_res in cfg.attn_res
        cm = cfg.inner_channel * cfg.channel_mults[ind]
        for _ in range(cfg.res_blocks):
            h = rb_with_attn(h, cm, use_attn, now_res)
            feats.append(h)
        if not is_last:
            if h.paired:
                h = unpack(h)
            down = _conv_xla(p[f"Downsample_{next(down_i)}"]["Conv_0"],
                             materialize(h), strides=(2, 2),
                             dtype=compute_dtype)
            h = st_from(down)
            feats.append(h)
            now_res //= 2

    # ------------------------------------------------------------------ mid
    pre = h.channels
    h = rb_with_attn(h, pre, True, now_res)
    h = rb_with_attn(h, pre, False, now_res)

    # -------------------------------------------------------------- decoder
    for ind in reversed(range(num_mults)):
        is_last = ind < 1
        use_attn = now_res in cfg.attn_res
        cm = cfg.inner_channel * cfg.channel_mults[ind]
        for _ in range(cfg.res_blocks + 1):
            skip = feats.pop()
            if h.paired != skip.paired:
                skip = pack(skip) if h.paired else skip
                h = pack(h) if skip.paired and not h.paired else h
            h = rb_with_attn(st_concat(h, skip), cm, use_attn, now_res)
        if not is_last:
            if h.paired:
                h = unpack(h)
            up = materialize(h)
            up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)
            upp = p[f"Upsample_{next(up_i)}"]["Conv_0"]
            C = up.shape[-1]
            now_res *= 2
            if _plan_conv(now_res, C, C) == "std":
                y, s, q = conv_gn_fused(
                    up, upp["kernel"].astype(compute_dtype), upp["bias"],
                    interpret=interpret,
                )
                h = ST(y, s, q)
            else:
                h = st_from(_conv_xla(upp, up, dtype=compute_dtype))
    assert not feats

    # ----------------------------------------------------------------- head
    if h.paired:
        h = unpack(h)
    hb = p["Block_0"]
    scale, shift = fold_gn_affine(h.sums, h.sumsqs, h.hw, hb["gn_scale"],
                                  hb["gn_bias"], groups, GN_EPS)
    hd = materialize(h)
    hn = (hd.astype(jnp.float32) * scale[:, None, None, :]
          + shift[:, None, None, :])
    hn = (hn * jax.nn.sigmoid(hn)).astype(compute_dtype)
    out = _conv_xla(hb["Conv_0"], hn, dtype=compute_dtype)
    return out.astype(jnp.float32)
