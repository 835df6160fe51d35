"""Analytic FLOP count for the diffusion UNet (for MFU accounting).

Mirrors the assembly logic of models/unet.py exactly (stage loop, skip
concatenation, attention placement) and counts 2·K²·Cin·Cout·H·W per conv,
2·N²·C per attention matmul pair, 2·Cin·Cout per dense. XLA's
`cost_analysis()` under-reports through the remote-compile path, so MFU uses
this count instead.
"""

from __future__ import annotations

from typing import Sequence


def conv_flops(k, cin, cout, h, w):
    return 2 * k * k * cin * cout * h * w


def unet_forward_flops(
    image_size: int,
    in_channel: int,
    out_channel: int,
    inner_channel: int,
    channel_mults: Sequence[int],
    attn_res: Sequence[int],
    res_blocks: int,
    cond: bool = True,
    batch: int = 1,
) -> float:
    """FLOPs of one UNet forward at `image_size`², per `batch` images."""
    total = 0.0

    def resnet(cin, cout, r):
        f = conv_flops(3, cin, cout, r, r)  # block1
        f += conv_flops(3, cout, cout, r, r)  # block2
        if cin != cout:
            f += conv_flops(1, cin, cout, r, r)  # res conv
        if cond:
            f += 2 * inner_channel * cout  # time/noise dense
        return f

    def attention(c, r):
        n = r * r
        f = conv_flops(1, c, 3 * c, r, r)  # qkv
        f += 2 * 2 * n * n * c  # scores + weighted sum
        f += conv_flops(1, c, c, r, r)  # out proj
        return f

    num_mults = len(channel_mults)
    now_res = image_size
    pre = inner_channel
    feat_channels = [pre]

    total += conv_flops(3, in_channel, inner_channel, now_res, now_res)  # stem
    if cond:
        total += 2 * (inner_channel * inner_channel * 4) * 2  # time MLP (tiny)

    for ind in range(num_mults):
        is_last = ind == num_mults - 1
        use_attn = now_res in attn_res
        cout = inner_channel * channel_mults[ind]
        for _ in range(res_blocks):
            total += resnet(pre, cout, now_res)
            if use_attn:
                total += attention(cout, now_res)
            feat_channels.append(cout)
            pre = cout
        if not is_last:
            total += conv_flops(3, pre, pre, now_res // 2, now_res // 2)  # downsample
            feat_channels.append(pre)
            now_res //= 2

    # mid
    total += resnet(pre, pre, now_res) + attention(pre, now_res)
    total += resnet(pre, pre, now_res)

    # decoder
    for ind in reversed(range(num_mults)):
        is_last = ind < 1
        use_attn = now_res in attn_res
        cout = inner_channel * channel_mults[ind]
        for _ in range(res_blocks + 1):
            skip = feat_channels.pop()
            total += resnet(pre + skip, cout, now_res)
            if use_attn:
                total += attention(cout, now_res)
            pre = cout
        if not is_last:
            total += conv_flops(3, pre, pre, now_res * 2, now_res * 2)  # upsample conv
            now_res *= 2

    total += conv_flops(3, pre, out_channel, now_res, now_res)  # head
    return total * batch
