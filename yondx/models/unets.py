"""Main UNet family (flax.linen, NHWC).

Rebuild of archs/Unet.py: `UNetSeeInDark` (:4), `ResUnet` (:106),
`ResUnet2` (:197), `SNRnet` (:288), `GuidedResUnet` (:380, the shipped
SNR-Net), `EstUnet` (:474). All operate on 4-channel packed RGGB
half-resolution planes; guided variants take a per-sample scalar t
(noise-to-signal ratio). `norm: True` divides the input by its per-sample
max and rescales t by 1/(ub-lb) (Unet.py:427-429).

Constructors take the YAML `arch:` dict (keys: nf, in_nc, out_nc, res,
norm, nframes, ...) exactly like the reference.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from .blocks import (
    data_normalize, data_inv_normalize, conv3x3, conv1x1,
    StridedDown, UpConvT, GuidedResidualBlock, SNRBlock,
    ResidualBlockLRelu, ResBlockSiLU,
)


def _arch(args: Dict[str, Any], key, default=None):
    return args.get(key, default) if args else default


class _GuidedUNetBase(nn.Module):
    """Shared encoder/decoder wiring of ResUnet/SNRnet/GuidedResUnet
    (archs/Unet.py:106-470): conv_in -> [block, stride-2 conv] x4 ->
    bottleneck block -> [2x2 deconv, skip concat, block] x4 -> 1x1 out,
    residual add and per-sample max norm options."""
    args: Dict[str, Any]
    block_cls: Any = GuidedResidualBlock
    guided: bool = True
    in_lrelu_slope: float = 0.01   # nn.LeakyReLU default in torch
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t=None):
        a = self.args
        nf = a["nf"]
        out_nc = a["out_nc"]
        res = a.get("res", False)
        norm = a.get("norm", False)
        lb = ub = None
        if norm:
            x, lb, ub = data_normalize(x)
            if t is not None:
                t = t / jnp.reshape(ub - lb, (-1,))
        inp = x

        def block(feat, name):
            return self.block_cls(feat, dtype=self.dtype, name=name)

        def call_block(b, z):
            return b(z, t) if self.guided else b(z)

        h = nn.leaky_relu(
            conv3x3(nf, self.dtype, name="conv_in")(x), self.in_lrelu_slope)

        skips = []
        feats = [nf, nf * 2, nf * 4, nf * 8]
        for i, f in enumerate(feats):
            h = call_block(block(f, f"conv{i+1}"), h)
            skips.append(h)
            h = StridedDown(feats[i + 1] if i + 1 < len(feats) else nf * 16,
                            self.dtype, name=f"pool{i+1}")(h)

        h = call_block(block(nf * 16, "conv5"), h)

        for i, f in enumerate([nf * 8, nf * 4, nf * 2, nf]):
            h = UpConvT(f, self.dtype, name=f"upv{6+i}")(h)
            h = jnp.concatenate([h, skips[-1 - i]], axis=-1)
            h = call_block(block(f, f"conv{6+i}"), h)

        out = conv1x1(out_nc, self.dtype, name="conv10")(h)
        if res:
            out = out + inp[..., :4]
        if norm:
            out = data_inv_normalize(out, lb, ub)
        return out


class GuidedResUnet(nn.Module):
    """The shipped SNR-Net (reference archs/Unet.py:380-470). 11.17M params
    at nf=32 (reference log: logs/log_YOND_SIDD_*_iter.log:4)."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t):
        return _GuidedUNetBase(self.args, GuidedResidualBlock, True,
                               dtype=self.dtype, name="unet")(x, t)


def _s2d2(x):
    """space_to_depth(2), NHWC: [B,H,W,C] -> [B,H/2,W/2,4C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def _d2s2(x):
    """depth_to_space(2), inverse of _s2d2."""
    B, H, W, C = x.shape
    x = x.reshape(B, H, W, 2, 2, C // 4)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * 2, W * 2, C // 4)


class GuidedResUnetS2D(nn.Module):
    """TPU-packed SNR-Net: space-to-depth(2) input so the MXU never sees a
    32-channel full-resolution conv.

    The reference GuidedResUnet (archs/Unet.py:380-470) spends most of its
    time in 32-ch convs at full RGGB resolution — the worst MXU geometry
    on a v5e (lane dim wants >=128 effective channels; round-2/3 roofline
    measurements in docs/STATUS.md). This variant packs the 4-ch input to
    16 ch at half resolution, runs a 3-down encoder starting at nf=64 (so
    the bottleneck sits at the same H/16 as the reference's 4-down nf=32
    net), and unpacks with depth-to-space at the end. Same parameter count
    (11.11M vs 11.17M at nf=64/32), same receptive field class, measured
    2.67x faster forward at bench-frame size (34.1 vs 91.3 ms random-bf16
    standalone; scripts/unet_roofline.py method).

    Weight compatibility: every encoder/decoder block from scale 2 down in
    the reference net has an exact shape twin here (conv2<->conv1,
    conv3<->conv2, conv4<->conv3, conv5<->conv4 bottleneck, dec 256/128/64
    <->same), so a trained GuidedResUnet checkpoint ports as a warm start
    (train/s2d_port.py).
    """
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t):
        a = self.args
        nf = a["nf"]          # top-scale features AFTER packing (e.g. 64)
        out_nc = a.get("out_nc", 4)
        res = a.get("res", False)
        norm = a.get("norm", False)
        lb = ub = None
        if norm:
            x, lb, ub = data_normalize(x)
            if t is not None:
                t = t / jnp.reshape(ub - lb, (-1,))
        inp = x
        h = _s2d2(x)          # [B,H/2,W/2,4*in_nc]

        def block(feat, name):
            return GuidedResidualBlock(feat, dtype=self.dtype, name=name)

        h = nn.leaky_relu(conv3x3(nf, self.dtype, name="conv_in")(h), 0.01)
        skips = []
        feats = [nf, nf * 2, nf * 4]
        for i, f in enumerate(feats):
            h = block(f, f"conv{i+1}")(h, t)
            skips.append(h)
            h = StridedDown(feats[i + 1] if i + 1 < len(feats) else nf * 8,
                            self.dtype, name=f"pool{i+1}")(h)
        h = block(nf * 8, "conv4")(h, t)
        for i, f in enumerate([nf * 4, nf * 2, nf]):
            h = UpConvT(f, self.dtype, name=f"upv{5+i}")(h)
            h = jnp.concatenate([h, skips[-1 - i]], axis=-1)
            h = block(f, f"conv{5+i}")(h, t)
        # conv_out: arch key 'out_k' (default 1) sets the kernel size. 3
        # widens the tail's full-res receptive field to 6x6 (vs 2x2 for a
        # 1x1 conv) — the packed net has no full-res skip path, so the
        # unpacking conv is its only chance to reconstruct sub-cell detail;
        # cost is negligible at R/2 (64->16 ch).
        out_k = a.get("out_k", 1)
        out = (conv3x3 if out_k == 3 else conv1x1)(
            4 * out_nc, self.dtype, name="conv_out")(h)
        out = _d2s2(out)      # [B,H,W,out_nc]
        if res:
            out = out + inp[..., :out_nc]
        # Optional full-resolution tail (arch key 'tail_nf', default 0 =
        # off): two 3x3 convs over [output, noisy input] with a ZERO-INIT
        # second kernel, so the tail is exactly identity at init and an
        # existing tail-less checkpoint ports by zero-injection
        # (train/s2d_port.py extend_with_tail). Motivation: the packed net
        # reconstructs each 2x2 phase from half-res features; phase
        # disagreement inside a cell shows up as grid-frequency error on
        # smooth content (scripts/probe_s2d_phase.py: grid_share ~0.6 of
        # the s2d MSE on ramps/bubbles). A full-res stage that sees all
        # phases post-unpacking is the cheapest mechanism that can cancel
        # it (~16 ch at full res — lane-poor but only 2 thin layers).
        tail_nf = a.get("tail_nf", 0)
        if tail_nf:
            tin = jnp.concatenate([out, inp[..., :out_nc]], axis=-1)
            th = nn.leaky_relu(
                conv3x3(tail_nf, self.dtype, name="tail_1")(tin), 0.01)
            out = out + nn.Conv(
                out_nc, (3, 3), padding="SAME", dtype=self.dtype,
                kernel_init=nn.initializers.zeros, name="tail_2")(th)
        if norm:
            out = data_inv_normalize(out, lb, ub)
        return out


class SNRnet(nn.Module):
    """SNR_Block-bodied variant (reference archs/Unet.py:288-378)."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t):
        return _GuidedUNetBase(self.args, SNRBlock, True,
                               dtype=self.dtype, name="unet")(x, t)


class ResUnet(nn.Module):
    """ResidualBlock-bodied UNet (reference archs/Unet.py:106-195);
    LeakyReLU(0.2) after conv_in."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t=None):
        return _GuidedUNetBase(self.args, ResidualBlockLRelu, False,
                               in_lrelu_slope=0.2, dtype=self.dtype,
                               name="unet")(x)


class ResUnet2(nn.Module):
    """ResBlock(SiLU)-bodied UNet (reference archs/Unet.py:197-286)."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t=None):
        return _GuidedUNetBase(self.args, ResBlockSiLU, False,
                               in_lrelu_slope=0.2, dtype=self.dtype,
                               name="unet")(x)


class UNetSeeInDark(nn.Module):
    """SID-style plain UNet (reference archs/Unet.py:4-104): double 3x3
    convs + LeakyReLU(0.2), 2x2 maxpool, transpose-conv up, skip concat."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t=None):
        a = self.args
        nf, out_nc = a["nf"], a["out_nc"]
        res = a.get("res", False)
        norm = a.get("norm", False)
        lb = ub = None
        if norm:
            x, lb, ub = data_normalize(x)
        inp = x

        def dconv(h, f, name):
            h = nn.leaky_relu(conv3x3(f, self.dtype, name=f"{name}_1")(h), 0.2)
            return nn.leaky_relu(conv3x3(f, self.dtype, name=f"{name}_2")(h),
                                 0.2)

        skips = []
        h = x
        for i, f in enumerate([nf, nf * 2, nf * 4, nf * 8]):
            h = dconv(h, f, f"conv{i+1}")
            skips.append(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))

        h = dconv(h, nf * 16, "conv5")

        for i, f in enumerate([nf * 8, nf * 4, nf * 2, nf]):
            h = UpConvT(f, self.dtype, name=f"upv{6+i}")(h)
            h = jnp.concatenate([h, skips[-1 - i]], axis=-1)
            h = dconv(h, f, f"conv{6+i}")

        out = conv1x1(out_nc, self.dtype, name="conv10_1")(h)
        if res:
            out = out + inp[..., :4]
        if norm:
            out = data_inv_normalize(out, lb, ub)
        return out


class EstUnet(nn.Module):
    """Shallow estimation UNet (reference archs/Unet.py:474-611): depth-d
    double-conv encoder (relu), add-merge decoder, 1x1 head; emits a std or
    var map, or its spatial mean when pge=True."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        a = dict(out_nc=4, in_nc=4, depth=3, nf=64, res=False,
                 use_type="std", pge=True)
        a.update(self.args or {})
        depth, nf = a["depth"], a["nf"]

        def dconv(h, f, name, pool):
            h = nn.relu(conv3x3(f, self.dtype, name=f"{name}_1")(h))
            h = nn.relu(conv3x3(f, self.dtype, name=f"{name}_2")(h))
            before = h
            if pool:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            return h, before

        skips = []
        h = x
        f = nf
        for i in range(depth):
            f = nf * (2 ** i)
            h, before = dconv(h, f, f"down{i}", pool=(i < depth - 1))
            skips.append(before)

        for i in range(depth - 1):
            f = f // 2
            h = UpConvT(f, self.dtype, name=f"up{i}_deconv")(h)
            h = h + skips[-(i + 2)]   # merge_mode='add'
            h = nn.relu(conv3x3(f, self.dtype, name=f"up{i}_1")(h))
            h = nn.relu(conv3x3(f, self.dtype, name=f"up{i}_2")(h))

        out = conv1x1(a["out_nc"], self.dtype, name="conv_final")(h)
        if a["use_type"] != "std":
            out = out ** 2
        if a["pge"]:
            out = jnp.mean(out, axis=(1, 2)).squeeze()
        return out
