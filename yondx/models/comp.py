"""Comparison / self-supervised model zoo (flax.linen, NHWC).

Rebuild of archs/comp.py: `DnCNN` (:3), `est_UNet` (:128, PGE-Net noise
estimator), `FBI_Net` (:264, blind-spot network with masked convolutions),
`SelfSupUNet` (:650) / `SelfResUNet` (:745) (max-pool down, nearest-repeat
up), `GuidedSelfUnet` (:852, FiLM variant) and `N2NF_Unet` (:986).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .blocks import (
    data_normalize, data_inv_normalize, conv3x3, conv1x1, UpConvT,
    GuideMLP, ShortCut, PReLU,
)


class DnCNN(nn.Module):
    """Plain DnCNN (reference comp.py:3-33): conv+relu, (depth-2) x
    conv[+bn]+relu, conv; residual `x - out`, or pixel-shuffle raw->rgb when
    in_nc==4 and out_nc==3."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.args
        nf, depth = a["nf"], a["depth"]
        use_bn = a.get("use_bn", False)
        raw2rgb = a["in_nc"] == 4 and a["out_nc"] == 3
        h = nn.relu(conv3x3(nf, self.dtype, name="conv0")(x))
        for i in range(depth - 2):
            h = nn.Conv(nf, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv{i+1}")(h)
            if use_bn:
                h = nn.BatchNorm(use_running_average=not train,
                                 epsilon=1e-4, momentum=0.95,
                                 name=f"bn{i+1}")(h)
            h = nn.relu(h)
        out = nn.Conv(a["out_nc"], (3, 3), padding="SAME", use_bias=False,
                      dtype=self.dtype, name=f"conv{depth-1}")(h)
        if raw2rgb:
            # pixel_shuffle(2): [B,h,w,4c] -> [B,2h,2w,c]
            B, H, W, C = out.shape
            out = out.reshape(B, H, W, 2, 2, C // 4)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * 2, W * 2,
                                                          C // 4)
        elif a.get("res", False):
            out = x - out
        return out


class est_UNet(nn.Module):
    """PGE-Net noise estimator (reference comp.py:128-262): shallow add-merge
    UNet -> 1x1 head -> squared map -> spatial mean -> [K, sigma] scalars."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        a = self.args
        depth, nf = a["depth"], a["nf"]
        skips = []
        h = x
        f = nf
        for i in range(depth):
            f = nf * (2 ** i)
            h = nn.relu(conv3x3(f, self.dtype, name=f"down{i}_1")(h))
            h = nn.relu(conv3x3(f, self.dtype, name=f"down{i}_2")(h))
            skips.append(h)
            if i < depth - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        for i in range(depth - 1):
            f = f // 2
            h = UpConvT(f, self.dtype, name=f"up{i}_deconv")(h)
            h = h + skips[-(i + 2)]
            h = nn.relu(conv3x3(f, self.dtype, name=f"up{i}_1")(h))
            h = nn.relu(conv3x3(f, self.dtype, name=f"up{i}_2")(h))
        out = conv1x1(a["out_nc"], self.dtype, name="conv_final")(h)
        # use_type typo in the reference ('optimze_gat' vs 'optimize_gat',
        # comp.py:169,254) makes the squared branch unconditional.
        out = out ** 2
        return jnp.mean(out, axis=(1, 2)).squeeze()


class _MaskedConv(nn.Module):
    """Conv whose kernel is elementwise-masked every call (reference
    New1/New2/New3, comp.py:264-301 — blind-spot receptive fields)."""
    features: int
    mask: Any                      # [kh, kw] numpy array
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.mask.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel * jnp.asarray(self.mask)[:, :, None, None]
        pad = (kh // 2) * self.dilation
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            kernel.astype(self.dtype or kernel.dtype),
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


_MASK_NEW1 = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], np.float32)
_MASK_NEW2 = np.array([[0, 1, 0, 1, 0], [1, 0, 0, 0, 1], [0, 0, 1, 0, 0],
                       [1, 0, 0, 0, 1], [0, 1, 0, 1, 0]], np.float32)
_MASK_NEW3 = np.array([[1, 0, 1], [0, 1, 0], [1, 0, 1]], np.float32)


class _ResidualModule(nn.Module):
    """1x1 bottleneck residual with PReLU (reference comp.py:303-323)."""
    features: int
    mul: int = 1

    @nn.compact
    def __call__(self, x):
        h = conv1x1(self.features * self.mul, name="conv1")(x)
        h = PReLU(name="act1")(h)
        h = conv1x1(self.features, name="conv2")(h)
        out = (x + h) / 2.0
        return PReLU(name="act2")(out)


class FBI_Net(nn.Module):
    """Blind-spot network (reference FBI_Net, comp.py:392-630, case
    'FBI_Net'): New1(3x3 center-masked) -> New2(5x5 ring) ->
    (num_layers-2) x New3(dilated X), each followed by PReLU + residual
    module, accumulating the running sum of block outputs."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        a = self.args
        nf = a["nf"]
        n_layers = a.get("num_of_layers", 8)
        mul = a.get("mul", 1)
        out_nc = a.get("output_channel", a.get("out_nc", 1))
        res = a.get("res", False)

        # New1 layer
        h = _MaskedConv(nf, _MASK_NEW1, name="new1_conv")(x)
        h = PReLU(name="new1_act")(h)
        out_new = h
        h = _ResidualModule(nf, mul, name="new1_res")(h)
        out_sum = h
        # New2 layer
        z = _MaskedConv(nf, _MASK_NEW2, name="new2_conv")(out_new)
        z = PReLU(name="new2_act")(z)
        h = (z + h) / 2.0
        h = PReLU(name="new2_act2")(h)
        h = _ResidualModule(nf, mul, name="new2_res")(h)
        out_new = z
        out_sum = out_sum + h
        # New3 layers
        for i in range(n_layers - 2):
            z = _MaskedConv(nf, _MASK_NEW3, dilation=3,
                            name=f"new3_{i}_conv")(out_new)
            z = PReLU(name=f"new3_{i}_act")(z)
            h = (z + h) / 2.0
            h = PReLU(name=f"new3_{i}_act2")(h)
            h = _ResidualModule(nf, mul, name=f"new3_{i}_res")(h)
            out_new = z
            out_sum = out_sum + h

        final = PReLU(name="final_act")(out_sum / n_layers)
        final = _ResidualModule(nf, mul, name="final_res")(final)
        final = conv1x1(out_nc, name="output_layer")(final)
        if a.get("output_type") == "sigmoid":
            sv = a.get("sigmoid_value", 1.0)
            final = final.at[..., 0].set(sv * nn.sigmoid(final[..., 0]))
        if res:
            final = final[..., :1] * x + final[..., 1:]
        return final


def _nearest_up2(x):
    """Nearest-neighbour repeat upsampling (reference UP.up, comp.py:731)."""
    B, H, W, C = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.tile(x, (1, 1, 2, 1, 2, 1))
    return x.reshape(B, H * 2, W * 2, C)


class SelfSupUNet(nn.Module):
    """Noise2Noise-style UNet (reference comp.py:650-706): head(2 convs),
    depth x [maxpool, conv], then depth x [nearest-up, concat skip,
    2 convs], LeakyReLU(slope) everywhere, 1x1x3 tail."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        a = self.args
        nf = a.get("nf", 48)
        depth = a.get("depth", 5)
        slope = a.get("slope", 0.1)
        norm = a.get("norm", False)
        res = a.get("res", False)
        lb = ub = None
        if norm:
            x, lb, ub = data_normalize(x)

        def lr(h, f, name, k=3):
            conv = nn.Conv(f, (k, k), padding="SAME", dtype=self.dtype,
                           name=name)
            return nn.leaky_relu(conv(h), slope)

        blocks = [x]
        h = lr(lr(x, nf, "head1"), nf, "head2")
        for i in range(depth):
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            if i != depth - 1:
                blocks.append(h)
            h = lr(h, nf, f"down{i}")
        for i in range(depth):
            h = _nearest_up2(h)
            h = jnp.concatenate([h, blocks[-i - 1]], axis=-1)
            h = lr(h, nf * 2, f"up{i}_1")
            h = lr(h, nf * 2, f"up{i}_2")
        h = lr(h, 2 * nf, "last1", k=1)
        h = lr(h, 2 * nf, "last2", k=1)
        out = conv1x1(a["out_nc"], name="last_out")(h)
        if res:
            out = out + h
        if norm:
            out = data_inv_normalize(out, lb, ub)
        return out


class _ResPair(nn.Module):
    """shortcut + two leaky-relu convs residual (reference Res/RUP)."""
    features: int
    slope: float = 0.1
    ksize: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = ShortCut(self.features, self.dtype, name="short_cut")(x)
        k = self.ksize
        z = nn.leaky_relu(nn.Conv(self.features, (k, k), padding="SAME",
                                  dtype=self.dtype, name="conv1")(x),
                          self.slope)
        z = nn.leaky_relu(nn.Conv(self.features, (k, k), padding="SAME",
                                  dtype=self.dtype, name="conv2")(z),
                          self.slope)
        return z + x


class SelfResUNet(nn.Module):
    """Residual self-supervised UNet (reference comp.py:745-830)."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        a = self.args
        nf = a.get("nf", 32)
        depth = a.get("depth", 5)
        slope = a.get("slope", 0.1)
        norm = a.get("norm", False)
        res = a.get("res", False)
        lb = ub = None
        if norm:
            x, lb, ub = data_normalize(x)
        inp = x
        blocks = [x]
        h = _ResPair(nf, slope, name="head")(x)
        for i in range(depth):
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            if i != depth - 1:
                blocks.append(h)
            h = _ResPair(nf, slope, name=f"down{i}")(h)
        for i in range(depth):
            h = _nearest_up2(h)
            h = jnp.concatenate([h, blocks[-i - 1]], axis=-1)
            h = _ResPair(nf * 2, slope, name=f"up{i}")(h)
        h = _ResPair(nf * 2, slope, ksize=1, name="last")(h)
        out = conv1x1(a["out_nc"], name="out")(h)
        if res:
            out = out + inp
        if norm:
            out = data_inv_normalize(out, lb, ub)
        return out


class _GuidedLR(nn.Module):
    """Conv + FiLM + LeakyReLU (reference GLR, comp.py:909-930)."""
    features: int
    slope: float = 0.1
    ksize: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t):
        k = self.ksize
        z = nn.Conv(self.features, (k, k), padding="SAME", dtype=self.dtype,
                    name="conv")(x)
        tk, tb = GuideMLP(self.features, self.dtype, name="guide")(t)
        return nn.leaky_relu(z * tk + tb, self.slope)


class _GuidedResPair(nn.Module):
    """shortcut + LR conv + guided conv residual (reference GRes/GUP)."""
    features: int
    slope: float = 0.1
    ksize: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t):
        x = ShortCut(self.features, self.dtype, name="short_cut")(x)
        k = self.ksize
        z = nn.leaky_relu(nn.Conv(self.features, (k, k), padding="SAME",
                                  dtype=self.dtype, name="conv1")(x), 0.1)
        z = _GuidedLR(self.features, self.slope, k, self.dtype,
                      name="conv2")(z, t)
        return z + x


class GuidedSelfUnet(nn.Module):
    """FiLM variant of SelfSupUNet (reference comp.py:852-907)."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t):
        a = self.args
        nf = a.get("nf", 32)
        depth = a.get("depth", 5)
        slope = a.get("slope", 0.1)
        norm = a.get("norm", False)
        res = a.get("res", False)
        lb = ub = None
        if norm:
            x, lb, ub = data_normalize(x)
            t = t / jnp.reshape(ub - lb, (-1,))
        blocks = [x]
        h = _GuidedResPair(nf, slope, name="head")(x, t)
        for i in range(depth):
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            if i != depth - 1:
                blocks.append(h)
            h = _GuidedLR(nf, slope, name=f"down{i}")(h, t)
        for i in range(depth):
            h = _nearest_up2(h)
            h = jnp.concatenate([h, blocks[-i - 1]], axis=-1)
            h = _GuidedResPair(nf * 2, slope, name=f"up{i}")(h, t)
        h = _GuidedResPair(nf * 2, slope, ksize=1, name="last")(h, t)
        out = conv1x1(a["out_nc"], name="out")(h)
        if res:
            out = out + h
        if norm:
            out = data_inv_normalize(out, lb, ub)
        return out


class N2NF_Unet(nn.Module):
    """Noise2NoiseFlow-style UNet (reference comp.py:986-1082): 48-ch
    encoder with maxpools, 3x3 stride-2 transpose-conv decoder with skip
    concats, 96-ch blocks, LeakyReLU(0.1) tail."""
    args: Dict[str, Any]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        a = self.args
        norm = a.get("norm", False)
        lb = ub = None
        if norm:
            x, lb, ub = data_normalize(x)

        def conv(h, f, name):
            return nn.relu(conv3x3(f, self.dtype, name=name)(h))

        def up(h, f, name):
            # torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) == x2
            return nn.ConvTranspose(f, (3, 3), strides=(2, 2),
                                    padding="SAME", dtype=self.dtype,
                                    name=name)(h)

        p1 = nn.max_pool(conv(conv(x, 48, "b1_1"), 48, "b1_2"),
                         (2, 2), strides=(2, 2))
        p2 = nn.max_pool(conv(p1, 48, "b2"), (2, 2), strides=(2, 2))
        p3 = nn.max_pool(conv(p2, 48, "b3"), (2, 2), strides=(2, 2))
        p4 = nn.max_pool(conv(p3, 48, "b4"), (2, 2), strides=(2, 2))
        p5 = nn.max_pool(conv(p4, 48, "b5"), (2, 2), strides=(2, 2))

        h = up(conv(p5, 48, "b6"), 48, "up5")
        h = jnp.concatenate([h, p4], axis=-1)
        h = up(conv(conv(h, 96, "b7_1"), 96, "b7_2"), 96, "up4")
        h = jnp.concatenate([h, p3], axis=-1)
        h = up(conv(conv(h, 96, "b8_1"), 96, "b8_2"), 96, "up3")
        h = jnp.concatenate([h, p2], axis=-1)
        h = up(conv(conv(h, 96, "b9_1"), 96, "b9_2"), 96, "up2")
        h = jnp.concatenate([h, p1], axis=-1)
        h = up(conv(conv(h, 96, "b10_1"), 96, "b10_2"), 96, "up1")
        h = jnp.concatenate([h, x], axis=-1)
        h = conv(h, 64, "b11_1")
        h = conv(h, 32, "b11_2")
        out = nn.leaky_relu(conv3x3(a["out_nc"], self.dtype,
                                    name="b11_3")(h), 0.1)
        if norm:
            out = data_inv_normalize(out, lb, ub)
        return out
