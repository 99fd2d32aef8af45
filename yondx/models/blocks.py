"""Shared building blocks for the model zoo (flax.linen, NHWC).

Parity notes vs the reference (archs/modules.py):
- `StridedDown` replicates the reference's `conv3x3` downsampler
  (modules.py:117-125) — note its ReLU is attached to the Conv2d as a
  child module and therefore never runs in torch; the effective op is a
  bare strided conv, which is what we implement.
- `GuidedResidualBlock` (modules.py:163-196) is FiLM conditioning on a
  per-sample scalar t: tk = MLP(t), tb = MLP(tk), z = z*tk + tb between the
  two 3x3 convs, SiLU activations, residual shortcut (1x1 conv when channel
  counts differ).
- `SNRBlock` (modules.py:198-233) multiplies (no shift) by two independent
  MLPs of t after each conv.
- `ResidualBlockLRelu` (modules.py:267-288): conv+relu, conv, LeakyReLU(0.2),
  then += shortcut.
- `ResBlockSiLU` (modules.py:235-265): shortcut first, SiLU-conv-SiLU-conv,
  += shortcut. (Its unused gamma/beta submodules are omitted.)
- `data_normalize` (modules.py:15-25): per-sample [0, max] normalization.

The scalar guidance t enters the reference as a [B,1,1,1] map through 1x1
convs; here it is a [B] vector through Dense layers — mathematically
identical, and XLA turns it into two tiny matmuls instead of 1x1 convs.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def data_normalize(x):
    """Per-sample max normalization (lower bound pinned at 0)."""
    ub = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    ub = jnp.maximum(ub, 1e-8)
    return x / ub, 0.0, ub


def data_inv_normalize(x, lb, ub):
    return x * (ub - lb) + lb


class GuideMLP(nn.Module):
    """t [B] -> per-channel (tk, tb) FiLM params.

    Mirrors modules.py:170-178: gamma = conv1x1(1,c) . SiLU . conv1x1(c,c)
    applied to the scalar map; beta = SiLU . conv1x1(c,c) applied to tk.
    """
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, t):
        t = t.reshape(-1, 1).astype(self.dtype or jnp.float32)
        h = nn.Dense(self.features, dtype=self.dtype, name="gamma_in")(t)
        tk = nn.Dense(self.features, dtype=self.dtype,
                      name="gamma_out")(nn.silu(h))
        tb = nn.Dense(self.features, dtype=self.dtype,
                      name="beta_out")(nn.silu(tk))
        return tk[:, None, None, :], tb[:, None, None, :]


def conv3x3(features, dtype=None, name=None):
    return nn.Conv(features, (3, 3), padding="SAME", dtype=dtype, name=name)


def conv1x1(features, dtype=None, name=None, use_bias=True):
    return nn.Conv(features, (1, 1), dtype=dtype, name=name,
                   use_bias=use_bias)


class StridedDown(nn.Module):
    """Stride-2 3x3 conv downsampler (reference conv3x3, modules.py:117)."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        # explicit (1,1) padding: XLA 'SAME' at stride 2 pads (0,1), which
        # shifts every window by one pixel vs torch's padding=1 convention.
        return nn.Conv(self.features, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv")(x)


class UpConvT(nn.Module):
    """2x2 stride-2 transpose conv (reference nn.ConvTranspose2d(.., 2, 2)).

    Perf note (v5e, measured): the equivalent matmul + depth-to-space
    rewrite wins in isolation (3.9 vs 4.9 ms at [768,1024,64]->32) but is
    a wash-to-slight-loss inside the full UNet graph (the d2s relayout
    defeats fusion), so the standard lowering stays.
    """
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                padding="VALID", dtype=self.dtype,
                                name="deconv")(x)


class ShortCut(nn.Module):
    """Identity, or 1x1 conv when the channel count changes."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == self.features:
            return x
        return conv1x1(self.features, self.dtype, name="conv")(x)


class GuidedResidualBlock(nn.Module):
    """FiLM residual block (reference modules.py:163-196)."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t):
        x = ShortCut(self.features, self.dtype, name="short_cut")(x)
        z = nn.silu(x)
        z = conv3x3(self.features, self.dtype, name="conv1")(z)
        tk, tb = GuideMLP(self.features, self.dtype, name="guide")(t)
        z = z * tk + tb
        z = nn.silu(z)
        z = conv3x3(self.features, self.dtype, name="conv2")(z)
        return z + x


class SNRBlock(nn.Module):
    """Two-scale multiplicative conditioning (reference modules.py:198-233)."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t):
        x = ShortCut(self.features, self.dtype, name="short_cut")(x)
        tt = t.reshape(-1, 1).astype(self.dtype or jnp.float32)

        def sfm(name):
            h = nn.Dense(self.features, dtype=self.dtype,
                         name=f"{name}_in")(tt)
            a = nn.Dense(self.features, dtype=self.dtype,
                         name=f"{name}_out")(nn.silu(h))
            return a[:, None, None, :]

        z = nn.silu(x)
        z = conv3x3(self.features, self.dtype, name="conv1")(z)
        z = z * sfm("sfm1")
        z = nn.silu(z)
        z = conv3x3(self.features, self.dtype, name="conv2")(z)
        z = z * sfm("sfm2")
        return z + x


class ResidualBlockLRelu(nn.Module):
    """(conv-relu-conv)-lrelu + shortcut (reference modules.py:267-288)."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        z = conv3x3(self.features, self.dtype, name="conv1")(x)
        z = nn.relu(z)
        z = conv3x3(self.features, self.dtype, name="conv2")(z)
        z = nn.leaky_relu(z, 0.2)
        return z + ShortCut(self.features, self.dtype, name="short_cut")(x)


class ResBlockSiLU(nn.Module):
    """shortcut -> silu-conv-silu-conv residual (reference modules.py:235)."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = ShortCut(self.features, self.dtype, name="short_cut")(x)
        z = nn.silu(x)
        z = conv3x3(self.features, self.dtype, name="conv1")(z)
        z = nn.silu(z)
        z = conv3x3(self.features, self.dtype, name="conv2")(z)
        return z + x


class ChannelAttention(nn.Module):
    """Squeeze-excite channel gate (reference modules.py:290-307): shared
    bias-free 1x1 MLP over both avg- and max-pooled descriptors, sigmoid."""
    ratio: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mlp_in = nn.Dense(max(c // self.ratio, 1), use_bias=False,
                          dtype=self.dtype, name="mlp_in")
        mlp_out = nn.Dense(c, use_bias=False, dtype=self.dtype,
                           name="mlp_out")
        avg = jnp.mean(x, axis=(-3, -2))
        mx = jnp.max(x, axis=(-3, -2))
        gate = mlp_out(nn.relu(mlp_in(avg))) + mlp_out(nn.relu(mlp_in(mx)))
        return nn.sigmoid(gate)[..., None, None, :]


class SpatialAttention(nn.Module):
    """Spatial gate (reference modules.py:309-326): conv over the
    channel-mean/max pair, sigmoid."""
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        h = jnp.concatenate([avg, mx], axis=-1)
        h = nn.Conv(1, (self.kernel_size, self.kernel_size), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv")(h)
        return nn.sigmoid(h)


class CBAM(nn.Module):
    """Convolutional block attention (reference modules.py:327-335):
    channel gate then spatial gate. Not used by any registry model (same
    as the reference); provided for inventory parity / custom archs."""
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = ChannelAttention(dtype=self.dtype, name="ca")(x) * x
        return SpatialAttention(dtype=self.dtype, name="sa")(x) * x


def mask_mul(x, mask, scale_factor: int = 1):
    """Masked feature gating (reference MaskMul, modules.py:337-346):
    channel-mean the mask if widths differ, avg-pool it down by
    scale_factor, multiply."""
    if mask.shape[-1] != x.shape[-1]:
        mask = jnp.mean(mask, axis=-1, keepdims=True)
    if scale_factor > 1:
        mask = nn.avg_pool(mask, (scale_factor, scale_factor),
                           strides=(scale_factor, scale_factor))
    return x * mask


class UpsampleBlock(nn.Module):
    """conv -> upsample -> relu (reference UpsampleBLock,
    modules.py:348-367): mode 'pixel_shuffle' (conv to c*r^2 then
    depth-to-space) or 'bilinear' (conv then bilinear resize)."""
    features: int
    up_scale: int = 2
    mode: str = "bilinear"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        r = self.up_scale
        if self.mode == "pixel_shuffle":
            c = x.shape[-1]
            h = conv3x3(c * r * r, self.dtype, name="conv")(x)
            B, H, W, _ = h.shape
            h = h.reshape(B, H, W, r, r, c)
            h = jnp.transpose(h, (0, 1, 3, 2, 4, 5)).reshape(
                B, H * r, W * r, c)
        elif self.mode == "bilinear":
            h = conv3x3(self.features, self.dtype, name="conv")(x)
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * r, W * r, C), method="bilinear")
        else:
            raise NotImplementedError(self.mode)
        return nn.relu(h)


class PReLU(nn.Module):
    """Per-channel PReLU with configurable init (torch nn.PReLU(c, init))."""
    init: float = 0.0

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda k, s: jnp.full(s, self.init,
                                                          jnp.float32),
                           (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha * x)
