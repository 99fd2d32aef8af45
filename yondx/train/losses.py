"""Losses (reference losses/base_loss.py, losses/__init__.py).

YOND training uses plain L1 (`Unet_Loss`, base_loss.py:81-113, with the
gradient/gamma terms disabled); the rest of the family is here for parity:
Charbonnier (:69), Sobel-gradient (:21-37), pyramid deep supervision
(:44-67), and the per-sample PSNR train metric (losses/__init__.py:3-14).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def charbonnier_loss(pred, target, eps: float = 1e-6):
    d = pred - target
    return jnp.mean(jnp.sqrt(d * d + eps))


def _sobel(x, direction: str):
    """[B, H, W, C] Sobel gradient."""
    if direction == "x":
        k = jnp.array([[1., 0., -1.], [2., 0., -2.], [1., 0., -1.]]) / 4
    else:
        k = jnp.array([[1., 2., 1.], [0., 0., 0.], [-1., -2., -1.]]) / 4
    B, H, W, C = x.shape
    y = x.transpose(0, 3, 1, 2).reshape(-1, 1, H, W)
    y = lax.conv_general_dilated(y, k[None, None], (1, 1), "SAME")
    return y.reshape(B, C, H, W).transpose(0, 2, 3, 1)


def gradient_loss(pred, target):
    gx = jnp.abs(_sobel(pred, "x") - _sobel(target, "x"))
    gy = jnp.abs(_sobel(pred, "y") - _sobel(target, "y"))
    return jnp.mean(gx + gy)


def _down2(x):
    return 0.25 * (x[:, 0::2, 0::2] + x[:, 1::2, 0::2]
                   + x[:, 0::2, 1::2] + x[:, 1::2, 1::2])


def pyramid_loss(pred, target, loss_fn=l1_loss, rate: float = 0.5,
                 max_scale: int = 8):
    """Deep-supervision across avg-pooled scales (base_loss.py:44-67)."""
    total, weight, lam = 0.0, 0.0, 1.0
    p, t = pred, target
    s = 1
    while s <= max_scale:
        total = total + loss_fn(p, t) * lam
        weight += lam
        lam *= rate
        if s < max_scale:
            p, t = _down2(p), _down2(t)
        s *= 2
    return total / weight


def unet_loss(pred, target, charbonnier: bool = False,
              pyramid: bool = False):
    """The default training loss (Unet_Loss.forward, base_loss.py:105-113)."""
    fn = charbonnier_loss if charbonnier else l1_loss
    if pyramid:
        return pyramid_loss(pred, target, loss_fn=fn)
    return fn(pred, target)


def unet_dpsv_loss(preds, target, charbonnier: bool = False):
    """Deep-supervision loss over a LIST of per-scale decoder outputs
    (reference Unet_dpsv_Loss, base_loss.py:115-126): preds[i] is the
    model head at scale 1/2^i (full-res first); targets are avg-pool-2
    pyramid levels of `target`; the per-scale losses are SUMMED
    (Pyramid_Loss rate=1, norm=False)."""
    fn = charbonnier_loss if charbonnier else l1_loss
    total, t = 0.0, target
    for i, p in enumerate(preds):
        if i > 0:
            t = _down2(t)
        total = total + fn(p, t)
    return total


def unet_dpsv_loss_up(preds, target, charbonnier: bool = False):
    """Variant with TWO full-resolution heads before the pyramid tail
    (reference Unet_dpsv_Loss_up, base_loss.py:128-139): targets are
    [target, target, target/2, ...]."""
    fn = charbonnier_loss if charbonnier else l1_loss
    total, t = 0.0, target
    for i, p in enumerate(preds):
        if i > 1:
            t = _down2(t)
        total = total + fn(p, t)
    return total


def gan_loss(real_logits, fake_logits, kind: str = "RaSGAN",
             for_discriminator: bool = True):
    """Relativistic GAN loss family (reference GAN_Loss,
    base_loss.py:141-188; unused by YOND training but part of the loss
    surface): SGAN, RSGAN, RaSGAN, RaLSGAN."""

    eps = 1e-12

    def bce_with_logits(logits, target):
        return jnp.mean(jnp.maximum(logits, 0) - logits * target
                        + jnp.log1p(jnp.exp(-jnp.abs(logits))))

    if kind == "SGAN":
        if for_discriminator:
            return bce_with_logits(real_logits, 1.0) + \
                bce_with_logits(fake_logits, 0.0)
        return bce_with_logits(fake_logits, 1.0)
    if kind == "RSGAN":
        d = real_logits - fake_logits if for_discriminator else \
            fake_logits - real_logits
        return bce_with_logits(d, 1.0)
    ra_r = real_logits - jnp.mean(fake_logits)
    ra_f = fake_logits - jnp.mean(real_logits)
    if kind == "RaSGAN":
        if for_discriminator:
            return (bce_with_logits(ra_r, 1.0)
                    + bce_with_logits(ra_f, 0.0)) / 2
        return (bce_with_logits(ra_r, 0.0)
                + bce_with_logits(ra_f, 1.0)) / 2
    if kind == "RaLSGAN":
        if for_discriminator:
            return (jnp.mean((ra_r - 1.0) ** 2)
                    + jnp.mean((ra_f + 1.0) ** 2)) / 2
        return (jnp.mean((ra_r + 1.0) ** 2)
                + jnp.mean((ra_f - 1.0) ** 2)) / 2
    raise ValueError(kind)


def psnr_loss(pred, target):
    """Per-sample-mean PSNR in dB (losses/__init__.py:3-14); inputs in
    [0,1]."""
    if pred.ndim <= 3:
        mse = jnp.mean((pred - target) ** 2)
        return -10.0 * jnp.log(jnp.maximum(mse, 1e-20)) / jnp.log(10.0)
    axes = tuple(range(1, pred.ndim))
    mse = jnp.mean((pred - target) ** 2, axis=axes)
    return jnp.mean(-10.0 * jnp.log(jnp.maximum(mse, 1e-20)) / jnp.log(10.0))
