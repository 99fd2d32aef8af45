"""Image quality metrics (pure jnp; batchable, jit-safe).

- `psnr`: skimage-compatible peak SNR (reference uses compare_psnr at
  data_range=1 for raw crops, YOND_SIDD.py:651).
- `matlab_ssim`: the MATLAB-equivalent SSIM the reference carries inline
  (YOND_SIDD.py:679-721): 11x11 Gaussian window sigma 1.5, 5-px valid crop,
  C1=(0.01*255)^2, C2=(0.03*255)^2, inputs scaled to [0,255].
- `cal_kld`: forward KL between pixel-error histograms (reference
  sidd_utils.py:290-304).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax


def psnr(pred, target, data_range: float = 1.0):
    """Mean PSNR; pred/target [..., H, W] (averaged over leading dims
    together, like compare_psnr on a full array)."""
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-20))


def _gaussian_kernel_11():
    """cv2.getGaussianKernel(11, 1.5) equivalent."""
    x = np.arange(11) - 5
    k = np.exp(-(x ** 2) / (2 * 1.5 ** 2))
    k = k / k.sum()
    return (k[:, None] * k[None, :]).astype(np.float32)


_WIN = _gaussian_kernel_11()


def _filt_valid(img, win):
    """Valid 2-D correlation of [..., H, W] with an 11x11 window."""
    lead = img.shape[:-2]
    H, W = img.shape[-2:]
    x = img.reshape((-1, 1, H, W))
    k = jnp.asarray(win)[None, None]
    y = lax.conv_general_dilated(x, k, (1, 1), "VALID",
                                 precision=lax.Precision.HIGHEST)
    return y.reshape(lead + (H - 10, W - 10))


def _ssim_single(img1, img2):
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    win = jnp.asarray(_WIN)
    mu1 = _filt_valid(img1, win)
    mu2 = _filt_valid(img2, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filt_valid(img1 * img1, win) - mu1_sq
    s2 = _filt_valid(img2 * img2, win) - mu2_sq
    s12 = _filt_valid(img1 * img2, win) - mu1_mu2
    num = (2 * mu1_mu2 + C1) * (2 * s12 + C2)
    den = (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    return jnp.mean(num / den, axis=(-2, -1))


def matlab_ssim(pred, target):
    """MATLAB-equivalent SSIM on [0,255]-scaled arrays.

    pred/target: [H, W] (gray), [H, W, 3] (mean over channels), or batched
    [..., H, W]. Returns scalar mean over everything but the last two dims
    averaged per-image then over the batch — matching the reference's
    per-crop calculate_ssim averaged externally.
    """
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if pred.ndim >= 3 and pred.shape[-1] == 3:
        vals = jnp.stack([_ssim_single(pred[..., c], target[..., c])
                          for c in range(3)], axis=-1)
        return jnp.mean(vals)
    return jnp.mean(_ssim_single(pred, target))


def quality_assess(pred, target, data_range: float = 255.0):
    """PSNR+SSIM dict (reference utils/visualization.py:26-33 shape)."""
    return {
        "PSNR": float(psnr(pred, target, data_range=data_range)),
        "SSIM": float(matlab_ssim(
            jnp.asarray(pred) * (255.0 / data_range),
            jnp.asarray(target) * (255.0 / data_range))),
    }


def cal_kld(p_data, q_data):
    """Forward KL between error histograms (reference sidd_utils.py:290)."""
    bw = 0.2 / 64
    edges = np.concatenate(([-1000.0], np.arange(-0.1, 0.1 + 1e-9, bw),
                            [1000.0]))
    p, _ = np.histogram(np.asarray(p_data), edges)
    q, _ = np.histogram(np.asarray(q_data), edges)
    p = p / max(p.sum(), 1)
    q = q / max(q.sum(), 1)
    idx = (p > 0) & (q > 0)
    p, q = p[idx], q[idx]
    return float(np.sum(p * (np.log(p) - np.log(q))))
