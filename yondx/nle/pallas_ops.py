"""Pallas TPU kernel: fused NLE box statistics in one HBM pass.

The XLA path (yondx.nle.boxfilter) evaluates the SelfNLF statistics —
mean = blur_k(x), var = blur_k(x^2) - mean^2, texture =
stdfilt_k(blur_inner(x)) — as ~12 separable convolutions, i.e. ~24 HBM
round trips over the frame. This kernel computes all three maps from a
single read of the input: the frame stays in HBM; each grid step DMAs one
row band plus halo into VMEM (overlapping windows, hence manual
make_async_copy rather than BlockSpec tiling) and runs the unrolled
static-k separable box sums and the nested texture pipeline on the VPU.

Used via `fused_moments` (auto-fallback to the XLA path off-TPU; the
Pallas path is also runnable in interpret mode for CPU tests).
"""
from __future__ import annotations

import functools


import jax
import jax.numpy as jnp

from .boxfilter import box_mean, stdfilt


def _hbox_valid(x, k):
    """Horizontal valid box sum: [H, W] -> [H, W-k+1] (static k unroll)."""
    out_w = x.shape[1] - k + 1
    acc = x[:, 0:out_w]
    for d in range(1, k):
        acc = acc + x[:, d:d + out_w]
    return acc


def _vbox_valid(x, k):
    out_h = x.shape[0] - k + 1
    acc = x[0:out_h, :]
    for d in range(1, k):
        acc = acc + x[d:d + out_h, :]
    return acc


def _blur_valid(x, k):
    return _vbox_valid(_hbox_valid(x, k), k) * (1.0 / (k * k))


def _moments_kernel(k, inner, band, x_hbm, mean_ref, var_ref, tex_ref,
                    scratch, sem):
    """Grid step (c, i): DMA rows [i*band, i*band + band + 2P) of plane c
    from HBM, compute the three maps for the central `band` rows."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = k // 2 + inner // 2
    off = inner // 2
    c = pl.program_id(0)
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[c, pl.ds(i * band, band + 2 * P), :], scratch, sem)
    copy.start()
    copy.wait()
    x = scratch[:]                   # [band + 2P, WP + 2P]
    WP = mean_ref.shape[2]
    TH = band

    m = _blur_valid(x, k)            # [band + 2*off, WP + 2*off]
    m2 = _blur_valid(x * x, k)
    mc = m[off:off + TH, off:off + WP]
    m2c = m2[off:off + TH, off:off + WP]
    mean_ref[0] = mc
    var_ref[0] = jnp.maximum(m2c - mc * mc, 0.0)

    t1 = _blur_valid(x, inner)       # [band + k - 1, WP + k - 1]
    tm = _blur_valid(t1, k)          # [band, WP]
    tm2 = _blur_valid(t1 * t1, k)
    tex_ref[0] = jnp.sqrt(jnp.maximum(tm2 - tm * tm, 0.0))


def _pallas_moments_planes(x, k: int, inner: int, band: int = 128,
                           interpret: bool = False):
    """x: [C, H, W] fp32 planes -> (mean, var, tex) maps [C, H, W],
    reflect-101 borders. One pallas_call; grid = (C, row bands); the full
    padded array stays in HBM (ANY) and each step DMAs its halo'd band."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, H, W = x.shape
    P = k // 2 + inner // 2
    nb = -(-H // band)
    Hp = nb * band
    WP = -(-W // 128) * 128
    pad_h = (P, P + Hp - H)
    pad_w = (P, P + WP - W)
    xp = jnp.pad(x, ((0, 0), pad_h, pad_w), mode="reflect")

    kern = functools.partial(_moments_kernel, k, inner, band)
    mean, var, tex = pl.pallas_call(
        kern,
        grid=(C, nb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((1, band, WP), lambda c, i: (c, i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((C, Hp, WP), jnp.float32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((band + 2 * P, WP + 2 * P), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    return mean[:, :H, :W], var[:, :H, :W], tex[:, :H, :W]


def fused_moments(rggb, k: int = 29, interpret: bool | None = None,
                  band: int = 128):
    """(mean, var, texture) of an RGGB stack [..., h, w, 4] via the Pallas
    band kernel (TPU) or the XLA conv path elsewhere. Semantics identical
    to box_mean/stdfilt (reflect-101 borders; texture inner blur
    2*(k//3) + 1)."""
    inner = k // 3 * 2 + 1
    use_pallas = interpret is not None or jax.default_backend() == "tpu"
    if not use_pallas:
        mean = box_mean(rggb, k)
        std = stdfilt(rggb, k)
        tex = stdfilt(box_mean(rggb, inner), k)
        return mean, std * std, tex

    x = jnp.asarray(rggb, jnp.float32)
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    planes = jnp.moveaxis(x.reshape((-1, h, w, c)), -1, 1).reshape(-1, h, w)

    mean, var, tex = _pallas_moments_planes(
        planes, k=k, inner=inner, band=band, interpret=bool(interpret))

    def unpack(t):
        t = t.reshape((-1, c, h, w))
        return jnp.moveaxis(t, 1, -1).reshape(lead + (h, w, c))

    return unpack(mean), unpack(var), unpack(tex)
