"""VST bias: closed form, faithful numeric integration, and a fast exact
separable evaluator (host-side numpy; used to build the 2-D LUT).

The VST is only asymptotically unbiased: E[VST(Y)] != VST(E[Y]) at low flux.
YOND corrects this with a bias map b(lam; K, sigma) subtracted before
denoising (reference YOND_SIDD.py:252-262). Three evaluators:

1. `close_form_bias` — Foi TIP-13 Taylor series, valid at high flux
   (reference isp_algos.py:84-96).
2. `bias_points_numeric` — faithful re-implementation of the reference's
   Monte-Carlo-grid pipeline `getGsP` + numeric integration
   (isp_algos.py:49-82, :142-160); used for cross-validation tests.
3. `bias_points` — exact separable decomposition (ours):
       bias(lam, sg) = sum_k Pois(k; lam) * M(k, sg) - VST(lam)
   with M(k, sg) = E_g[VST(k + g)], g ~ N(0, sg^2), a 1-D Gaussian
   integral computed once per (k, sg). Evaluating a whole lam-grid is then
   a single pois-matrix @ M-matrix product — this is what makes
   regenerating the reference's (missing) 2-D LUT tractable.

All in electron units (gain 1); `vst`-domain identities make the electron
table gain-invariant: VST_K(x; sigma) == VST_1(x/K; sigma/K) * 1.
"""
from __future__ import annotations

import numpy as np
from scipy.stats import norm, poisson
from scipy.signal import convolve


def _vst_np(x, sigma, gain=1.0):
    fz = gain * np.asarray(x, np.float64) + (3 / 8) * gain ** 2 + sigma ** 2
    return (2.0 / gain) * np.sqrt(np.maximum(fz, 0.0))


def close_form_bias(lam, sigGs=25.853043, K=24.48128):
    """High-flux Taylor-series bias (reference isp_algos.py:84-96)."""
    y = np.asarray(lam, np.float64) / K
    sigma = sigGs / K
    y_hat = y + 3 / 8 + sigma ** 2
    m1 = (y + sigma ** 2) / y_hat ** 2
    m2 = y / y_hat ** 3
    m3 = (y + 3 * (y + sigma ** 2) ** 2) / y_hat ** 4
    return 2 * np.sqrt(y_hat) * (-m1 / 8 + m2 / 16 - 5 * m3 / 128)


def pg_pdf_grid(lam, K, sigGs, r=5, pho=1, clip=False):
    """Poisson(+)Gaussian density on a uniform grid (reference getGsP,
    isp_algos.py:49-82): Poisson pmf at grid points (0 off-integers)
    convolved with the Gaussian pdf, renormalized to sum/pho == 1."""
    l = 2 * pho * r + 1
    x = np.linspace(-r, r, l)
    ps = poisson.pmf(x, lam / K)
    if sigGs > 0:
        gs = norm.pdf(x, loc=0, scale=sigGs / K)
        pdf = convolve(ps, gs, mode="same")
    else:
        pdf = poisson.pmf(x, lam / K)
    pdf[pdf < 0] = 0
    if clip:
        pdf[r * pho] += pdf[: r * pho].sum()
        pdf[: r * pho] = 0
    pdf = pdf / (pdf.sum() / pho)
    return x, pdf


def bias_points_numeric(lams, K, sigGs, pho_min=100, close_form=False,
                        clip=False):
    """Faithful reference pipeline (isp_algos.py:142-160): per-lam grid
    convolution + Riemann sum. Slow; for tests and fallback."""
    lams = np.asarray(lams, np.float64)
    bias = np.zeros_like(lams)
    pho = max(int(K ** 0.5), pho_min)
    if close_form:
        th = 50 * K if K < 1 else 50 * K ** 0.5
        hi = lams > th
        bias[hi] = close_form_bias(lams[hi], sigGs, K)
    else:
        th = lams.max() + 1
    for i, lam in enumerate(lams):
        if lam > th:
            continue
        r = int(lam * (1 / K) * 2 + sigGs * 2 + lam + 10)
        x, p = pg_pdf_grid(lam, K, sigGs, r=r, pho=pho, clip=clip)
        bias[i] = np.sum(p * _vst_np(K * x, sigGs, gain=K) / pho) \
            - _vst_np(lam, sigGs, gain=K)
    return bias


def _m_table(k_max: int, sgs: np.ndarray, n_gauss: int = 4001,
             tail: float = 10.0) -> np.ndarray:
    """M[k, j] = E_g[VST_1(k + g; sg_j)], g ~ N(0, sg_j^2), electron units.

    Dense trapezoid over +-tail*sg; sg == 0 degenerates to VST_1(k).
    """
    ks = np.arange(k_max + 1, dtype=np.float64)
    M = np.empty((k_max + 1, len(sgs)), np.float64)
    for j, sg in enumerate(np.asarray(sgs, np.float64)):
        if sg <= 0:
            M[:, j] = _vst_np(ks, 0.0, 1.0)
            continue
        g = np.linspace(-tail * sg, tail * sg, n_gauss)
        w = norm.pdf(g, scale=sg)
        w /= w.sum()
        # arg = k + g + 3/8 + sg^2 under the sqrt (vst with sigma=sg, gain=1)
        vals = 2.0 * np.sqrt(np.maximum(ks[:, None] + g[None, :]
                                        + 3 / 8 + sg ** 2, 0.0))
        M[:, j] = vals @ w
    return M


def bias_points(lams: np.ndarray, sgs: np.ndarray,
                k_sigma: float = 12.0, k_pad: int = 32) -> np.ndarray:
    """Exact separable bias over a (lam x sg) grid, electron units (K=1).

    bias[i, j] = sum_k Pois(k; lam_i) M(k, sg_j) - VST_1(lam_i; sg_j).
    `k_max` covers lam + k_sigma*sqrt(lam) + k_pad so truncated Poisson
    mass is < 1e-12 on the grid.
    """
    lams = np.asarray(lams, np.float64)
    sgs = np.asarray(sgs, np.float64)
    k_max = int(np.max(lams) + k_sigma * np.sqrt(np.max(lams) + 1) + k_pad)
    M = _m_table(k_max, sgs)
    ks = np.arange(k_max + 1, dtype=np.float64)
    # Poisson matrix [n_lam, k_max+1] via log-pmf for stability
    P = poisson.pmf(ks[None, :], np.maximum(lams, 1e-300)[:, None])
    # lam == 0: delta at k=0
    zero = lams <= 0
    if zero.any():
        P[zero] = 0.0
        P[zero, 0] = 1.0
    Ez = P @ M  # [n_lam, n_sg]
    ref = _vst_np(lams[:, None], sgs[None, :], 1.0)
    return Ez - ref
