"""2-D bias LUT: construction, host curve extraction, fused device gather.

The reference ships (but strips from the public snapshot) a precomputed
table `bias_lut_2d.npy` over an electron-domain grid
(reference BiasLUT.__init__, isp_algos.py:168-177):

    x_lut  = [linspace(0, 2^-4, 128, endpoint=False),
              exp(linspace(ln 2^-4, ln 2^10, 14*128+1))]     (1921 pts, e-)
    sg_lut = [linspace(0, 1, 200, endpoint=False),
              linspace(1, 10, 901)]                          (1101 pts, e-)

`build_bias_lut` regenerates it with the exact separable evaluator
(`yondx.vst.bias.bias_points`).

Runtime design (TPU-first — differs structurally from the reference's
per-pixel 2-D numpy bilinear, BiasLUT.get_lut isp_algos.py:196-231):
read noise sg is a *host scalar per denoise call*, so the 2-D bilinear
factorizes into (a) a host-side blend of two sg-rows -> a 1-D curve over the
x grid, extended past 2^10 e- with closed-form points, and (b) an on-device
fractional-index gather of that static-length curve, fused into the denoise
jit. The fractional index over the piecewise linear/log grid is *analytic*
(no searchsorted in the kernel). Out-of-range sg (>10 e-) falls back to
computing the whole curve host-side with the separable evaluator — same
code path on device either way, so one XLA compilation covers all cases.
"""
from __future__ import annotations

import math
import os

import numpy as np
import jax.numpy as jnp

from .bias import bias_points, close_form_bias

# --- grids (must match reference isp_algos.py:168-177 exactly) -------------
_SP = 128
X_LIN_STEP = 2.0 ** -4 / _SP                      # 2^-11
X_LUT = np.concatenate((
    np.linspace(0, 2 ** -4, _SP, endpoint=False),
    np.exp(np.linspace(np.log(2 ** -4), np.log(2 ** 10), 14 * _SP + 1)),
))                                                # 1921
SG_LUT = np.concatenate((
    np.linspace(0, 1, 200, endpoint=False),
    np.linspace(1, 10, 901),
))                                                # 1101

# Extension grid past 2^10 e- (ours): closed-form region, log-spaced.
_N_EXT = 256
X_EXT = np.exp(np.linspace(np.log(2 ** 10), np.log(2 ** 16), _N_EXT + 1))[1:]
FULL_X_GRID = np.concatenate((X_LUT, X_EXT))      # 2177

# Read-noise extension grid past the reference table's 10 e- (ours): the
# host path evaluates the exact separable integral out-of-range
# (isp_algos.py:204-212); the device path can't, so it blends rows of this
# auxiliary exact table instead (log-spaced; beyond its end the closed form
# is accurate). 64 columns x X_LUT rows, built once and cached on disk.
SG_EXT = np.exp(np.linspace(np.log(10.0), np.log(160.0), 65))
_LOG_SG_EXT_A = math.log(10.0)
_LOG_SG_EXT_D = (math.log(160.0) - _LOG_SG_EXT_A) / 64

_LOG_A = math.log(2 ** -4)
_LOG_D = (math.log(2 ** 10) - _LOG_A) / (14 * _SP)      # log-grid step
_EXT_A = math.log(2 ** 10)
_EXT_D = (math.log(2 ** 16) - _EXT_A) / _N_EXT


def build_bias_lut(path: str | None = None, block: int = 256) -> np.ndarray:
    """Regenerate the 2-D bias LUT [len(X_LUT), len(SG_LUT)] (float32).

    Reference semantics: table value = VST bias at (x e-, sg e-), gain 1
    (what get_bias_points isp_algos.py:142-160 computes, here via the exact
    separable evaluator). ~1921x1101 entries; a few seconds of numpy.
    """
    lut = np.empty((len(X_LUT), len(SG_LUT)), np.float64)
    for s in range(0, len(SG_LUT), block):
        sgs = SG_LUT[s:s + block]
        lut[:, s:s + block] = bias_points(X_LUT, sgs)
    lut = lut.astype(np.float32)
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.save(path, lut)
    return lut


def build_bias_lut_sgext(path: str | None = None) -> np.ndarray:
    """Exact bias table over (X_LUT, SG_EXT) for the device sg>10 path."""
    lut = bias_points(X_LUT, SG_EXT).astype(np.float32)
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.save(path, lut)
    return lut


def _sgext_path_for(lut_path: str | None) -> str | None:
    if lut_path:
        return os.path.join(os.path.dirname(lut_path) or ".",
                            "bias_lut_sgext.npy")
    return None


def load_sgext_lut(lut_path: str | None = None) -> np.ndarray:
    """Load (or build+cache) the sg-extension table next to the main LUT."""
    path = _sgext_path_for(lut_path or _default_lut_path())
    key = os.path.abspath(path) if path else "__sgext__"
    if key not in _LUT_CACHE:
        if path and os.path.exists(path):
            _LUT_CACHE[key] = np.load(path)
        else:
            _LUT_CACHE[key] = build_bias_lut_sgext(path)
    lut = _LUT_CACHE[key]
    assert lut.shape == (len(X_LUT), len(SG_EXT)), lut.shape
    return lut


def _default_lut_path() -> str | None:
    """Search order: $YONDX_BIAS_LUT, ./checkpoints/bias_lut_2d.npy, the
    repo checkout next to this package (same filename the reference uses,
    YOND_SIDD.py:171)."""
    cands = [os.environ.get("YONDX_BIAS_LUT"),
             os.path.join("checkpoints", "bias_lut_2d.npy"),
             os.path.join(os.path.dirname(__file__), "..", "..",
                          "checkpoints", "bias_lut_2d.npy")]
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


_LUT_CACHE: dict = {}


class BiasLUT:
    """Host-side holder of the 2-D table + curve extraction.

    `curve(K, sigma)` returns the per-call 1-D bias curve over FULL_X_GRID
    (electron domain) that the device gather consumes.
    """

    def __init__(self, lut_path: str | None = None, lut: np.ndarray | None = None):
        if lut is None:
            lut_path = lut_path or _default_lut_path()
            if lut_path and os.path.exists(lut_path):
                key = os.path.abspath(lut_path)
                if key not in _LUT_CACHE:
                    _LUT_CACHE[key] = np.load(lut_path)
                lut = _LUT_CACHE[key]
            elif "__built__" in _LUT_CACHE:
                lut = _LUT_CACHE["__built__"]
            else:
                lut = build_bias_lut(lut_path)
                _LUT_CACHE["__built__"] = lut
        assert lut.shape == (len(X_LUT), len(SG_LUT)), lut.shape
        self.lut = np.asarray(lut, np.float32)

    def curve(self, K: float, sigma: float) -> np.ndarray:
        """1-D bias curve over FULL_X_GRID for shot gain K, read sigma (DN).

        In-range sg: blend two sg rows (the 2-D bilinear's sg factor,
        reference pos_interp/data_merge isp_algos.py:179-194) + closed-form
        extension. Out-of-range sg (> 10 e-): exact separable evaluation of
        the whole curve (reference falls back to get_bias with
        close_form=True, isp_algos.py:204-212).
        """
        return bias_curve_for(K, sigma, self.lut)


def _sg_frac_index(sg: float) -> float:
    """Analytic fractional index of sg in SG_LUT (piecewise linear grid)."""
    if sg < 1.0:
        return sg / 0.005
    return 200.0 + (sg - 1.0) / 0.01


def bias_curve_for(K: float, sigma: float, lut: np.ndarray) -> np.ndarray:
    """Host: per-call 1-D curve over FULL_X_GRID (float32, len 2177)."""
    sg = float(sigma) / float(K)
    if sg <= SG_LUT[-1]:
        pos = min(max(_sg_frac_index(sg), 0.0), len(SG_LUT) - 1)
        lo = int(math.floor(pos))
        hi = min(lo + 1, len(SG_LUT) - 1)
        w = pos - lo
        base = lut[:, lo] * (1.0 - w) + lut[:, hi] * w
    else:
        base = bias_points(X_LUT, np.array([sg]))[:, 0].astype(np.float32)
    ext = close_form_bias(X_EXT, sigGs=sg, K=1.0).astype(np.float32)
    return np.concatenate((base.astype(np.float32), ext))


def frac_index_x(xe):
    """Device: analytic fractional index of electron value xe in FULL_X_GRID.

    Matches the reference's pos_interp local-linear-interp semantics
    (isp_algos.py:179-186): pos = i + (x - g[i]) / (g[i+1] - g[i]).
    Piecewise: linear segment [0, 2^-4), log segment to 2^10, log extension
    to 2^16; clamped to the table.
    """
    xe = jnp.maximum(xe, 0.0)
    # linear segment (also exact across the 127->128 junction)
    pos_lin = xe / X_LIN_STEP

    def log_pos(x, a, d, base_idx):
        j = jnp.floor((jnp.log(jnp.maximum(x, 1e-30)) - a) / d)
        g0 = jnp.exp(a + j * d)
        g1 = jnp.exp(a + (j + 1) * d)
        return base_idx + j + (x - g0) / (g1 - g0)

    pos_log = log_pos(xe, _LOG_A, _LOG_D, _SP)
    pos_ext = log_pos(xe, _EXT_A, _EXT_D, len(X_LUT) - 1)
    pos = jnp.where(xe < 2 ** -4, pos_lin,
                    jnp.where(xe <= 2 ** 10, pos_log, pos_ext))
    return jnp.clip(pos, 0.0, len(FULL_X_GRID) - 1)


def lookup_bias_curve(x_dn, curve, K):
    """Device: per-pixel bias via fractional gather of the per-call curve.

    x_dn: pixel values in DN (post-scale, >= 0); curve: [2177] from
    `bias_curve_for`; K: shot gain (traced scalar ok). Returns bias in VST
    units (same as the table's; gain-invariant in electron domain).

    NOTE: random gathers are slow on TPU (~18 ns/element measured on v5e);
    prefer `lookup_bias_curve_cheb` on the hot path — a gather-free
    Chebyshev evaluation of the same curve, ~100x faster at multi-MP sizes.
    """
    pos = frac_index_x(x_dn / K)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, curve.shape[0] - 1)
    w = pos - lo
    return curve[lo] * (1.0 - w) + curve[hi] * w


# --- gather-free Chebyshev path ---------------------------------------
# 65 nodes: max |cheb - linear-interp gather| ~2e-4 VST units over
# representative (K, sigma) — within the 1e-3 gate; error is dominated by
# the curve's grid-junction kinks, not order (257 only reaches ~4e-5), and
# Clenshaw cost on a 12.6 MP frame is linear in M (28 ms at 257 -> ~7 ms).
CHEB_M = 65           # nodes == series length

def _cheb_static(M: int = CHEB_M):
    """Static Chebyshev machinery in curve-index ('pos') space: node
    positions on [0, L-1] and the Gauss-Chebyshev DCT matrix mapping node
    samples -> series coefficients."""
    L = len(FULL_X_GRID)
    k = np.arange(M)
    s = np.cos(np.pi * (k + 0.5) / M)          # nodes in (-1, 1)
    pos_nodes = (s + 1.0) / 2.0 * (L - 1)
    j = np.arange(M)
    T = np.cos(np.outer(np.arccos(s), j))      # [M(node), M(order)]
    dct = (2.0 / M) * T.T                      # c = dct @ f(nodes)
    dct[0] *= 0.5
    # NUMPY on purpose: a jnp.asarray here would device_put at IMPORT
    # time, initializing the default backend before the caller can pick
    # one (jax.config.update('jax_platforms', ...) after `import yondx`
    # came too late) — measured hanging every CPU-forced script when the
    # TPU tunnel was down, and silently opening a second TPU client next
    # to a live trainer otherwise. jnp converts these tiny constants
    # inside the first traced call instead.
    return (pos_nodes.astype(np.float32), dct.astype(np.float32))

_CHEB_POS_NODES, _CHEB_DCT = _cheb_static()


def cheb_fit_curve(curve):
    """Per-call: sample the [2177] curve at the Chebyshev nodes (a tiny
    gather) and return the series coefficients [CHEB_M]."""
    pos = jnp.asarray(_CHEB_POS_NODES)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, curve.shape[0] - 1)
    w = pos - lo
    f = curve[lo] * (1.0 - w) + curve[hi] * w
    return jnp.asarray(_CHEB_DCT) @ f


def lookup_bias_curve_cheb(x_dn, coeffs, K):
    """Gather-free per-pixel bias: Clenshaw evaluation of the Chebyshev
    series (from `cheb_fit_curve`) at s = 2*pos/(L-1) - 1. Matches the
    linear-interp gather to ~1e-3 VST units (the curve is smooth in index
    space; tested in tests/test_vst.py)."""
    L = len(FULL_X_GRID)
    pos = frac_index_x(x_dn / K)
    s = pos * (2.0 / (L - 1)) - 1.0
    b1 = jnp.zeros_like(s)
    b2 = jnp.zeros_like(s)
    two_s = 2.0 * s
    for c in coeffs[:0:-1]:            # static unroll, highest order first
        b1, b2 = two_s * b1 - b2 + c, b1
    return s * b1 - b2 + coeffs[0]
