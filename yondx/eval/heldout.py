"""Frozen held-out quality gate: generator-disjoint scenes, fixed seeds.

Round-2's quality numbers were all measurable-by-the-builder: the bench
frame is a kron block mosaic and the v3/v4 training generators added
exactly that class, so per-round PSNR gains partly measured benchmark
contamination (VERDICT r2, Missing #2). This module is the counterpart of
the reference's fixed external validation contract (YOND_SIDD.py:485-570):
a FROZEN suite whose content constructions are disjoint from the training
generator (yondx/data/datasets.py SyntheticSRGBDataset) by design.

Training generator produces: kron axis-aligned block-mosaic charts,
multi-octave bilinear smooth fields, axis-aligned flat/saturated
rectangles, diagonal sinusoid band textures, hard linear edges.

Held-out constructions (none of the above):
- voronoi     Voronoi-cell flat mosaic: irregular polygon flats, edges at
              every orientation (flat-region denoising + NLE probe).
- radial      concentric rings + radial gradient (circular structure).
- ramp        smooth linear ramps with gentle posterization steps
              (banding / do-no-harm probe at low noise).
- zoneplate   sin(r^2) chirp: all spatial frequencies and orientations.
- glyphs      grids of thin-stroke glyph-like marks (1-3 px strokes,
              text-on-background).
- bubbles     soft-falloff ellipses (smooth non-axis-aligned blobs).
- satdisk     large saturated DISKS (up to 400 px) on near-black ground:
              the saturated-flat-region probe of the round-2 ~26 dB
              ceiling, but circular so the kron-chart training class
              cannot memorize it.
- chart       kron block chart, 256-px blocks (NOT disjoint — the round-2
              bench/ceiling anchor; reported separately, excluded from
              the held-out mean).

The scene list, seeds, and (K, sigma) draws below are FROZEN: editing them
invalidates cross-round comparisons. Do-no-harm gate: the blind pipeline
must never score below its noisy input on any held-out scene.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.logging import log
from ..isp import rggb2bayer
from .metrics import psnr, matlab_ssim

S = 512          # sRGB scene size -> 512x512 bayer crops
WP, BL = 1023, 64


# --------------------------------------------------------------------------
# content generators (sRGB [S, S, 3] float32 in [0, 1])
# --------------------------------------------------------------------------

def _voronoi(rng: np.random.Generator, S: int = S) -> np.ndarray:
    npts = int(rng.integers(8, 20))
    pts = rng.random((npts, 2)) * S
    cols = rng.random((npts, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    d = (yy[..., None] - pts[:, 0]) ** 2 + (xx[..., None] - pts[:, 1]) ** 2
    lab = np.argmin(d, axis=-1)
    img = cols[lab]
    return np.clip(img * (0.35 + 0.6 * rng.random()), 0.0, 1.0)


def _radial(rng: np.random.Generator, S: int = S) -> np.ndarray:
    cy, cx = rng.random(2) * S
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    base = 0.5 + 0.4 * np.cos(r / (20 + 60 * rng.random()))
    grad = np.clip(1.0 - r / (S * (0.7 + 0.6 * rng.random())), 0.0, 1.0)
    img = np.stack([base * grad * (0.5 + 0.5 * rng.random())
                    for _ in range(3)], -1)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def _ramp(rng: np.random.Generator, S: int = S) -> np.ndarray:
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
    ang = rng.random() * 2 * np.pi
    t = np.cos(ang) * xx + np.sin(ang) * yy          # linear ramp
    nlev = int(rng.integers(6, 16))
    stepped = np.floor(t * nlev) / nlev              # gentle posterization
    mix = 0.5 + 0.5 * rng.random()
    base = mix * t + (1 - mix) * stepped
    gains = 0.3 + 0.7 * rng.random(3)
    img = base[..., None] * gains[None, None]
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def _zoneplate(rng: np.random.Generator, S: int = S) -> np.ndarray:
    cy, cx = (0.3 + 0.4 * rng.random(2)) * S
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    r2 = (yy - cy) ** 2 + (xx - cx) ** 2
    kmax = 0.05 + 0.1 * rng.random()
    z = 0.5 + 0.35 * np.cos(kmax * r2 / S)
    img = np.stack([z * (0.6 + 0.4 * rng.random()) for _ in range(3)], -1)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def _glyphs(rng: np.random.Generator, S: int = S) -> np.ndarray:
    bg = rng.random(3) * 0.7 + 0.15
    fg = np.clip(bg + (0.5 if bg.mean() < 0.5 else -0.5), 0.0, 1.0)
    img = np.ones((S, S, 3), np.float32) * bg
    cell = int(rng.integers(18, 34))
    for gy in range(4, S - cell, cell):
        for gx in range(4, S - cell, cell):
            if rng.random() < 0.25:
                continue
            # a glyph = 2-4 thin strokes inside the cell
            for _ in range(int(rng.integers(2, 5))):
                w = int(rng.integers(1, 4))
                if rng.random() < 0.5:                    # vertical stroke
                    x0 = gx + int(rng.integers(0, cell - w))
                    y0 = gy + int(rng.integers(0, cell // 2))
                    h = int(rng.integers(cell // 3, cell - 2))
                    img[y0:y0 + h, x0:x0 + w] = fg
                else:                                     # horizontal
                    y0 = gy + int(rng.integers(0, cell - w))
                    x0 = gx + int(rng.integers(0, cell // 2))
                    h = int(rng.integers(cell // 3, cell - 2))
                    img[y0:y0 + w, x0:x0 + h] = fg
    return img


def _bubbles(rng: np.random.Generator, S: int = S) -> np.ndarray:
    img = np.ones((S, S, 3), np.float32) * rng.random(3) * 0.5
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    for _ in range(int(rng.integers(6, 14))):
        cy, cx = rng.random(2) * S
        ry, rx = 20 + rng.random(2) * 120
        ang = rng.random() * np.pi
        ya = (yy - cy) * np.cos(ang) + (xx - cx) * np.sin(ang)
        xa = -(yy - cy) * np.sin(ang) + (xx - cx) * np.cos(ang)
        d2 = (ya / ry) ** 2 + (xa / rx) ** 2
        fall = np.exp(-d2 * (1.5 + 3 * rng.random()))
        col = rng.random(3)
        img = img * (1 - fall[..., None]) + col * fall[..., None]
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def _satdisk(rng: np.random.Generator, S: int = S) -> np.ndarray:
    """Large saturated disks on a near-black ground — the round-2
    saturated-flat-block ceiling probe, circular so the axis-aligned kron
    chart class in training can't cover it."""
    img = np.ones((S, S, 3), np.float32) * (0.01 + 0.03 * rng.random())
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    for _ in range(int(rng.integers(1, 4))):
        cy, cx = rng.random(2) * S
        r = 80 + rng.random() * 120                  # up to ~400 px diameter
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        img[mask] = 1.0
    # one mid-grey disk so the scene isn't purely bimodal
    cy, cx = rng.random(2) * S
    r = 40 + rng.random() * 60
    mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    img[mask] = rng.random(3) * 0.5 + 0.25
    return img


def _chart(rng: np.random.Generator, S: int = S) -> np.ndarray:
    """kron block chart with 256-px blocks — the round-2 ceiling ANCHOR
    (same construction as training v4/v5 data; excluded from held-out
    mean, tracked to compare against the 26.24 dB round-2 number)."""
    gy, gx = 2, 2
    levels = rng.random((gy, gx, 3)).astype(np.float32)
    levels[rng.integers(gy), rng.integers(gx)] = 1.0
    levels[rng.integers(gy), rng.integers(gx)] = 0.02
    img = np.kron(levels, np.ones((S // gy, S // gx, 1), np.float32))
    return img


_PHOTO_CACHE = None


def _photo(rng: np.random.Generator, S: int = S) -> np.ndarray:
    """Frozen PHOTOGRAPHIC crops (round-4 verdict Next #8): every other
    suite class — and the training generator itself — is procedural, so
    this is the one natural-image distribution probe available without
    benchmark archives. Source: the public-domain Grace Hopper portrait
    shipped with matplotlib (4 committed 512-px sRGB crops incl. a
    rotation/flip, docs/heldout_photo/photo_crops.npy — frozen bytes,
    NOT regenerated, so cross-round comparability holds even if the
    matplotlib sample ever changes). rng picks the crop; the unprocess
    chain + frozen (K, sigma) are applied by build_scene like any other
    class."""
    global _PHOTO_CACHE
    if _PHOTO_CACHE is None:
        import os
        path = os.path.join(os.path.dirname(__file__), "..", "..",
                            "docs", "heldout_photo", "photo_crops.npy")
        _PHOTO_CACHE = np.load(os.path.abspath(path))
    c = _PHOTO_CACHE[int(rng.integers(len(_PHOTO_CACHE)))]
    img = c.astype(np.float32) / 255.0
    if S != c.shape[0]:
        sy = c.shape[0] // S
        img = img[: S * sy: sy, : S * sy: sy]
    return img


_GENERATORS = {
    "voronoi": _voronoi, "radial": _radial, "ramp": _ramp,
    "zoneplate": _zoneplate, "glyphs": _glyphs, "bubbles": _bubbles,
    "satdisk": _satdisk, "chart": _chart, "photo": _photo,
}


# --------------------------------------------------------------------------
# the frozen scene list
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SceneSpec:
    name: str
    kind: str          # generator key
    seed: int
    K: float           # shot gain, DN units (electron scale = (wp-bl)/K)
    sigma: float       # read noise, DN units
    heldout: bool = True   # False -> anchor row, excluded from the mean
    size: int = 512        # sRGB scene edge (bayer crops come out same)
    n_crops: int = 4       # crops per scene (large tier uses 1)


# Noise levels span the SIDD-like regime. "lo" rows have input PSNR in the
# ~34-44 dB band (the do-no-harm regime); "mid" rows ~22-32 dB.
HELDOUT_SCENES: List[SceneSpec] = [
    # ---- low-noise band (do-no-harm gate bites here)
    SceneSpec("voronoi_lo",  "voronoi",  101, 1.2, 0.8),
    SceneSpec("radial_lo",   "radial",   102, 0.8, 0.5),
    SceneSpec("ramp_lo",     "ramp",     103, 1.5, 1.0),
    SceneSpec("zone_lo",     "zoneplate", 104, 0.6, 0.4),
    SceneSpec("bubbles_lo",  "bubbles",  105, 1.0, 0.7),
    SceneSpec("glyphs_lo",   "glyphs",   106, 1.4, 0.9),
    # ---- mid-noise band
    SceneSpec("voronoi_mid", "voronoi",  111, 8.0, 8.0),
    SceneSpec("radial_mid",  "radial",   112, 12.0, 10.0),
    SceneSpec("zone_mid",    "zoneplate", 113, 6.0, 6.0),
    SceneSpec("glyphs_mid",  "glyphs",   114, 10.0, 12.0),
    SceneSpec("bubbles_mid", "bubbles",  115, 16.0, 14.0),
    SceneSpec("ramp_mid",    "ramp",     116, 9.0, 9.0),
    # ---- saturation probes (generator-disjoint circular construction)
    SceneSpec("satdisk_lo",  "satdisk",  121, 1.5, 1.0),
    SceneSpec("satdisk_mid", "satdisk",  122, 10.0, 10.0),
    # ---- anchors: NOT generator-disjoint, tracked for cross-round
    #      comparability with round-2 numbers, excluded from the mean
    SceneSpec("chart_anchor", "chart",   131, 8.0, 8.0, heldout=False),
]


# --------------------------------------------------------------------------
# v2 extension (round 4): the v1 scenes above stay FROZEN; v2 = v1 plus a
# second seed per (class, band), a high-noise band, and a large-crop tier,
# so the +-0.2 dB ship-gate decisions stop riding single-seed noise
# (round-3 verdict Next #4). Seeds 2xx/3xx are disjoint from v1's 1xx.
# --------------------------------------------------------------------------

HELDOUT_SCENES_V2_EXTRA: List[SceneSpec] = [
    # second seed, low-noise band
    SceneSpec("voronoi_lo2",  "voronoi",  201, 1.0, 0.6),
    SceneSpec("radial_lo2",   "radial",   202, 0.7, 0.5),
    SceneSpec("ramp_lo2",     "ramp",     203, 1.2, 0.9),
    SceneSpec("zone_lo2",     "zoneplate", 204, 0.8, 0.5),
    SceneSpec("bubbles_lo2",  "bubbles",  205, 1.1, 0.8),
    SceneSpec("glyphs_lo2",   "glyphs",   206, 1.6, 1.0),
    SceneSpec("satdisk_lo2",  "satdisk",  221, 1.3, 0.9),
    # second seed, mid-noise band
    SceneSpec("voronoi_mid2", "voronoi",  211, 10.0, 9.0),
    SceneSpec("radial_mid2",  "radial",   212, 9.0, 11.0),
    SceneSpec("zone_mid2",    "zoneplate", 213, 7.0, 7.0),
    SceneSpec("glyphs_mid2",  "glyphs",   214, 12.0, 10.0),
    SceneSpec("bubbles_mid2", "bubbles",  215, 14.0, 12.0),
    SceneSpec("ramp_mid2",    "ramp",     216, 8.0, 10.0),
    SceneSpec("satdisk_mid2", "satdisk",  222, 12.0, 9.0),
    # high-noise band (input PSNR ~ 18-24 dB)
    SceneSpec("voronoi_hi",   "voronoi",  231, 24.0, 20.0),
    SceneSpec("glyphs_hi",    "glyphs",   232, 20.0, 24.0),
    SceneSpec("zone_hi",      "zoneplate", 233, 28.0, 22.0),
    SceneSpec("bubbles_hi",   "bubbles",  234, 26.0, 18.0),
    # large-crop tier: one 1024-px crop — NLE statistics and tiling
    # behave differently at 4x the pixel count
    SceneSpec("voronoi_big",  "voronoi",  241, 8.0, 8.0,
              size=1024, n_crops=1),
    SceneSpec("glyphs_big",   "glyphs",   242, 10.0, 12.0,
              size=1024, n_crops=1),
    SceneSpec("ramp_big",     "ramp",     243, 9.0, 9.0,
              size=1024, n_crops=1),
]

# --------------------------------------------------------------------------
# v3 extension (round 5): v1/v2 stay FROZEN; v3 adds the photographic
# class (the only natural-image distribution probe available in-image —
# round-4 verdict Next #8). Seeds 3xx.
# --------------------------------------------------------------------------

HELDOUT_SCENES_V3_EXTRA: List[SceneSpec] = [
    SceneSpec("photo_lo",  "photo", 301, 1.2, 0.8),
    SceneSpec("photo_mid", "photo", 302, 9.0, 9.0),
    SceneSpec("photo_hi",  "photo", 303, 24.0, 20.0),
]

SUITES = {
    "v1": HELDOUT_SCENES,
    "v2": HELDOUT_SCENES + HELDOUT_SCENES_V2_EXTRA,   # 36 scenes
    "v3": (HELDOUT_SCENES + HELDOUT_SCENES_V2_EXTRA
           + HELDOUT_SCENES_V3_EXTRA),                # 39 scenes
}


def build_scene(spec: SceneSpec, n_crops: Optional[int] = None):
    """-> (clean [n,size,size] bayer in [0,1], noisy same, in DN [0,1]).

    Content -> pseudo-raw via the same unprocess chain as training (that
    chain is shared infrastructure, not the content generator; disjointness
    is about the content classes). Noise is clipped Poisson-Gaussian at the
    scene's frozen (K, sigma), like real sensor data at the white point.
    """
    from ..data.unprocess import srgb_to_pseudo_raw
    n = spec.n_crops if n_crops is None else n_crops
    rng = np.random.default_rng(spec.seed)
    imgs = np.stack([_GENERATORS[spec.kind](rng, spec.size)
                     for _ in range(n)])
    key = jax.random.PRNGKey(spec.seed)
    rggb, _, _, _ = srgb_to_pseudo_raw(key, jnp.asarray(imgs),
                                       bayer_aug_enabled=False)
    clean = np.asarray(rggb2bayer(rggb), np.float32)
    scale = WP - BL
    electrons = np.clip(clean, 0, 1) * scale / spec.K
    noisy = (spec.K * rng.poisson(electrons)
             + rng.normal(0, spec.sigma, clean.shape)) / scale
    return clean, np.clip(noisy, 0, 1).astype(np.float32)


def run_heldout(engine, n_crops: Optional[int] = None,
                logfile: Optional[str] = None,
                suite: str = "v1",
                scene_filter: Optional[List[str]] = None
                ) -> Dict[str, dict]:
    """Run the engine over a frozen suite ('v1' = the 15 round-3 scenes,
    kept for cross-round comparability; 'v2' = 36 scenes with a second
    seed per class, a high-noise band and a large-crop tier). Returns
    per-scene rows {noisy_psnr, psnr[iter], ssim[iter], do_no_harm} plus
    '_summary' (suite mean + per-class means/spread + the v1-subset mean
    when running v2)."""
    rows: Dict[str, dict] = {}
    p_proto = {"wp": WP, "bl": BL, "ratio": 1, "scale": float(WP - BL),
               "gain": 1.0, "sigma": 0.0}
    scenes = SUITES[suite]
    if scene_filter:
        # probe mode only: a filtered run is NOT a gate (the summary
        # means lose comparability); full-suite artifacts must not use it
        scenes = [s for s in scenes
                  if any(f in s.name for f in scene_filter)]
    v1_names = {s.name for s in HELDOUT_SCENES}
    for spec in scenes:
        clean, noisy = build_scene(spec, n_crops)
        res = engine.iter_denoise({"lr": noisy}, dict(p_proto))
        row = {"kind": spec.kind, "heldout": spec.heldout,
               "K": spec.K, "sigma": spec.sigma,
               "noisy_psnr": float(psnr(noisy, clean)),
               "psnr": [], "ssim": []}
        for dn in res["raw_dns"]:
            row["psnr"].append(float(psnr(dn, clean)))
            row["ssim"].append(float(matlab_ssim(jnp.asarray(dn) * 255,
                                                 jnp.asarray(clean) * 255)))
        row["do_no_harm"] = row["psnr"][-1] >= row["noisy_psnr"]
        rows[spec.name] = row
        log(f"[heldout] {spec.name:13s} noisy={row['noisy_psnr']:6.2f} "
            + " ".join(f"it{i}={v:6.2f}" for i, v in enumerate(row["psnr"]))
            + ("" if row["do_no_harm"] else "  ** BELOW INPUT **"),
            logfile=logfile)
    held = [r for r in rows.values() if r["heldout"]]
    summary = {
        "suite": suite,
        "mean_psnr": float(np.mean([r["psnr"][-1] for r in held])),
        "mean_noisy": float(np.mean([r["noisy_psnr"] for r in held])),
        "mean_ssim": float(np.mean([r["ssim"][-1] for r in held])),
        "do_no_harm_all": all(r["do_no_harm"] for r in held),
        "n_below_input": sum(not r["do_no_harm"] for r in held),
    }
    if suite != "v1":
        v1_rows = [r for nme, r in rows.items()
                   if nme in v1_names and r["heldout"]]
        summary["mean_psnr_v1_subset"] = float(
            np.mean([r["psnr"][-1] for r in v1_rows]))
    # per-class means + spread: the gate reads classes, not single seeds
    per_class: Dict[str, dict] = {}
    for r in held:
        per_class.setdefault(r["kind"], []).append(
            r["psnr"][-1] - r["noisy_psnr"])
    summary["per_class_gain"] = {
        k: {"mean": float(np.mean(v)), "min": float(np.min(v)),
            "max": float(np.max(v)), "n": len(v)}
        for k, v in sorted(per_class.items())}
    # glyphs-class margin target: +0.5 dB over noisy keeps the
    # do-no-harm gate off the knife edge (round-3 verdict Weak #2)
    gl = per_class.get("glyphs", [])
    summary["glyphs_min_margin"] = float(np.min(gl)) if gl else None
    rows["_summary"] = summary
    log(f"[heldout:{suite}] mean {summary['mean_psnr']:.2f} dB "
        f"(noisy {summary['mean_noisy']:.2f}), "
        f"do-no-harm {'PASS' if summary['do_no_harm_all'] else 'FAIL'} "
        f"({summary['n_below_input']} below input)", logfile=logfile)
    for k, v in summary["per_class_gain"].items():
        log(f"[heldout:{suite}]   {k:9s} gain mean={v['mean']:+6.2f} "
            f"min={v['min']:+6.2f} max={v['max']:+6.2f} (n={v['n']})",
            logfile=logfile)
    return rows
