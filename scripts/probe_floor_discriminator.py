"""Probe: can the INPUT noise floor discriminate true under-estimates?

Round-5 finding (docs/policy_sweep_r5.json): the rescue policy's
dn0-based noise_frac discriminator has the WRONG ordering — fake
under-estimates (content-inflated collab on glyphs/ramp scenes) read
HIGHER dn0 noise fractions (0.15-0.74) than genuine K-faults do
(0.009-0.12), because an under-guided net still cleans the flattest
cells (the only cells the content-free floor reads) while leaving its
error at edges/mid-frequencies.

Candidate replacement signal, measured here: mad_noise_floor(lr) — the
content-free low-quantile floor of the NOISY INPUT — is a lower bound
on the true noise level. If the self estimate sits BELOW that floor
(floor^2 > c * v_self), the under-estimate is proven from the input
alone; content can only push the floor UP, i.e. toward firing only when
collab ALSO says under-estimate, and on content-inflated scenes the
self estimate is inflated the same way so the ratio stays ~<=1.

Run: python scripts/probe_floor_discriminator.py  (CPU, no net needed)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

# hard override: the sandbox's sitecustomize imports jax and registers
# the axon TPU plugin before this script runs, so the JAX_PLATFORMS env
# var is captured too early — config.update is the reliable pin (same
# pattern as tests/conftest.py), and this probe must not contend with
# TPU jobs
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from yondx.isp.bayer import bayer2rggb
from yondx.nle.robust import self_nlf_robust, flat_floor_stats
from yondx.eval.heldout import SUITES, build_scene

FAULT_LADDER = [1.0, 0.5, 0.25, 0.10, 0.04]


def floor_frac(lr, reg):
    """Mirrors engine._input_floor_frac: the noise model is evaluated
    at the floor's own mid-tone mean (the global mean breaks on
    nearly-black frames like ramp_big — measured 7.97 there vs ~<= 1
    at mu_mid)."""
    rggb = bayer2rggb(jnp.asarray(lr, jnp.float32))
    fl, mu_mid = flat_floor_stats(rggb)
    fl = float(fl)
    v_self = reg[0] * float(mu_mid) + max(reg[1], 0.0)
    return fl ** 2 / max(v_self, 1e-30), fl


def main():
    print(f"{'case':16s} {'ffrac':>8s} {'floor':>9s} {'beta1':>10s} note")
    # ---- fault ladder on the flat-block scene (sweep_policy.py:99-109)
    rng = np.random.default_rng(11)
    H = W = 512
    clean = np.kron(rng.random((4, 4)) * 0.6 + 0.2,
                    np.ones((H // 4, W // 4))).astype(np.float32)
    K, sigma, scale = 24.0, 6.0, 959.0
    noisy = np.clip((K * rng.poisson(clean * scale / K)
                     + rng.normal(0, sigma, clean.shape)) / scale,
                    0, 1).astype(np.float32)
    rggb = bayer2rggb(jnp.asarray(noisy, jnp.float32))
    b1, b2 = self_nlf_robust(rggb)
    b1, b2 = float(b1), float(b2)
    for f in FAULT_LADDER:
        reg = (b1 * f, b2 * f * f)
        ff, fl = floor_frac(noisy, reg)
        print(f"fault f={f:5.2f}    {ff:8.3f} {fl:9.5f} {reg[0]:10.3e} "
              f"{'FIRE' if ff > 1.5 else 'hold'}")
    # ---- suite scenes (true estimates; all should HOLD)
    names = {"glyphs_lo", "glyphs_lo2", "glyphs_hi", "glyphs_big",
             "ramp_big", "zone_lo", "zone_lo2", "voronoi_mid",
             "satdisk_lo", "radial_lo", "ramp_mid2", "chart_anchor"}
    for spec in SUITES["v2"]:
        if spec.name not in names:
            continue
        _, lr = build_scene(spec)
        reg = self_nlf_robust(bayer2rggb(jnp.asarray(lr, jnp.float32)))
        reg = (float(reg[0]), float(reg[1]))
        ff, fl = floor_frac(lr, reg)
        print(f"{spec.name:16s} {ff:8.3f} {fl:9.5f} {reg[0]:10.3e} "
              f"{'FIRE' if ff > 1.5 else 'hold'}")


if __name__ == "__main__":
    main()
