"""Iteration-1 output policy: how the collab round's output is combined
with round 0's.

The reference always REPLACES round 0 with the collab-round output
(YOND_SIDD.py:449-467) and gains +0.64 dB — its SimpleNLF round-0
estimate is weak, so the collab re-estimate carries real information.

This stack is different, and measurably so (scripts/probe_iter_policy.py,
run in the PRODUCT config: robust NLE + method-noise Wiener refine):

- round-0's self estimate is already accurate (robust NLE), and where it
  OVER-estimates, the Wiener refinement restores the over-removed signal
  from the residual. The "over-estimate + refine" pair beats a pass at
  the TRUE noise level: injecting the frozen GT (K, sigma) into pass 2
  LOSES 0.36 dB on the mid-noise held-out scenes (radial_mid -2.08,
  chart -0.94) — the droop is not an estimator defect, it is the refine
  converting the overestimate into an input-ensemble advantage that an
  accurate second pass forfeits.
- the one regime iteration still owns is the UNDER-estimate: if round 0
  ran at too LOW a noise level (clipped content suppressing the patch
  statistics), the net under-smooths, residual noise stays, and the
  refinement cannot remove it (it only adds residual back). There the
  collab estimate comes back HIGHER than self, and a second pass at the
  raised level genuinely rescues.

Hence the default policy is DIRECTIONAL: compare the two noise models by
their predicted total variance at the scene's mean intensity; iterate
exactly when collab says the noise was UNDERestimated by more than
`tol`, with a blend weight ramping from 0 at tol to full replacement at
3*tol (a hard switch at one threshold would cliff on borderline scenes).
Collab below self (the over-estimate direction) keeps round 0 — the
refinement already banked that information.

One more condition separates a TRUE under-estimate from its impostor.
On stroke-dense content (the glyphs held-out class) BOTH estimators are
inflated by content and collab comes back above self — a fake
"under-estimate" signal (measured round 4: rescue replaced it1 on
glyphs_lo and broke do-no-harm by 0.05 dB). The discriminator is the
round-0 OUTPUT itself: after a real under-estimate the net leaves
residual noise in dn0, so a blind MAD estimate ON dn0 returns a
significant fraction of the collab level; after over-smoothing, dn0 is
smooth and measures ~0. `dn0_noise_frac` (engine-supplied
mad(dn0)/v_collab) gates the rescue on that physical signature.

Policies (all blind, all jit-safe arithmetic on a SIGNED disagreement):
- 'replace'   reference semantics: it1 wins (golden-gate parity mode).
- 'avg'       0.5 * dn0 + 0.5 * dn1 unconditionally.
- 'guard'     |d| > tol -> dn1, else dn0.
- 'avg_guard' |d| > tol -> average, else dn0.
- 'rescue'    (default) d > tol -> ramp toward dn1; d <= tol -> dn0.
"""
from __future__ import annotations

import jax.numpy as jnp

POLICIES = ("replace", "avg", "guard", "avg_guard", "rescue")
DEFAULT_POLICY = "rescue"
DEFAULT_TOL = 0.15
# rescue fires only when the round-0 output still carries at least this
# fraction of the collab noise level (true under-smoothing signature);
# a well-denoised dn0 measures ~0.05-0.1 of its noise model here
DEFAULT_NOISE_FRAC = 0.15


def reg_agreement(self_reg, collab_reg, mean_intensity):
    """SIGNED relative disagreement of the two noise models: compares the
    total variance beta1*mu + beta2 each predicts at the scene's mean
    intensity. Positive = collab says the noise was UNDER-estimated
    (dangerous: round 0 under-smoothed); negative = over-estimated (the
    Wiener refinement already compensated)."""
    b1s, b2s = self_reg
    b1c, b2c = collab_reg
    v_self = b1s * mean_intensity + b2s
    v_col = b1c * mean_intensity + b2c
    return (v_col - v_self) / jnp.maximum(v_self, 1e-30)


def combine_rounds(dn0, dn1, disagree, policy: str = DEFAULT_POLICY,
                   tol: float = DEFAULT_TOL, dn0_noise_frac=None,
                   noise_frac_tol: float = DEFAULT_NOISE_FRAC):
    """Combine the round-0 and round-1 outputs per the policy.

    dn0/dn1: arrays (any matching shape); disagree: SIGNED scalar from
    `reg_agreement`; dn0_noise_frac: optional scalar, the blind MAD noise
    estimate ON dn0 relative to the collab model (rescue fires only when
    it exceeds noise_frac_tol — the true under-smoothing signature).
    Pure arithmetic — safe inside jit (the engine calls it on numpy
    arrays, the fused path on traced values).
    """
    if policy == "replace":
        return dn1
    if policy == "avg":
        return 0.5 * dn0 + 0.5 * dn1
    if policy == "rescue":
        w = jnp.clip((disagree - tol) / (2.0 * tol), 0.0, 1.0)
        if dn0_noise_frac is not None:
            w = w * (dn0_noise_frac > noise_frac_tol)
        return (1.0 - w) * dn0 + w * dn1
    take = jnp.abs(disagree) > tol
    if policy == "guard":
        return jnp.where(take, dn1, dn0)
    if policy == "avg_guard":
        return jnp.where(take, 0.5 * dn0 + 0.5 * dn1, dn0)
    raise ValueError(f"unknown iter policy {policy!r}; one of {POLICIES}")
