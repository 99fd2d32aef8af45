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
glyphs_lo and broke do-no-harm by 0.05 dB). The round-4 discriminator
measured residual noise ON dn0; the round-5 threshold sweep
(scripts/sweep_policy.py, docs/policy_sweep_r5.json) showed its
ordering is WRONG with a real net: an under-guided SNR-net still
cleans the flattest cells — the only cells a content-free floor can
read — and leaves its error at edges/mid-frequencies, so genuine
K-faults measured 0.006-0.12 of the collab level while the
content-inflated impostors measured 0.15-2.5 (glyphs_lo2 0.74,
zoneplate 2.5). No dn0 statistic separates the cases.

The replacement signal reads the NOISY INPUT instead
(`input_floor_frac`, engine-supplied floor(lr)^2 / v_self): the
content-free low-quantile noise floor of the input is a LOWER bound on
the true noise level (content can only push it up), so
"self model below the input's own floor" is an under-estimate
certified from the input alone. On impostor scenes the self estimate
is inflated by the same content that inflates collab, so the ratio
stays ~<= 1; probed landscape in scripts/probe_floor_discriminator.py
and the sweep artifact.

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
# rescue fires only when the input's content-free noise floor sits
# above the self noise model by this variance ratio (a certified
# under-estimate: the floor is a lower bound on true noise). Chosen
# from the round-5 sweep landscape (docs/policy_sweep_r5.json):
# genuine K-faults read 1/f..1/f^2 (>= 2 at f=0.5), impostor scenes
# (content-inflated self+collab) read <= ~1.
DEFAULT_FLOOR_FRAC = 1.5
# retired round-4 gate (dn0-residual-noise fraction): kept only as the
# default for telemetry comparisons; see the module docstring for why
# its ordering fails with a real net
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
                   tol: float = DEFAULT_TOL, floor_frac=None,
                   floor_frac_tol: float = DEFAULT_FLOOR_FRAC):
    """Combine the round-0 and round-1 outputs per the policy.

    dn0/dn1: arrays (any matching shape); disagree: SIGNED scalar from
    `reg_agreement`; floor_frac: optional scalar, the input's
    content-free noise floor (variance) relative to the SELF noise
    model (rescue fires only when it exceeds floor_frac_tol — the
    certified-under-estimate signature, see module docstring).
    Pure arithmetic — safe inside jit (the engine calls it on numpy
    arrays, the fused path on traced values).
    """
    if policy == "replace":
        return dn1
    if policy == "avg":
        return 0.5 * dn0 + 0.5 * dn1
    if policy == "rescue":
        w = jnp.clip((disagree - tol) / (2.0 * tol), 0.0, 1.0)
        if floor_frac is not None:
            w = w * (floor_frac > floor_frac_tol)
        return (1.0 - w) * dn0 + w * dn1
    take = jnp.abs(disagree) > tol
    if policy == "guard":
        return jnp.where(take, dn1, dn0)
    if policy == "avg_guard":
        return jnp.where(take, 0.5 * dn0 + 0.5 * dn1, dn0)
    raise ValueError(f"unknown iter policy {policy!r}; one of {POLICIES}")
