"""Multi-chip product path: the FULL iterated blind-denoise pipeline on
one huge (12-50 MP) frame, row-sharded over a device mesh.

The single-chip analog is YONDEngine.iter_denoise_tiled (overlap tiles);
here the frame lives sharded in HBM across the mesh the whole time:

    bayer -> rggb, pad -> shard rows over 'data'
      -> sharded robust self NLE  (psum'd histograms, spatial.py)
      -> sharded VST denoise      (ppermute halo exchange)
      -> sharded robust collab NLE
      -> guards + second pass + iteration policy (pipeline/policy.py)
      -> unshard, unpad, bayer

Host syncs only at the two NLE -> bias-curve boundaries (the curve is
built from the host 2-D LUT, as in the orchestrated engine); everything
pixel-sized stays device-resident and sharded. Reference semantics:
full_est + full_dn + iteration (YOND_SIDD.py:391-467) at multi-chip
scale, which the reference (single-GPU torch) has no counterpart for.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.logging import log
from ..isp import bayer2rggb, rggb2bayer
from ..vst.lut import FULL_X_GRID
from .spatial import (sharded_self_nlf_robust, sharded_collab_nlf_robust,
                      spatial_denoise_sharded_pair)


def _pad_rows_cols(rggb: np.ndarray, row_mult: int, col_mult: int):
    """Reflect-pad [H, W, 4] so H % row_mult == 0 and W % col_mult == 0."""
    H, W, _ = rggb.shape
    ph = (-H) % row_mult
    pw = (-W) % col_mult
    if ph or pw:
        rggb = np.pad(rggb, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    return rggb, (H, W)


def iter_denoise_frame_sharded(mesh: Mesh, engine, bayer: np.ndarray,
                               p: Dict[str, Any], halo: int = 64,
                               axis: str = "data") -> Dict[str, Any]:
    """Run the full iterative pipeline for ONE bayer frame on the mesh.

    engine: a YONDEngine (supplies denoiser config/weights, biaslut, pipe
    guards + iteration policy). p: {'wp','bl','ratio','scale',...} as in
    iter_denoise. Returns {'raw_dns': [np [H, W], ...], 'regs': [...]}.
    """
    from ..pipeline.policy import (combine_rounds, reg_agreement,
                                   DEFAULT_POLICY, DEFAULT_TOL)
    pipe = engine.pipe
    den = engine.denoiser
    n = mesh.shape[axis]
    rggb = np.asarray(bayer2rggb(jnp.asarray(bayer, jnp.float32)))
    # row shards must satisfy (h_shard + 2*halo) % pad_base == 0 for the
    # UNet scale tree and be even for the NLE's 2x2 Haar cells; columns
    # must hit pad_base too (no W sharding).
    base = max(den.pad_base, 2)
    assert (2 * halo) % base == 0, (halo, base)
    rggb, (H0, W0) = _pad_rows_cols(rggb, row_mult=n * base, col_mult=base)
    h_shard = rggb.shape[0] // n
    # halo rows come from the IMMEDIATE neighbor only (one ppermute), so
    # halo must stay under the shard height; clamp to the largest
    # base/2-multiple that fits (keeps (h + 2*halo) % base == 0)
    if halo >= h_shard:
        step = max(base // 2, 2)
        halo_eff = max(((h_shard - 1) // step) * step, step)
        log(f"[product] halo {halo} >= shard rows {h_shard}; "
            f"clamped to {halo_eff}", logfile=engine.logfile)
        halo = halo_eff
    assert halo < h_shard, (halo, h_shard)
    sharding = NamedSharding(mesh, P(axis))
    x = jax.device_put(jnp.asarray(rggb), sharding)

    scale = float(p["scale"])
    dn_units = p["wp"] - p["bl"]

    # ---- round 0: sharded robust self NLE
    b1, b2 = (float(v) for v in sharded_self_nlf_robust(
        mesh, x, k=pipe.k, axis=axis))
    reg = (b1, b2)
    K = max(b1 * dn_units, 1e-4)
    sigma = float(np.sqrt(max(b2, 0.0))) * dn_units
    log(f"Self Est (sharded x{n}): K={K:.4f}, b={sigma:.4f} "
        f"(beta1={b1:.3e}, beta2={b2:.3e})", logfile=engine.logfile)

    def one_pass(Kv, sv):
        curve = engine.biaslut.curve(max(Kv, 1e-4), sv) \
            if pipe.bias_corr else np.zeros(len(FULL_X_GRID), np.float32)
        corr = den.sigma_corr
        if corr == "adaptive":
            # the blind rule reads full-frame statistics
            # (pipeline/denoiser.py adaptive_sigma_corr); computed
            # host-side per pass (like the engine, the second pass
            # re-reads at its corrected (K, sigma)) and passed into the
            # shard_map as the plain guidance scalar
            from ..pipeline.denoiser import adaptive_sigma_corr
            corr = float(adaptive_sigma_corr(
                x, jnp.float32(max(Kv, 1e-4)), jnp.float32(sv),
                jnp.float32(scale)))
        return spatial_denoise_sharded_pair(
            mesh, den.model.apply, den.params, x, curve, max(Kv, 1e-4),
            sv, scale, halo=halo, axis=axis, bias_corr=den.bias_corr,
            exact_inverse=den.exact_inverse, sigma_corr=corr,
            guided=den.guided, refine=den.refine, refine_k=den.refine_k,
            refine_beta=den.refine_beta, refine_floor=den.refine_floor)

    dn, dn_raw = one_pass(K, sigma)
    regs = [reg]
    outs = [dn]

    if pipe.iter == "iter":
        from ..pipeline.policy import DEFAULT_FLOOR_FRAC
        policy = pipe.extras.get("iter_policy", DEFAULT_POLICY)
        tol = float(pipe.extras.get("iter_policy_tol", DEFAULT_TOL))
        ff_tol = float(pipe.extras.get("iter_policy_floor_frac",
                                       DEFAULT_FLOOR_FRAC))
        ffrac = None
        if policy == "rescue":
            # certified-under-estimate gate on the INPUT (engine.
            # _input_floor_frac semantics; model evaluated at the
            # floor's own mid-tone mean, flat_floor_stats docstring)
            from ..nle.robust import flat_floor_stats
            floor0, mu_mid0 = flat_floor_stats(x)
            ffrac = float(floor0) ** 2 \
                / max(b1 * float(mu_mid0) + max(b2, 0.0), 1e-30)
        for epoch in range(1, pipe.max_iter + 1):
            c1, c2 = (float(v) for v in sharded_collab_nlf_robust(
                mesh, x, dn_raw, k=pipe.k, axis=axis, self_reg=regs[0]))
            if c2 < 0:
                log(f"Warning!!! b={c2:.4f} is backup to {c1 ** 2:.4f}",
                    logfile=engine.logfile)
                c2 = c1 ** 2
            log(f"Iter {epoch} Est (sharded): K={c1 * dn_units:.4f}, "
                f"sigma={float(np.sqrt(max(c2, 0.0))) * dn_units:.4f} "
                f"(beta1={c1:.3e}, beta2={c2:.3e})",
                logfile=engine.logfile)
            if c1 < 0:
                log("Warning!!! Wrong noise level! Backup to iter_0 "
                    "result.", logfile=engine.logfile)
                break
            prev, prev_raw = dn, dn_raw
            mu = float(jnp.mean(jnp.clip(prev_raw, 0.0, 1.0)))
            agree = float(reg_agreement(regs[-1], (c1, c2), mu))
            # same dead-pass skip as pipeline/engine.py + fused.py
            if policy != "rescue" or (agree > tol and ffrac > ff_tol):
                dn, dn_raw = one_pass(c1 * dn_units,
                                      float(np.sqrt(c2)) * dn_units)
                dn = combine_rounds(prev, dn, agree, policy=policy,
                                    tol=tol, floor_frac=ffrac,
                                    floor_frac_tol=ff_tol)
            outs.append(dn)
            regs.append((c1, c2))

    raw_dns = []
    for o in outs:
        o = np.asarray(o)[:H0, :W0]
        raw_dns.append(np.asarray(rggb2bayer(jnp.asarray(o)),
                                  np.float32))
    return {"raw_dns": raw_dns, "regs": regs}
