"""Method-noise Wiener refinement (yondx/pipeline/refine.py) and the
frozen held-out suite (yondx/eval/heldout.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from yondx.pipeline.refine import wiener_refine
from yondx.nle.boxfilter import box_mean


def _mse(a, b):
    return float(jnp.mean((jnp.asarray(a) - jnp.asarray(b)) ** 2))


class TestWienerRefine:
    def _scene(self, rng, H=192, W=192):
        """Textured clean signal (the class an over-smoother destroys)."""
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        z = (0.5 + 0.2 * np.sin(xx * 0.5) * np.cos(yy * 0.3)
             + 0.1 * np.sin((xx + yy) * 0.9))
        return z[..., None].astype(np.float32)

    def test_beats_oversmoothing_denoiser(self):
        """out MSE < min(MSE_dn, MSE_noisy) when the 'denoiser' is an
        aggressive blur at LOW noise — the do-no-harm regime."""
        rng = np.random.default_rng(0)
        clean = self._scene(rng)
        nsr = 0.02                       # low noise: blur destroys texture
        noisy = clean + rng.normal(0, nsr, clean.shape).astype(np.float32)
        dn = np.asarray(box_mean(jnp.asarray(noisy), 9))
        out = np.asarray(wiener_refine(jnp.asarray(dn), jnp.asarray(noisy),
                                       noise_var=nsr ** 2))
        assert _mse(dn, clean) > _mse(noisy, clean)   # blur does harm here
        assert _mse(out, clean) < _mse(noisy, clean)  # refinement undoes it
        assert _mse(out, clean) < 0.5 * _mse(dn, clean)

    def test_keeps_good_denoiser(self):
        """When the denoiser is near-oracle, refinement must not degrade
        it back toward the noisy input (alpha ~ 0)."""
        rng = np.random.default_rng(1)
        clean = self._scene(rng)
        nsr = 0.1
        noisy = clean + rng.normal(0, nsr, clean.shape).astype(np.float32)
        dn = clean + rng.normal(0, nsr * 0.05, clean.shape).astype(
            np.float32)                   # near-perfect denoiser
        out = np.asarray(wiener_refine(jnp.asarray(dn), jnp.asarray(noisy),
                                       noise_var=nsr ** 2))
        assert _mse(out, clean) < 1.3 * _mse(dn, clean)
        assert _mse(out, clean) < 0.1 * _mse(noisy, clean)

    def test_saturation_guard(self):
        """alpha is forced to 0 where the intensity proxy is saturated —
        clipped noise must not be blended back at the white point."""
        rng = np.random.default_rng(2)
        clean = np.full((64, 64, 1), 1.0, np.float32)
        nsr = 0.05
        noisy = np.clip(clean + rng.normal(0, nsr, clean.shape), 0, 1
                        ).astype(np.float32)
        dn = clean.copy()                 # oracle: exact white
        out = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=nsr ** 2,
            x01=jnp.asarray(dn)))
        # clipped (half-)noise makes the residual power look like signal;
        # without the guard alpha would blend the clipped noise back in
        assert _mse(out, clean) < 1e-8

    def test_local_floor_recovers_under_overestimated_noise(self):
        """When the caller's noise_var is grossly over-estimated (the NLE
        failure mode on stroke-dense content), the LOCAL floor (erosion of
        residual power over flat patches) restores most of the destroyed
        signal; the fixed floor cannot."""
        rng = np.random.default_rng(4)
        H = W = 256
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        clean = np.full((H, W, 1), 0.5, np.float32)
        # glyph-like geometry: a 48-px texture band flanked by flats, so
        # the nearest flat patch is within the erosion window's reach
        # (deep inside a wide textured region the floor deliberately
        # stays conservative = plain Wiener)
        band = np.s_[:, 104:152]
        clean[band] += (0.1 * np.sin(xx[band] * 1.3))[..., None]
        true_sig = 0.01
        noisy = clean + rng.normal(0, true_sig, clean.shape).astype(
            np.float32)
        dn = np.asarray(box_mean(jnp.asarray(noisy), 9))  # kills texture
        V_over = (6 * true_sig) ** 2                  # 36x over-estimate
        out_fix = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=V_over,
            noise_floor="fixed"))
        out_loc = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=V_over,
            noise_floor="local"))
        tex = np.s_[32:-32, 110:146]
        assert _mse(out_loc[tex], clean[tex]) < \
            0.5 * _mse(out_fix[tex], clean[tex])
        # and the flat wings must not regress vs the blur output
        flat = np.s_[32:-32, 16:88]
        assert _mse(out_loc[flat], clean[flat]) < 2.0 * true_sig ** 2

    def test_bucket_floor_texture_immune(self):
        """The bucket floor's defining property vs 'local': on a scene
        with NO flat window anywhere (rings at every location), a
        correct noise model must be kept (floor ~ V -> 'fixed'
        behavior), so a near-oracle denoiser is NOT degraded. The
        'local' erosion floor under-reads here (its min of chi2 window
        means rides the sampling tail) and blends noise back."""
        rng = np.random.default_rng(7)
        H = W = 256
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        r = np.sqrt((yy - 120) ** 2 + (xx - 130) ** 2)
        clean = (0.5 + 0.35 * np.cos(r / 6.0))[..., None].astype(
            np.float32)
        nsr = 0.05
        noisy = clean + rng.normal(0, nsr, clean.shape).astype(np.float32)
        dn = clean + rng.normal(0, nsr * 0.05, clean.shape).astype(
            np.float32)                   # near-oracle
        out_b = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=nsr ** 2,
            noise_floor="bucket"))
        out_l = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=nsr ** 2,
            noise_floor="local"))
        assert _mse(out_b, clean) < 1.3 * _mse(dn, clean)
        assert _mse(out_b, clean) < 0.5 * _mse(out_l, clean)

    def test_bucket_floor_rescues_overestimated_noise(self):
        """And the other half of the contract: under a grossly
        over-estimated noise model (the net then over-smooths), the
        bucket floor reads the TRUE per-intensity noise from the input
        and lets the refinement restore the destroyed structure —
        matching the 'local' floor's rescue, where 'fixed' under-fires."""
        rng = np.random.default_rng(8)
        H = W = 256
        clean = np.full((H, W, 1), 0.4, np.float32)
        for gy in range(8, H - 24, 24):            # thin strokes
            for gx in range(8, W - 24, 24):
                clean[gy:gy + 12, gx:gx + 2] = 0.85
                clean[gy:gy + 2, gx:gx + 12] = 0.85
        true_sig = 0.01
        noisy = clean + rng.normal(0, true_sig, clean.shape).astype(
            np.float32)
        dn = np.asarray(box_mean(jnp.asarray(noisy), 9))  # stroke killer
        V_over = (6.0 * true_sig) ** 2              # 36x over-estimate
        out_fix = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=V_over,
            noise_floor="fixed"))
        out_b = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=V_over,
            noise_floor="bucket"))
        assert _mse(out_b, clean) < 0.5 * _mse(out_fix, clean)
        assert _mse(out_b, clean) < 0.5 * _mse(dn, clean)

    def test_bucket_floor_clip_aware(self):
        """Black-clipped range: the dark buckets' true variance is below
        the (correct mid-tone) model, and the floor picks that up per
        INTENSITY — dark-region alpha can rise without dragging the
        mid-tone floor down (the failure of a global q10 scalar)."""
        rng = np.random.default_rng(9)
        H = W = 256
        clean = np.zeros((H, W, 1), np.float32)        # black-clipped ground
        clean[64:192, 64:192] = 0.5                    # one mid-tone block
        sig = 0.04
        noisy = np.clip(clean + rng.normal(0, sig, clean.shape), 0.0, 1.0
                        ).astype(np.float32)
        dn = np.asarray(box_mean(jnp.asarray(noisy), 5))
        from yondx.pipeline.refine import _bucket_noise_floor
        fl = np.asarray(_bucket_noise_floor(jnp.asarray(noisy),
                                            jnp.asarray(dn), sig ** 2))
        dark = fl[clean[..., 0] < 0.1]
        mid = fl[(clean[..., 0] > 0.4)]
        # clipped dark floor well below the model; mid-tone keeps it
        assert np.median(dark) < 0.6 * sig ** 2
        assert np.median(mid) > 0.8 * sig ** 2

    def test_shrink_band_variances_match_monte_carlo(self):
        """The analytic starlet band-noise factors (separable inner
        products) must match measured band variances on white noise."""
        from yondx.pipeline.refine import (_starlet_noise_vars,
                                           _sep_b3_blur)
        det_vars, coarse_var = _starlet_noise_vars(3)
        rng = np.random.default_rng(11)
        n = jnp.asarray(rng.normal(0, 1, (512, 512, 1)).astype(np.float32))
        c = n
        for j, v_ref in enumerate(det_vars):
            cj = _sep_b3_blur(c, 2 ** j)
            v = float(jnp.var(c - cj))
            assert abs(v - v_ref) / v_ref < 0.05, (j, v, v_ref)
            c = cj
        assert abs(float(jnp.var(c)) - coarse_var) / coarse_var < 0.15

    def test_shrink_suppresses_pure_noise(self):
        """A pure-noise residual loses most of its power through the
        à-trous shrink (this is the noise the alpha~1 blend re-adds)."""
        from yondx.pipeline.refine import shrink_residual_atrous
        rng = np.random.default_rng(12)
        sig = 0.05
        r = jnp.asarray(rng.normal(0, sig, (256, 256, 1)).astype(
            np.float32))
        rs = shrink_residual_atrous(r, sig ** 2)
        assert float(jnp.mean(rs ** 2)) < 0.35 * float(jnp.mean(r ** 2))

    def test_shrink_harmless_at_saturated_alpha(self):
        """Where alpha saturates (net destroyed structure outright) the
        alpha ramp hands the RAW residual back — the shrink must track
        the baseline blend there. TPU-measured motivation: the
        unconditional shrink lost 0.15-0.51 dB on the glyph/satdisk
        held-out rows because the real stroke residual sits too close to
        the band noise floor to survive per-coefficient shrinking."""
        rng = np.random.default_rng(13)
        H = W = 256
        clean = np.full((H, W, 1), 0.4, np.float32)
        for gy in range(8, H - 24, 24):
            for gx in range(8, W - 24, 24):
                clean[gy:gy + 12, gx:gx + 2] = 0.85
                clean[gy:gy + 2, gx:gx + 12] = 0.85
        sig = 0.03
        noisy = clean + rng.normal(0, sig, clean.shape).astype(np.float32)
        dn = np.asarray(box_mean(jnp.asarray(noisy), 9))  # stroke killer
        out_raw = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=sig ** 2))
        out_shr = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=sig ** 2,
            residual_shrink=True))
        assert _mse(out_shr, clean) < 1.1 * _mse(out_raw, clean)

    def test_shrink_gains_at_mid_alpha(self):
        """The regime the shrink exists for: a mildly-over-smoothing
        denoiser on textured content (alpha mid-range), where the blend
        restores structure AND re-adds noise. The shrunk residual keeps
        the structure with less of the noise (TPU held-out analog:
        radial_mid +0.60, ramp_mid +0.72 dB)."""
        rng = np.random.default_rng(15)
        yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
        clean = (0.5 + 0.25 * np.sin(xx * 0.35) * np.cos(yy * 0.22)
                 )[..., None].astype(np.float32)
        sig = 0.04
        noisy = clean + rng.normal(0, sig, clean.shape).astype(np.float32)
        dn = np.asarray(box_mean(jnp.asarray(noisy), 7))
        out_raw = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=sig ** 2))
        out_shr = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=sig ** 2,
            residual_shrink=True))
        assert _mse(out_shr, clean) < 0.92 * _mse(out_raw, clean)

    def test_shrink_keeps_good_denoiser(self):
        """Near-oracle denoiser: the shrink path must stay as harmless as
        the raw blend (alpha ~ 0 -> the residual transform is moot)."""
        rng = np.random.default_rng(14)
        yy, xx = np.mgrid[0:192, 0:192].astype(np.float32)
        clean = (0.5 + 0.2 * np.sin(xx * 0.5) * np.cos(yy * 0.3)
                 )[..., None].astype(np.float32)
        nsr = 0.1
        noisy = clean + rng.normal(0, nsr, clean.shape).astype(np.float32)
        dn = clean + rng.normal(0, nsr * 0.05, clean.shape).astype(
            np.float32)
        out = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=nsr ** 2,
            residual_shrink=True))
        assert _mse(out, clean) < 1.3 * _mse(dn, clean)

    def test_bucket_floor_odd_shapes(self):
        """Odd plane sizes (ANY-camera frames whose packed planes aren't
        even) must work: the Haar cell split crops to even dims instead
        of failing on mismatched 0::2 / 1::2 halves (regression)."""
        from yondx.pipeline.refine import _bucket_noise_floor
        rng = np.random.default_rng(21)
        sig = 0.03
        noisy = jnp.asarray(rng.random((75, 99, 4)).astype(np.float32))
        dn = box_mean(noisy, 5)
        fl = np.asarray(_bucket_noise_floor(noisy, dn, sig ** 2))
        assert fl.shape == (75, 99, 4)
        assert np.isfinite(fl).all()
        out = np.asarray(wiener_refine(dn, noisy, noise_var=sig ** 2,
                                       noise_floor="bucket",
                                       residual_shrink=True))
        assert out.shape == (75, 99, 4) and np.isfinite(out).all()

    def test_dir_mean_noise_vars_match_monte_carlo(self):
        """The analytic directional-mean noise variances (explicit 2-D
        composed kernels) must match measurement on white noise. The
        coherence map is a max of 2 squared means per direction class,
        so its mean sits at E[max of 2 chi^2_1] ~ 1.64 x nu."""
        from yondx.pipeline.refine import (_dir_mean_noise_vars,
                                           _dir_coherence, _sep_b3_blur)
        dv = _dir_mean_noise_vars(2, 9)
        rng = np.random.default_rng(31)
        c = jnp.asarray(rng.normal(0, 1, (512, 512, 1)).astype(np.float32))
        for j in range(2):
            cj = _sep_b3_blur(c, 2 ** j)
            ca, cd = _dir_coherence(c - cj, min(2 ** j, 4), 9)
            for coh, nu in ((ca, dv[j][0]), (cd, dv[j][1])):
                ratio = float(jnp.mean(coh)) / nu
                assert 1.3 < ratio < 2.1, (j, ratio)
            c = cj

    def test_oriented_shrink_keeps_floor_stroke(self):
        """A straight stroke whose band amplitude sits AT the band noise
        floor is invisible to the isotropic empirical-Wiener gain but
        passes the orientation-coherence gate — the round-4 glyph
        ceiling's mechanism."""
        from yondx.pipeline.refine import (shrink_residual_atrous,
                                           _starlet_noise_vars)
        det_vars, _ = _starlet_noise_vars(3)
        rng = np.random.default_rng(32)
        sig = 0.05
        H = W = 256
        stroke = np.zeros((H, W, 4), np.float32)
        amp = float(np.sqrt(det_vars[0])) * sig * 1.5  # near-floor stroke
        for x0 in range(24, W - 8, 24):
            stroke[40:216, x0] = amp / 0.6   # ~60% lands in band 0
        r = jnp.asarray(stroke
                        + rng.normal(0, sig, stroke.shape).astype(
                            np.float32))
        out_i = np.asarray(shrink_residual_atrous(r, sig ** 2))
        out_o = np.asarray(shrink_residual_atrous(r, sig ** 2,
                                                  mode="oriented"))
        cols = stroke[..., 0].max(axis=0) > 0
        kept_i = float(np.mean(out_i[40:216, cols] * stroke[40:216, cols])
                       ) / float(np.mean(stroke[40:216, cols] ** 2))
        kept_o = float(np.mean(out_o[40:216, cols] * stroke[40:216, cols])
                       ) / float(np.mean(stroke[40:216, cols] ** 2))
        assert kept_o > kept_i + 0.15, (kept_i, kept_o)
        assert kept_o > 0.5, kept_o
        # and pure-noise suppression must stay near the iso shrink's
        bg = ~cols
        p_i = float(np.mean(out_i[:, bg] ** 2))
        p_o = float(np.mean(out_o[:, bg] ** 2))
        assert p_o < 1.5 * p_i, (p_i, p_o)

    def test_oriented_shrink_full_alpha_one(self):
        """shrink_full_alpha >= 1.0 = shrink everywhere (no raw-residual
        handback). On a stroke scene with a stroke-destroying denoiser
        the oriented full shrink must beat the raw blend (which re-adds
        noise frame-wide) AND the ramped iso shrink."""
        rng = np.random.default_rng(33)
        H = W = 256
        clean = np.full((H, W, 4), 0.4, np.float32)
        for gy in range(8, H - 24, 24):
            for gx in range(8, W - 24, 24):
                clean[gy:gy + 12, gx:gx + 2] = 0.85
                clean[gy:gy + 2, gx:gx + 12] = 0.85
        sig = 0.03
        noisy = clean + rng.normal(0, sig, clean.shape).astype(np.float32)
        dn = np.asarray(box_mean(jnp.asarray(noisy), 9))  # stroke killer
        out_raw = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=sig ** 2))
        out_or = np.asarray(wiener_refine(
            jnp.asarray(dn), jnp.asarray(noisy), noise_var=sig ** 2,
            residual_shrink=True, shrink_mode="oriented",
            shrink_full_alpha=1.0))
        assert _mse(out_or, clean) < 0.95 * _mse(out_raw, clean)

    def test_identity_when_input_equals_output(self):
        z = jnp.asarray(np.random.default_rng(3).random((32, 32, 4)),
                        jnp.float32)
        out = wiener_refine(z, z, noise_var=0.01)
        np.testing.assert_allclose(np.asarray(out), np.asarray(z), atol=0)


class TestHeldoutSuite:
    def test_scene_construction_frozen(self):
        """Scenes are deterministic: same spec -> identical pixels."""
        from yondx.eval.heldout import HELDOUT_SCENES, build_scene
        spec = HELDOUT_SCENES[0]
        c1, n1 = build_scene(spec, n_crops=1)
        c2, n2 = build_scene(spec, n_crops=1)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(n1, n2)

    def test_v3_photo_class_frozen(self):
        """The v3 photographic class reads COMMITTED crop bytes (not the
        matplotlib sample it was cut from) and builds deterministically;
        v1/v2 stay untouched by the v3 extension."""
        from yondx.eval.heldout import (SUITES, build_scene, _photo,
                                        HELDOUT_SCENES,
                                        HELDOUT_SCENES_V2_EXTRA)
        assert SUITES["v3"][:len(SUITES["v2"])] == SUITES["v2"]
        photo = [s for s in SUITES["v3"] if s.kind == "photo"]
        assert len(photo) == 3
        img = _photo(np.random.default_rng(0))
        assert img.shape == (512, 512, 3) and img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0
        c1, n1 = build_scene(photo[0], n_crops=2)
        c2, n2 = build_scene(photo[0], n_crops=2)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(n1, n2)
        assert len(SUITES["v2"]) == len(HELDOUT_SCENES) + len(
            HELDOUT_SCENES_V2_EXTRA)

    def test_suite_covers_bands_and_disjoint_probe(self):
        from yondx.eval.heldout import HELDOUT_SCENES
        names = {s.name for s in HELDOUT_SCENES}
        assert any(n.endswith("_lo") for n in names)
        assert any(n.endswith("_mid") for n in names)
        assert "satdisk_lo" in names and "satdisk_mid" in names
        # the chart anchor is present but flagged out of the held-out mean
        anchor = [s for s in HELDOUT_SCENES if s.name == "chart_anchor"]
        assert anchor and not anchor[0].heldout
        held = [s for s in HELDOUT_SCENES if s.heldout]
        assert len(held) >= 12
