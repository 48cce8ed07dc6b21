"""Analytic Jacobians vs jacfwd reference (SURVEY.md §7.3.3: validate
analytic derivatives against automatic/finite differences)."""

import numpy as np
import jax.numpy as jnp

from textslam_tpu.solver import ba
import sys


def _problem_with_text():
    from __graft_entry__ import _synthetic_problem

    # smooth images so sobel/8 ≈ the bilinear interpolant derivative
    prob = _synthetic_problem(n_kf=3, n_pts=64, obs_per_kf=32, n_text=4,
                              text_feat=8, img_hw=(64, 96), with_text=True)
    I = np.zeros((3, 64, 96), np.float32)
    ys, xs = np.mgrid[0:64, 0:96]
    for k in range(3):
        I[k] = (
            100 + 50 * np.sin(xs / 9.0 + k) * np.cos(ys / 7.0 - k)
            + 0.3 * xs + 0.2 * ys
        )
    gx = np.gradient(I, axis=2) * 8.0
    gy = np.gradient(I, axis=1) * 8.0
    imgs = jnp.asarray(np.stack([I, gx, gy], -1))
    return prob._replace(images=imgs)


class TestSceneJacobians:
    def test_analytic_matches_ad(self):
        from __graft_entry__ import _synthetic_problem

        prob = _synthetic_problem(n_kf=3, n_pts=64, obs_per_kf=64, with_text=False)
        an = ba.scene_terms(prob, 2.447)
        ad = ba.scene_terms_ad(prob, 2.447)
        ok = np.asarray(an["w"]) > 0
        np.testing.assert_allclose(np.asarray(an["r"])[ok], np.asarray(ad["r"])[ok], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(an["J_t"])[ok], np.asarray(ad["J_t"])[ok], rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(an["J_h"])[ok], np.asarray(ad["J_h"])[ok], rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(an["J_l"])[ok], np.asarray(ad["J_l"])[ok], rtol=2e-3, atol=2e-2)


class TestTextJacobians:
    def test_analytic_matches_ad(self):
        prob = _problem_with_text()
        an = ba.text_terms(prob, 3.0)
        ad = ba.text_terms_ad(prob, 3.0)
        ok = np.asarray(an["w"]) > 0
        w = np.asarray(prob.text.weight)[:, None]
        s_ok = np.asarray(ad["sample_ok"])
        # residuals: analytic applies weight*sample mask; apply to ad too
        r_ad = np.asarray(ad["r"]) * w * s_ok
        np.testing.assert_allclose(np.asarray(an["r"])[ok], r_ad[ok], rtol=1e-3, atol=1e-3)
        # Jacobians: sobel/8 vs exact bilinear derivative — loose tolerances,
        # but the directions must agree strongly on smooth images
        for key in ("J_t", "J_h", "J_l"):
            Ja = np.asarray(an[key])[ok]
            Jd = (np.asarray(ad[key]) * (w * s_ok)[..., None])[ok]
            denom = np.abs(Jd).max() + 1e-6
            corr = (Ja * Jd).sum() / (np.linalg.norm(Ja) * np.linalg.norm(Jd) + 1e-9)
            assert corr > 0.98, f"{key} corr {corr}"
            np.testing.assert_allclose(Ja / denom, Jd / denom, atol=0.08)
