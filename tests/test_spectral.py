"""Hero-wavelength spectral transport (reference Math/Spectrum.h:10-15:
compile-switchable N-sample TSpectrum; redesigned as per-path wavelength
sampling with a fitted exact-round-trip spectral-primary basis —
core/spectrum.py, models/path.py spectral=C)."""
import jax.numpy as jnp
import numpy as np

from cudatracerlib_tpu.core import spectrum as sp


def test_round_trip_neutrals_exact():
    """White/grey/black RGB -> spectral -> XYZ -> RGB must round-trip (the
    white calibration pins the neutral axis; the fitted partition-of-unity
    basis maps neutrals to flat spectra)."""
    lam = jnp.broadcast_to(jnp.linspace(380.0, 719.9, 2048)[None, :],
                           (1, 2048))
    for v in (1.0, 0.5, 0.18, 0.0):
        rgb = jnp.full((1, 3), v, jnp.float32)
        s = sp.rgb_to_spectral(rgb, lam)
        back = np.asarray(sp.spectral_to_rgb(s, lam, 720.0 - 380.0))[0]
        np.testing.assert_allclose(back, v, atol=1e-3)


def test_round_trip_colors_exact():
    lam = jnp.broadcast_to(jnp.linspace(380.0, 719.9, 2048)[None, :],
                           (1, 2048))
    for rgb in ([0.8, 0.2, 0.1], [0.1, 0.5, 0.9], [0.2, 0.7, 0.3],
                [0.6, 0.6, 0.1], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0]):
        r = jnp.asarray([rgb], jnp.float32)
        s = sp.rgb_to_spectral(r, lam)
        assert float(jnp.min(s)) >= 0.0          # physical reflectance
        back = np.asarray(sp.spectral_to_rgb(s, lam, 720.0 - 380.0))[0]
        # fitted basis: saturated colors round-trip to ~0.1% (Smits was ~10%)
        np.testing.assert_allclose(back, rgb, atol=2e-3)
        # the Smits reference basis is kept and stays within its ~10%
        s2 = sp.rgb_to_spectral_smits(r, lam)
        back2 = np.asarray(sp.spectral_to_rgb(s2, lam, 720.0 - 380.0))[0]
        np.testing.assert_allclose(back2, rgb, atol=0.15)


def test_cmf_fit_shape():
    """Wyman-fit CMFs peak near the CIE 1931 peaks and vanish at the edges."""
    lam = jnp.linspace(380.0, 720.0, 1000)
    cmf = np.asarray(sp.cie_xyz_cmf(lam))
    lam = np.asarray(lam)
    assert abs(lam[cmf[:, 0].argmax()] - 599.0) < 10    # xbar ~ 599nm
    assert abs(lam[cmf[:, 1].argmax()] - 555.0) < 10    # ybar ~ 555nm
    assert abs(lam[cmf[:, 2].argmax()] - 446.0) < 10    # zbar ~ 446nm
    assert cmf[0].max() < 0.25 and cmf[-1].max() < 0.05


def test_hero_wavelengths_stratified():
    u = jnp.asarray([0.0, 0.25, 0.999])
    lam, pdf = sp.sample_hero_wavelengths(u, 4)
    lam = np.asarray(lam)
    assert lam.shape == (3, 4)
    assert (lam >= 380.0).all() and (lam <= 720.0).all()
    # companions are rotations by span/4
    span = 720.0 - 380.0
    d = np.sort((lam[1] - 380.0) % span)
    np.testing.assert_allclose(np.diff(d), span / 4, atol=1e-3)
    assert abs(pdf - 1.0 / span) < 1e-9


def test_spectral_pt_matches_rgb_on_cornell():
    """Cornell box: hero-wavelength transport must agree with the RGB path
    (multi-bounce products of upsampled spectra differ from RGB products by
    the physically-correct metamer gap — a few % on saturated walls)."""
    from cudatracerlib_tpu.models import path as pathmod
    from cudatracerlib_tpu.utils import example_scenes

    w = h = 24
    scene = example_scenes.cornell_box(w, h).build()
    rgb = pathmod.PathTracer(scene, w, h, max_depth=4, chunk_size=w * h)
    im1 = np.asarray(rgb.render(n_passes=24))
    spec = pathmod.PathTracer(scene, w, h, max_depth=4, chunk_size=w * h,
                              spectral=4)
    im2 = np.asarray(spec.render(n_passes=24))
    assert np.isfinite(im2).all()
    m1, m2 = im1.mean((0, 1)), im2.mean((0, 1))
    np.testing.assert_allclose(m2, m1, rtol=0.12)
    assert abs(im2.mean() - im1.mean()) / im1.mean() < 0.08
