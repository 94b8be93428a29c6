"""Per-light alias-table emitter-triangle selection (schema.LightTable.al_alias).

The O(1) alias draw must reproduce the area-weighted triangle pmf that the
ranged binary CDF search (`_ranged_cdf_search`) samples — the pmf cancels
against uniform-barycentric 1/area in every caller, so a wrong table biases
NEE/light-tracing silently. Pin both samplers against the analytic pmf on a
sphere light whose pole triangles are much smaller than its equator ones.
Matches reference `Engine/Light.h` DiffuseLight's area-CDF triangle pick.
"""
import numpy as np
import jax.numpy as jnp

from cudatracerlib_tpu.models import lights as lightsmod
from cudatracerlib_tpu.utils import example_scenes


def _light_pmf_and_range(scene, light_row):
    lt = scene.lights
    first = int(lt.al_first[light_row])
    count = int(lt.al_count[light_row])
    rows = np.asarray(lt.al_rows[first:first + count])  # [p0, e1, e2, ...]
    areas = 0.5 * np.linalg.norm(
        np.cross(rows[:, 3:6], rows[:, 6:9]), axis=-1)
    return areas / areas.sum(), first, count


def _hist(ai, first, count):
    h = np.bincount(np.asarray(ai) - first, minlength=count)
    return h / h.sum()


def test_alias_matches_area_pmf_and_cdf_search():
    scene = example_scenes.veach_mis(32, 32).build()
    assert scene.lights.al_alias is not None
    # the biggest sphere light: strongly varying tri areas (poles vs equator)
    light_row = 3
    pmf, first, count = _light_pmf_and_range(scene, light_row)
    assert count > 100 and pmf.max() / pmf.min() > 2.0  # non-trivial pmf

    B = 1 << 17
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.random(B, dtype=np.float32))
    f = jnp.full((B,), first, jnp.int32)
    c = jnp.full((B,), count, jnp.int32)

    ai_alias = lightsmod._sample_area_tri(scene.lights, f, c, u)
    ai_cdf = lightsmod._ranged_cdf_search(scene.lights.al_cdf, f, c, u)
    for ai in (ai_alias, ai_cdf):
        a = np.asarray(ai)
        assert a.min() >= first and a.max() < first + count

    tv_alias = 0.5 * np.abs(_hist(ai_alias, first, count) - pmf).sum()
    tv_cdf = 0.5 * np.abs(_hist(ai_cdf, first, count) - pmf).sum()
    # total-variation to the analytic pmf: both samplers within MC noise
    # (~sqrt(count/B) ~ 0.045 expected TV for 528 bins at 131k draws)
    assert tv_alias < 0.08, tv_alias
    assert tv_cdf < 0.08, tv_cdf
    assert abs(tv_alias - tv_cdf) < 0.03


def test_alias_absolute_indices_cover_every_light():
    """Alias rows store ABSOLUTE al_tris indices offset per light — a draw
    from light L must never escape L's [first, first+count) range."""
    scene = example_scenes.veach_mis(32, 32).build()
    B = 4096
    u = jnp.linspace(0.0, 1.0, B).astype(jnp.float32)
    for light_row in range(int(scene.lights.al_first.shape[0])):
        count = int(scene.lights.al_count[light_row])
        if count == 0:
            continue
        first = int(scene.lights.al_first[light_row])
        ai = np.asarray(lightsmod._sample_area_tri(
            scene.lights, jnp.full((B,), first, jnp.int32),
            jnp.full((B,), count, jnp.int32), u))
        assert ai.min() >= first and ai.max() < first + count, light_row
