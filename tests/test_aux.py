"""Aux subsystems: params, timers, debug visualizers, FastTracer, GameTracer."""
import numpy as np
import pytest

from cudatracerlib_tpu.models import fast, game
from cudatracerlib_tpu.utils import debug_viz, params, timers
from cudatracerlib_tpu.utils import example_scenes


class TestParams:
    def test_typed_constraints(self):
        import enum
        class Mode(enum.Enum):
            A = 0
            B = 1
        c = params.ParameterCollection("root")
        c.add("depth", 8, lo=1, hi=64).add("rr", True).add("mode", Mode.A)
        sub = params.ParameterCollection("photon").add("count", 10000, lo=1)
        c.add_child(sub)
        c.set("depth", "12")
        assert c.get("depth") == 12
        c.set("photon.count", 5)
        assert c.get("photon.count") == 5
        c.set("mode", "B")
        assert c.get("mode") == Mode.B
        try:
            c.set("depth", 100)
            assert False
        except ValueError:
            pass
        params.apply_arguments(c, "depth=4 rr=false")
        assert c.get("depth") == 4 and c.get("rr") is False
        assert "photon.count" in c and "nope" not in c

    def test_enum_reflection(self):
        import enum
        class E(enum.Enum):
            FOO = 1
            BAR = 2
        assert params.EnumConverter.from_string(E, "BAR") == E.BAR
        assert params.EnumConverter.to_string(E.FOO) == "FOO"
        assert params.EnumConverter.names(E) == ["FOO", "BAR"]


def test_timers():
    pt = timers.PerformanceTimer()
    with pt.block("x"):
        sum(range(1000))
    assert pt.totals["x"] > 0
    assert "x:" in pt.report()


def test_debug_viz():
    dv = debug_viz.DebugVisualizerManager(8, 8)
    dv.record("depth", np.random.default_rng(0).random((8, 8)))
    hm = dv.heatmap("depth")
    assert hm.shape == (8, 8, 3) and np.isfinite(hm).all()
    dv.record("n", np.random.default_rng(1).normal(size=(8, 8, 3)))
    vmap = dv.vector_map("n")
    assert vmap.min() >= 0 and vmap.max() <= 1


def test_fast_tracer():
    scene = example_scenes.cornell_box(32, 32).build()
    tr = fast.FastTracer(scene, 32, 32, mode=fast.MODE_DEPTH)
    img = np.asarray(tr.render(1))
    assert img.max() > 0 and np.isfinite(img).all()


@pytest.mark.slow
def test_game_tracer():
    scene = example_scenes.cornell_box(32, 32).build()
    tr = game.GameTracer(scene, 32, 32)
    img1 = np.asarray(tr.render(1))
    img2 = np.asarray(tr.render(1))  # temporal blend pass
    assert np.isfinite(img2).all()
    assert img2.mean() > 0.01


def test_alias_table_matches_pmf():
    """Vose alias tables (scene/alias.py): empirical draw frequencies match
    the target pmf, and stored pmfs are exact."""
    import numpy as np
    from cudatracerlib_tpu.scene import alias as aliasmod

    rng = np.random.default_rng(7)
    w = rng.random(257).astype(np.float32) ** 3  # spiky
    t = aliasmod.build_alias_table(w)
    pmf = w / w.sum()
    np.testing.assert_allclose(t[:, 2], pmf, rtol=1e-5)
    # alias invariant: prob[i] + sum of (1-prob[j]) over j aliasing to i
    # reconstructs n*pmf[i]
    n = w.size
    alias = t[:, 1].view(np.int32)
    recon = t[:, 0].copy()
    for j in range(n):
        if alias[j] != j:
            recon[alias[j]] += 1.0 - t[j, 0]
    np.testing.assert_allclose(recon, n * pmf, atol=1e-4)
    # empirical frequencies
    u = rng.random((200000, 2))
    slot = np.minimum((u[:, 0] * n).astype(np.int64), n - 1)
    pick = np.where(u[:, 1] < t[slot, 0], slot, alias[slot])
    freq = np.bincount(pick, minlength=n) / u.shape[0]
    assert np.abs(freq - pmf).max() < 0.004


def test_overlay_drawer_projects_and_draws():
    """IDebugDrawer parity (PixelDebugVisualizer.h:15-50): world-space
    lines/frames/ellipses rasterize onto the image through the sensor."""
    import numpy as np
    from cudatracerlib_tpu.utils import debug_viz, example_scenes

    sc = example_scenes.cornell_box(64, 64, spheres=False)
    sensor = sc._sensor
    img = np.zeros((64, 64, 3), np.float32)
    dr = debug_viz.OverlayDrawer(img, sensor)
    # the look-at target (origin) projects to the image center
    pr, ok = dr.project(np.zeros((1, 3)))
    assert ok.all()
    assert abs(pr[0, 0] - 32) < 1.5 and abs(pr[0, 1] - 32) < 1.5
    # a point behind the camera is rejected
    _, ok2 = dr.project(np.array([[0.0, 0.0, -10.0]]))
    assert not ok2.any()
    dr.draw_line([-0.5, 0.0, 0.0], [0.5, 0.0, 0.0], color=(1, 0, 0))
    dr.draw_frame([0.0, -1.0, 0.0], [0.0, 1.0, 0.0], scale=0.3)
    dr.draw_ellipse([0.0, 0.0, 0.0], [0.3, 0, 0], [0, 0.3, 0])
    assert (dr.img.sum(-1) > 0).sum() > 50    # plenty of pixels touched
    assert img.sum() == 0.0                   # original untouched
