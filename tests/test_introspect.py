"""Scene memory accounting + BVH graphviz dump (reference printInfo /
SceneBVH::printGraph parity, SURVEY §5 observability)."""
import numpy as np

from cudatracerlib_tpu.utils import example_scenes, introspect


def test_memory_stats_cover_scene():
    scene = example_scenes.cornell_box(16, 16).build()
    st = introspect.scene_memory_stats(scene)
    assert st["total"] > 0
    assert any(k.endswith("wide") for k in st)          # BVH table present
    assert st["total"] == sum(v for k, v in st.items() if k != "total")
    txt = introspect.format_memory_stats(st)
    assert "TOTAL" in txt and "geom" in txt


def test_bvh_graphviz_walks_tree():
    scene = example_scenes.cornell_box(16, 16).build()
    dot = introspect.bvh_to_graphviz(np.asarray(scene.geom.wide))
    assert dot.startswith("digraph") and dot.endswith("}")
    assert "leaf" in dot and "->" in dot
    # every leaf reachable from the root appears with a positive tri count
    import re
    counts = [int(m) for m in re.findall(r"\\n(\d+) tris", dot)]
    assert counts and min(counts) > 0
