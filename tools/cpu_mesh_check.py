"""Verify the round-5 sharded-film layouts on the virtual 8-device CPU mesh.

Checks (VERDICT r4 #7):
  1. row-sharded PT pass runs with check_vma=True and its HLO contains ZERO
     cross-chip collectives;
  2. its film matches the legacy replicated psum layout exactly;
  3. LT/BDPT splat-parts accumulation + one fold_splat_parts equals the
     legacy per-pass psum exactly.

Run: python tools/cpu_mesh_check.py
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ctl_tests")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cudatracerlib_tpu.models import film as filmmod  # noqa: E402
from cudatracerlib_tpu.parallel import render as prender  # noqa: E402
from cudatracerlib_tpu.utils import example_scenes  # noqa: E402


def main():
    w = h = 16
    scene = example_scenes.cornell_box(w, h).build()
    mesh = prender.make_mesh()
    assert mesh.shape["tiles"] == 8, mesh
    scene_r = prender.replicate_scene(scene, mesh)
    film0 = filmmod.new_film(w, h)

    # 1+2: row-sharded vs replicated PT
    out = prender.sharded_pt_pass(scene_r, film0, jnp.int32(0), mesh, w, h,
                                  max_depth=2, reduce_film=False)
    ref = prender.sharded_pt_pass(scene_r, film0, jnp.int32(0), mesh, w, h,
                                  max_depth=2, reduce_film=True)
    d = float(jnp.abs(out.rgb - ref.rgb).max())
    assert d == 0.0, f"row-sharded PT != replicated PT (max diff {d})"
    print("PT row-sharded == replicated: exact")

    # HLO collective audit: the row-sharded pass must have NO cross-chip ops
    from functools import partial
    import re
    fspec = prender._film_specs("tiles")
    lowered = jax.jit(
        partial(prender.sharded_pt_pass, mesh=mesh, w=w, h=h, max_depth=2,
                reduce_film=False),
        static_argnames=()).lower(scene_r, film0, jnp.int32(0)) \
        if False else None
    # sharded_pt_pass jits internally; audit via make_jaxpr on the public fn
    # is blocked by host_meta's concrete reads — compile the pass and scan
    # the compiled HLO of the executable cached by the last call instead:
    txt = jax.jit(lambda s, f, p: prender.sharded_pt_pass(
        s, f, p, mesh, w, h, max_depth=2, reduce_film=False))  # noqa: F841
    # simplest reliable audit: lower the inner shard_map body by re-running
    # with a trace hook is overkill; compare collective counts via profiling
    # is unavailable on CPU. Use the public API: jax.jit(...).lower needs
    # concrete scene, so wrap with closure over the already-built scene.
    low = jax.jit(lambda f, p: prender.sharded_pt_pass(
        scene_r, f, p, mesh, w, h, max_depth=2, reduce_film=False)
    ).lower(film0, jnp.int32(0))
    hlo = low.compile().as_text()
    bad = [op for op in ("all-reduce", "all-gather", "collective-permute",
                         "all-to-all", "reduce-scatter")
           if re.search(rf"\b{op}\b", hlo)]
    assert not bad, f"row-sharded PT HLO contains collectives: {bad}"
    print("PT row-sharded HLO: zero collectives", flush=True)

    low_rep = jax.jit(lambda f, p: prender.sharded_pt_pass(
        scene_r, f, p, mesh, w, h, max_depth=2, reduce_film=True)
    ).lower(film0, jnp.int32(0))
    n_ar = low_rep.compile().as_text().count("all-reduce-start")
    print(f"PT replicated-film HLO: {n_ar} all-reduce(s) per pass "
          f"(the traffic the sharded layout removes)", flush=True)

    # 3: LT parts vs legacy psum
    parts = prender.new_splat_parts(mesh, w, h)
    parts = prender.sharded_lt_pass(scene_r, film0, jnp.int32(0), mesh, w, h,
                                    max_depth=2, splat_parts=parts)
    folded = prender.fold_splat_parts(film0, parts)
    ref_lt = prender.sharded_lt_pass(scene_r, film0, jnp.int32(0), mesh, w, h,
                                     max_depth=2)
    d = float(jnp.abs(folded.splat - ref_lt.splat).max())
    assert d == 0.0, f"LT parts fold != psum (max diff {d})"
    print("LT splat-parts fold == per-pass psum: exact")

    # 4: BDPT parts vs legacy psum
    parts = prender.new_splat_parts(mesh, w, h)
    fb, parts = prender.sharded_bdpt_pass(scene_r, film0, jnp.int32(0), mesh,
                                          w, h, max_depth=2,
                                          splat_parts=parts)
    folded = prender.fold_splat_parts(fb, parts)
    ref_bd = prender.sharded_bdpt_pass(scene_r, film0, jnp.int32(0), mesh,
                                       w, h, max_depth=2)
    for name in ("rgb", "weight", "splat"):
        d = float(jnp.abs(getattr(folded, name) - getattr(ref_bd, name)).max())
        assert d == 0.0, f"BDPT parts {name} != psum (max diff {d})"
    print("BDPT row-sharded + splat-parts fold == per-pass psum: exact")
    print("cpu_mesh_check: ALL OK")


if __name__ == "__main__":
    main()
