"""render_batched (one fused fori_loop dispatch for N passes) must be
bit-identical to N sequential do_pass calls — film, counters and pass_idx.

The fused path exists because per-dispatch transport overhead on the axon
TPU tunnel (~tens of ms) dominates sub-50ms passes; reference analogue is
the persistent render loop in `Kernel/Tracer.h:133-148` which never returns
to the host between passes either.
"""
import numpy as np
import pytest

from cudatracerlib_tpu.models import bdpt as bdptmod
from cudatracerlib_tpu.models import film as filmmod
from cudatracerlib_tpu.models import lighttracer as ltmod
from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.models import prim as primmod
from cudatracerlib_tpu.utils import example_scenes

W = H = 32
N = 3


@pytest.fixture(scope="module")
def scene():
    return example_scenes.cornell_box(W, H).build()


def _assert_batched_matches(make):
    seq, bat = make(), make()
    for _ in range(N):
        seq.do_pass()
    bat.render_batched(N)
    a = np.asarray(filmmod.develop(seq.film))
    b = np.asarray(filmmod.develop(bat.film))
    np.testing.assert_array_equal(a, b)
    assert seq.pass_idx == bat.pass_idx == N
    assert float(seq.film.n_passes) == float(bat.film.n_passes)


def test_pt_batched(scene):
    _assert_batched_matches(lambda: pathmod.PathTracer(scene, W, H,
                                                       max_depth=4))


def test_pt_batched_multichunk_counters(scene):
    mk = lambda: pathmod.PathTracer(scene, W, H, max_depth=4, chunk_size=256)
    seq, bat = mk(), mk()
    assert seq._n_chunks == 4
    for _ in range(N):
        seq.do_pass()
    bat.render_batched(N)
    a = np.asarray(filmmod.develop(seq.film))
    b = np.asarray(filmmod.develop(bat.film))
    np.testing.assert_array_equal(a, b)
    # device-resident bandwidth counters must advance identically
    assert float(seq._rays_dev) == float(bat._rays_dev)
    assert float(seq._iters_dev) == float(bat._iters_dev)
    assert float(seq._rows_dev) == float(bat._rows_dev)


def test_prim_batched(scene):
    _assert_batched_matches(lambda: primmod.PrimTracer(scene, W, H))


def test_lt_batched(scene):
    _assert_batched_matches(lambda: ltmod.LightTracer(scene, W, H))


def test_bdpt_batched(scene):
    _assert_batched_matches(lambda: bdptmod.BDPT(scene, W, H, max_depth=4))
    # BDPT's live-lane counter must also advance in the fused path
    tr = bdptmod.BDPT(scene, W, H, max_depth=4)
    tr.render_batched(2)
    assert float(tr._rays_dev) > 0
