import os
import tempfile

import numpy as np

from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.models import prim
from cudatracerlib_tpu.scene.loader import mitsuba, obj as objmod, ply as plymod, serialized as sermod
from cudatracerlib_tpu.scene.loader import images

SCENE_XML = """<?xml version="1.0"?>
<scene version="0.5.0">
  <default name="res" value="48"/>
  <integrator type="path">
    <integer name="maxDepth" value="5"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <transform name="toWorld">
      <lookat origin="0, 0.5, -3.2" target="0, 0.5, 0" up="0, 1, 0"/>
    </transform>
    <film type="hdrfilm">
      <integer name="width" value="$res"/>
      <integer name="height" value="$res"/>
    </film>
    <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
  </sensor>

  <bsdf type="twosided" id="white">
    <bsdf type="diffuse"><rgb name="reflectance" value="0.7, 0.7, 0.7"/></bsdf>
  </bsdf>
  <bsdf type="diffuse" id="red"><rgb name="reflectance" value="0.6, 0.05, 0.05"/></bsdf>

  <shape type="rectangle">
    <ref id="white"/>
    <transform name="toWorld">
      <rotate x="1" angle="-90"/><scale value="2"/><translate y="-0.5"/>
    </transform>
  </shape>
  <shape type="sphere">
    <float name="radius" value="0.4"/>
    <point name="center" x="-0.5" y="0.0" z="0"/>
    <ref id="red"/>
  </shape>
  <shape type="cube">
    <bsdf type="roughconductor">
      <string name="material" value="au"/>
      <float name="alpha" value="0.2"/>
    </bsdf>
    <transform name="toWorld">
      <scale value="0.3"/><translate x="0.6" y="-0.2" z="0.3"/>
    </transform>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate x="1" angle="90"/><scale value="0.5"/><translate y="1.9"/>
    </transform>
    <emitter type="area"><rgb name="radiance" value="12, 10, 8"/></emitter>
  </shape>
  <emitter type="constant"><rgb name="radiance" value="0.1, 0.1, 0.15"/></emitter>
</scene>
"""

OBJ_FILE = """
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
usemtl mat1
f 1/1/1 2/2/1 3/3/1
f -4/-4/-1 -2/-2/-1 -1/-1/-1
"""

MTL_FILE = """
newmtl mat1
Kd 0.2 0.4 0.6
Ks 0 0 0
"""


class TestObjLoader:
    def test_quad_with_negative_indices(self, tmp_path):
        (tmp_path / "test.obj").write_text(OBJ_FILE)
        (tmp_path / "test.mtl").write_text(MTL_FILE)
        subs = objmod.load_obj(str(tmp_path / "test.obj"))
        assert len(subs) == 1
        mesh = subs[0].mesh
        assert mesh.f.shape == (2, 3)
        assert subs[0].material.kd == (0.2, 0.4, 0.6)
        np.testing.assert_allclose(mesh.n[0], [0, 0, 1], atol=1e-6)


class TestPlyLoader:
    def test_ascii_ply(self, tmp_path):
        ply = """ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
3 0 1 2
"""
        p = tmp_path / "t.ply"
        p.write_text(ply)
        mesh = plymod.load_ply(str(p))
        assert mesh.v.shape == (3, 3) and mesh.f.shape == (1, 3)

    def test_binary_ply(self, tmp_path):
        import struct
        head = b"""ply
format binary_little_endian 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar uint vertex_indices
end_header
"""
        body = struct.pack("<9f", 0, 0, 0, 1, 0, 0, 0, 1, 0)
        body += struct.pack("<B3I", 3, 0, 1, 2)
        p = tmp_path / "t.ply"
        p.write_bytes(head + body)
        mesh = plymod.load_ply(str(p))
        assert mesh.v.shape == (3, 3) and mesh.f.shape == (1, 3)


class TestSerialized:
    def test_roundtrip(self, tmp_path):
        import struct, zlib
        # hand-build a v3 serialized file with one triangle
        flags = 0x1000  # single precision
        blob = struct.pack("<I", flags)
        blob += struct.pack("<QQ", 3, 1)
        blob += struct.pack("<9f", 0, 0, 0, 1, 0, 0, 0, 1, 0)
        blob += struct.pack("<3I", 0, 1, 2)
        comp = zlib.compress(blob)
        data = struct.pack("<HH", 0x041C, 3) + comp
        data += struct.pack("<I", 0)          # offset of mesh 0
        data += struct.pack("<I", 1)          # mesh count
        p = tmp_path / "m.serialized"
        p.write_bytes(data)
        mesh = sermod.load_serialized(str(p))
        assert mesh.v.shape == (3, 3) and mesh.f.shape == (1, 3)


class TestHdr:
    def test_hdr_roundtrip(self, tmp_path):
        img = np.random.default_rng(0).random((8, 16, 3)).astype(np.float32) * 10
        p = str(tmp_path / "t.hdr")
        images.write_hdr(p, img)
        back = images.load_hdr(p)
        assert back.shape == img.shape
        assert np.abs(back - img).max() / img.max() < 0.02


class TestMitsubaScene:
    def test_load_and_render(self, tmp_path):
        p = tmp_path / "scene.xml"
        p.write_text(SCENE_XML)
        sc, settings = mitsuba.load_mitsuba(str(p))
        assert settings.max_depth == 5
        assert settings.width == 48
        scene = sc.build()
        assert scene.num_tris > 10
        # has an area light + the constant env
        lt = np.asarray(scene.lights.light_type)
        assert (lt == 1).sum() == 1 and (lt == 4).sum() == 1

        tr = pathmod.PathTracer(scene, 48, 48, max_depth=4, spp_per_pass=1)
        img = np.asarray(tr.render(6))
        assert np.isfinite(img).all()
        assert img.mean() > 0.01
        # sphere is red-dominant in its pixels: check aggregate red presence
        aov = prim.PrimTracer(scene, 48, 48, draw_mode=prim.D_ALBEDO)
        alb = np.asarray(aov.render(1))
        reds = (alb[..., 0] > 0.5) & (alb[..., 1] < 0.1)
        assert reds.sum() > 10
