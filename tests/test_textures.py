"""Texture pipeline end-to-end: atlas sampling semantics, .mat texture keys
through scene assembly, JPEG decode, and the reference's own shipped .mat
files (VERDICT round 2, items #3 and #5).

Reference semantics under test: sample_texture (trace_ray.cuh:31-46) --
nearest-neighbor, wrap via mod(uv, 1), texel/255 * material color, applied
to BOTH albedo and emittance (trace_ray.cuh:150-151) -- and load_material's
`texture <path>` key (mesh_loading.cuh:152-219) feeding make_texture
(scene.cuh:25-63, stbi_load of PNG/JPG).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaklm_raytracer_tpu.camera import Camera
from isaklm_raytracer_tpu.config import RenderConfig
from isaklm_raytracer_tpu.integrator.render import render_sample
from isaklm_raytracer_tpu.io.png import load_image, save_png
from isaklm_raytracer_tpu.scene.mat import load_material
from isaklm_raytracer_tpu.scene.procedural import (
    SceneBuilder,
    checker_texture,
    material_demo_scene,
)
from isaklm_raytracer_tpu.scene.texture import TextureRegistry
from isaklm_raytracer_tpu.scene.types import sample_texture

REF_ROOT = "/root/reference/isaklm-raytracer"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "materials")),
    reason="reference checkout not mounted",
)


# ---------------------------------------------------------------------------
# sample_texture unit semantics
# ---------------------------------------------------------------------------


def _atlas_from(*arrays):
    reg = TextureRegistry()
    for a in arrays:
        reg.add_array(a)
    return reg.build()


class TestSampleTexture:
    def test_nearest_and_scale(self):
        # 2x2 texture with distinct corners; uv in cell interiors must fetch
        # the exact texel (nearest), scaled by the material color.
        tex = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
            np.uint8,
        )
        atlas = _atlas_from(tex)
        uv = jnp.array([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
        color = jnp.full((4, 3), 0.5)
        got = sample_texture(atlas, jnp.zeros(4, jnp.int32), color, uv)
        # row = int(v*h): v=0.25 -> texture row 0 (buffer order = image rows)
        want = (
            np.array(
                [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]],
                np.float32,
            )
            / 255.0
            * 0.5
        )
        np.testing.assert_allclose(np.asarray(got), want)

    def test_wrap_mode(self):
        tex = np.array([[[10, 20, 30], [200, 210, 220]]], np.uint8)  # 1x2
        atlas = _atlas_from(tex)
        ones = jnp.ones((3, 3))
        # u = 0.1, 1.1, -0.9 all wrap to the same texel (mod 1 semantics,
        # trace_ray.cuh:36-37)
        uv = jnp.array([[0.1, 0.5], [1.1, 0.5], [-0.9, 0.5]])
        got = np.asarray(sample_texture(atlas, jnp.zeros(3, jnp.int32), ones, uv))
        np.testing.assert_allclose(got[1], got[0])
        np.testing.assert_allclose(got[2], got[0])

    def test_no_texture_passthrough(self):
        atlas = _atlas_from(checker_texture())
        color = jnp.array([[0.3, 0.6, 0.9]])
        got = sample_texture(
            atlas, jnp.array([-1], jnp.int32), color, jnp.array([[0.5, 0.5]])
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(color))

    def test_multi_texture_atlas_offsets(self):
        # Two textures in one atlas: ids must address disjoint buffer ranges.
        a = np.full((2, 2, 3), 50, np.uint8)
        b = np.full((4, 4, 3), 180, np.uint8)
        atlas = _atlas_from(a, b)
        ones = jnp.ones((2, 3))
        uv = jnp.array([[0.5, 0.5], [0.5, 0.5]])
        got = np.asarray(sample_texture(atlas, jnp.array([0, 1]), ones, uv))
        np.testing.assert_allclose(got[0], 50.0 / 255.0)
        np.testing.assert_allclose(got[1], 180.0 / 255.0)


# ---------------------------------------------------------------------------
# hit-attribute path: texture modulates albedo/emittance at the hit point
# ---------------------------------------------------------------------------


def test_hit_attributes_fetch_texels():
    from isaklm_raytracer_tpu.accel import prepare_scene
    from isaklm_raytracer_tpu.accel.traverse import hit_attributes, nearest_hit_brute

    reg = TextureRegistry()
    tid = reg.add_array(checker_texture(tiles=2, size=4))  # 2x2 checker
    b = SceneBuilder()
    m = b.add_material(albedo=(1.0, 1.0, 1.0), roughness=0.5, ior=1.3, tex_id=tid)
    # unit quad in the z=0 plane, uv = xy
    b.add_quad((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0), m, uv=True)
    scene = prepare_scene(b.build(textures=reg.build()))

    # straight-on rays at the four cell centers (uv = position.xy here)
    centers = np.array(
        [[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]], np.float32
    )
    o = jnp.asarray(np.c_[centers, np.full(4, -1.0, np.float32)])
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))
    t, idx, hit = nearest_hit_brute(o, d, scene.vertices)
    assert bool(hit.all())
    attrs = hit_attributes(scene, o, d, idx, hit)
    lum = np.asarray(attrs.albedo).mean(axis=1)
    # checker parity: (0,0) and (1,1) cells share a color, (1,0)/(0,1) the other
    assert lum[0] == pytest.approx(lum[3])
    assert lum[1] == pytest.approx(lum[2])
    assert abs(lum[0] - lum[1]) > 0.5  # 40/255 vs 230/255


def test_render_shows_checker_pattern():
    """Full integrator end-to-end: an emissive checkered quad renders as a
    checkerboard (emittance is texture-modulated, trace_ray.cuh:150-151)."""
    reg = TextureRegistry()
    tid = reg.add_array(checker_texture(tiles=4, size=16, c0=(25, 25, 25), c1=(250, 250, 250)))
    b = SceneBuilder()
    m = b.add_material(
        albedo=(0.5, 0.5, 0.5), emittance=(10.0, 10.0, 10.0), roughness=0.5,
        ior=1.2, tex_id=tid,
    )
    # quad at z=0 spanning [-1,1]^2, facing the camera at z=-1
    b.add_quad((-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0), m, uv=True)
    scene = b.build(textures=reg.build())

    config = RenderConfig(width=32, height=32, max_bounces=2)
    camera = Camera.create((0.0, 0.0, -1.0), fov=jnp.pi / 2)
    rad = render_sample(scene, camera, jax.random.PRNGKey(0), config)
    img = np.asarray(rad).reshape(32, 32, 3).mean(axis=2)

    # tile centers: 4x4 tiles -> every 8 px, center at 4 + 8k
    samples = img[4::8, 4::8]  # (4, 4) luminance at tile centers
    parity = (np.add.outer(np.arange(4), np.arange(4)) % 2).astype(bool)
    bright = samples[parity].mean()
    dark = samples[~parity].mean()
    lo, hi = min(bright, dark), max(bright, dark)
    assert hi > 5 * lo  # 250 vs 25 texels -> 10x emitted radiance contrast
    # and each parity class is internally uniform (primary-hit emittance is
    # noise-free away from tile borders)
    for cls in (samples[parity], samples[~parity]):
        assert cls.std() / cls.mean() < 0.2


def test_demo_scene_is_textured():
    """The default bench scene (configs[2] 'textured, adaptive + ACES') must
    actually carry a texture and differ from its untextured variant."""
    s_tex = material_demo_scene(textured=True)
    s_plain = material_demo_scene(textured=False)
    assert int(s_tex.materials.tex_id.max()) >= 0
    assert s_tex.textures.buffer.shape[0] > 1
    assert int(s_plain.materials.tex_id.max()) == -1

    config = RenderConfig(width=24, height=24, max_bounces=3)
    camera = Camera.create((0.0, 1.2, -1.8), pitch=0.15, fov=jnp.pi / 2)
    key = jax.random.PRNGKey(5)
    a = np.asarray(render_sample(s_tex, camera, key, config))
    c = np.asarray(render_sample(s_plain, camera, key, config))
    assert not np.allclose(a, c)  # texture visibly changes the image


# ---------------------------------------------------------------------------
# .mat texture keys -> scene assembly
# ---------------------------------------------------------------------------


def test_mat_texture_flows_through_create_scene_from_files(tmp_path):
    from isaklm_raytracer_tpu.scene.obj import Transformation, create_scene_from_files

    tex_png = tmp_path / "checker.png"
    save_png(str(tex_png), checker_texture(tiles=2, size=8), flip_vertical=False)

    obj = tmp_path / "tri.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\n"
        "vn 0 0 -1\n"
        "usemtl painted\n"
        "f 1/1/1 2/2/1 3/3/1\n"
    )
    mat = tmp_path / "tri.mat"
    mat.write_text(
        "material painted\n"
        "albedo 1.0 0.5 0.25\n"
        "roughness 0.2\n"
        "n 1.3\n"
        f"texture {tex_png}\n"
    )
    scene = create_scene_from_files(
        [(str(obj), str(mat), Transformation.identity(), False)], build_kd=False
    )
    tex_ids = np.asarray(scene.materials.tex_id)
    assert (tex_ids >= 0).any(), ".mat texture key did not reach the material table"
    assert scene.textures.buffer.shape[0] == 8 * 8
    # the triangle's own material row is the textured one
    tri_mat = int(np.asarray(scene.mat_id)[0])
    assert tex_ids[tri_mat] >= 0


# ---------------------------------------------------------------------------
# decode: the reference's own textures (JPEG + PNG)
# ---------------------------------------------------------------------------


@needs_reference
@pytest.mark.parametrize(
    "name,size",
    [("chair_wood.jpg", 900), ("desk.jpg", None), ("wall.png", None),
     ("emissive_gradient.png", None), ("chair_textile.png", None),
     ("simple_chair.png", None), ("table.png", None)],
)
def test_decode_reference_textures(name, size):
    """Every texture the reference scene ships (PNG and JPEG) must decode --
    stb_image parity (scene.cuh:25-63)."""
    path = os.path.join(REF_ROOT, "textures", name)
    if not os.path.exists(path):
        pytest.skip(f"{name} stripped from checkout")
    img = load_image(path)
    assert img.ndim == 3 and img.shape[2] == 4 and img.dtype == np.uint8
    if size is not None:
        assert img.shape[0] == size
    assert img[..., :3].std() > 0  # actual content, not a constant field


@needs_reference
def test_reference_textures_register():
    reg = TextureRegistry()
    i = reg.load(os.path.join(REF_ROOT, "textures", "chair_wood.jpg"))
    j = reg.load(os.path.join(REF_ROOT, "textures", "chair_wood.jpg"))
    assert i == j  # dedup by path (lazy per-mesh loads, mesh_loading.cuh:290-298)
    atlas = reg.build()
    assert atlas.buffer.shape[0] == 900 * 900


# ---------------------------------------------------------------------------
# the reference's 12 shipped .mat files (parity, VERDICT item #5)
# ---------------------------------------------------------------------------

# (file, material, expected-fields) transcribed from
# /root/reference/isaklm-raytracer/materials/*.mat
REF_MATERIALS = [
    ("chair.mat", "wood",
     dict(albedo=(0.9, 0.9, 0.9), roughness=0.2, ior=1.6),
     "textures/chair_wood.jpg"),
    ("chair.mat", "textile",
     dict(albedo=(1.0, 1.0, 1.0), roughness=0.6, ior=1.3),
     "textures/chair_textile.png"),
    ("chair.mat", "aluminum",
     dict(albedo=(0.972, 0.96, 0.915), roughness=0.02, ior=1.1978,
          extinction=7.0488), None),
    ("cheburashka.mat", "cheburashka",
     dict(albedo=(0.9, 0.96, 0.96), roughness=0.005, ior=1.5,
          transparent=1.0), None),
    ("desk.mat", "desk",
     dict(albedo=(1.0, 1.0, 1.0), roughness=0.05, ior=1.55),
     "textures/desk.jpg"),
    ("dragon.mat", "dragon",
     dict(albedo=(0.9709, 0.7429, 0.3268), roughness=0.01, ior=0.27732,
          extinction=2.9278), None),
    ("glass.mat", "glass",
     dict(albedo=(0.995, 0.995, 0.995), roughness=0.001, ior=1.51,
          transparent=1.0), None),
    ("happy_buddha.mat", "happy_buddha",
     dict(albedo=(0.9, 0.2, 0.5), roughness=0.1, ior=3.2), None),
    ("horse.mat", "horse",
     dict(albedo=(0.9709, 0.7429, 0.3268), roughness=0.2, ior=0.27732,
          extinction=2.9278), None),
    ("house.mat", "house",
     dict(albedo=(1.0, 1.0, 1.0), roughness=0.3, ior=1.25),
     "textures/house.png"),
    ("outlet.mat", "outlet",
     dict(albedo=(0.9, 0.9, 0.8), roughness=0.1, ior=2.2), None),
    ("room.mat", "walls",
     dict(albedo=(1.0, 1.0, 1.0), roughness=0.2, ior=1.25),
     "textures/wall.png"),
    ("room.mat", "floor",
     dict(albedo=(1.0, 1.0, 1.0), roughness=0.05, ior=1.6),
     "textures/wood_floor.png"),
    ("room.mat", "ceiling_lamp",
     dict(albedo=(0.972, 0.96, 0.915), roughness=0.02, ior=1.1978,
          extinction=7.0488), None),
    ("room.mat", "emissive",
     dict(albedo=(0.7, 0.7, 0.7), emittance=(100.0, 90.0, 65.0),
          roughness=0.2, ior=1.2), "textures/emissive_gradient.png"),
    ("simple_chair.mat", "wood",
     dict(albedo=(1.0, 1.0, 1.0), roughness=0.2, ior=1.5),
     "textures/simple_chair.png"),
    ("table.mat", "table",
     dict(albedo=(1.0, 1.0, 1.0), roughness=0.1, ior=1.5),
     "textures/table.png"),
]


@needs_reference
@pytest.mark.parametrize(
    "fname,mname,expect,texture",
    REF_MATERIALS,
    ids=[f"{f}:{m}" for f, m, _, _ in REF_MATERIALS],
)
def test_reference_mat_files(fname, mname, expect, texture):
    """Parse every material of every .mat file the reference ships and pin
    the parsed values (mesh_loading.cuh:152-219 parity on real assets --
    includes the UTF-8 BOM line in chair.mat and files without trailing
    newlines)."""
    seen = []

    def loader(path):
        seen.append(path)
        return len(seen) - 1

    got = load_material(
        os.path.join(REF_ROOT, "materials", fname), mname, texture_loader=loader
    )
    defaults = dict(
        albedo=(0.0, 0.0, 0.0), emittance=(0.0, 0.0, 0.0), roughness=0.0,
        ior=0.0, extinction=0.0, transparent=0.0,
    )
    defaults.update(expect)
    for k, want in defaults.items():
        np.testing.assert_allclose(
            got[k], want, rtol=1e-6, err_msg=f"{fname}:{mname} field {k}"
        )
    if texture is None:
        assert got["tex_id"] == -1 and not seen
    else:
        assert seen == [texture]
        assert got["tex_id"] == 0


@needs_reference
def test_missing_material_yields_defaults():
    """Unknown material name falls through to all-zero defaults, like the
    reference's untouched `Material material{}` (mesh_loading.cuh:154)."""
    got = load_material(
        os.path.join(REF_ROOT, "materials", "glass.mat"), "no_such_material"
    )
    assert got["albedo"] == (0.0, 0.0, 0.0)
    assert got["ior"] == 0.0 and got["tex_id"] == -1
