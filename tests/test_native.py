"""Native C++ components vs their Python oracles: identical output."""

import numpy as np
import pytest

from isaklm_raytracer_tpu.accel.kdtree import build_kd_tree
from isaklm_raytracer_tpu.native import kd_build_native, obj_parse_native
from isaklm_raytracer_tpu.scene.obj import load_mesh
from isaklm_raytracer_tpu.scene.procedural import cornell_box, triangle_soup

native_available = kd_build_native(np.zeros((1, 3, 3), np.float32), 2, 1) is not None
pytestmark = pytest.mark.skipif(
    not native_available, reason="native toolchain unavailable"
)


@pytest.mark.parametrize("scene_fn,kwargs", [
    (lambda: cornell_box(), dict(max_depth=8, leaf_size=4)),
    (lambda: triangle_soup(2000, seed=2), dict(max_depth=19, leaf_size=7)),
])
def test_kd_native_matches_python(scene_fn, kwargs):
    vertices = np.asarray(scene_fn().vertices)
    py = build_kd_tree(vertices, use_native=False, **kwargs)
    nat = build_kd_tree(vertices, use_native=True, **kwargs)
    np.testing.assert_array_equal(np.asarray(py.child_a), np.asarray(nat.child_a))
    np.testing.assert_array_equal(np.asarray(py.child_b), np.asarray(nat.child_b))
    np.testing.assert_array_equal(np.asarray(py.axis), np.asarray(nat.axis))
    np.testing.assert_array_equal(np.asarray(py.plane), np.asarray(nat.plane))
    np.testing.assert_array_equal(np.asarray(py.is_leaf), np.asarray(nat.is_leaf))
    np.testing.assert_array_equal(
        np.asarray(py.tri_indices), np.asarray(nat.tri_indices)
    )
    np.testing.assert_allclose(np.asarray(py.bbox_min), np.asarray(nat.bbox_min))
    np.testing.assert_allclose(np.asarray(py.bbox_max), np.asarray(nat.bbox_max))


OBJ_BODY = """v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vn 0 0 0
vn 0 0 1
vt 0.25 0.75
vt 0.5 0.5
usemtl a
f 1/1/2 2/2/2 3//2 4
f -5 -4 -1
usemtl b
f 1//1 2 3
f 1 2 5
"""


def test_obj_native_matches_python(tmp_path):
    obj = tmp_path / "m.obj"
    obj.write_text(OBJ_BODY)
    mat = tmp_path / "m.mat"
    mat.write_text("material a\nalbedo 1 0 0\n\nmaterial b\nalbedo 0 1 0\n")
    py = load_mesh(str(obj), str(mat), use_native=False)
    nat = load_mesh(str(obj), str(mat), use_native=True)
    assert py.material_names == nat.material_names
    np.testing.assert_allclose(py.vertices, nat.vertices, atol=1e-6)
    np.testing.assert_allclose(py.normals, nat.normals, atol=1e-6)
    np.testing.assert_allclose(py.uvs, nat.uvs, atol=1e-6)


def test_obj_native_raw_parse(tmp_path):
    obj = tmp_path / "m.obj"
    obj.write_text(OBJ_BODY)
    parsed = obj_parse_native(str(obj))
    assert parsed["positions"].shape == (5, 3)
    assert parsed["normals"].shape == (2, 3)
    # quad fan = 2 tris, negative-index tri, 1 skipped (false normal), 1 more
    assert parsed["face_pos"].shape[0] == 4
    assert parsed["mat_names"] == ["a", "b"]
    # v-flip applied
    np.testing.assert_allclose(parsed["uvs"][0], [0.25, 0.25], atol=1e-6)


def test_kd_native_speed_hint():
    # sanity: native path builds a 50k-triangle tree quickly
    import time

    vertices = np.asarray(triangle_soup(50_000, seed=1).vertices)
    t0 = time.time()
    build_kd_tree(vertices, use_native=True)
    assert time.time() - t0 < 30.0
