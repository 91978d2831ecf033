"""Host-side KD-tree construction (numpy re-derivation).

Reproduces create_kd_tree (create_kd_tree.cuh:162-328) semantics exactly:

  - split axis round-robins depth % 3 (create_kd_tree.cuh:164);
  - split plane = median of per-triangle centroid extents ((min+max)/2)
    along the axis: values sorted, element [n/2] (create_kd_tree.cuh:125-160);
  - triangles overlapping the plane are DUPLICATED into both children
    (behind: min <= plane, afore: max >= plane, create_kd_tree.cuh:59-123);
  - a child becomes a leaf when count <= leaf_size (min_triangle_count = 7,
    create_kd_tree.cuh:222) or depth >= max_depth (KD_TREE_DEPTH = 19,
    macros.h:11); the root is always an inner node;
  - nodes are appended in DFS order (child recorded before recursion), root
    index 0; leaves store (index_offset, count) into one flat index array
    (create_kd_tree.cuh:225-264);
  - the root bounding box is padded by eps = 0.01 (create_kd_tree.cuh:18-57).

The output is the flat SoA `KDTreeArrays` pytree consumed by the JAX/Pallas
traversal. A faster C++ builder with identical output lives in native/; this
numpy version is the semantics oracle.
"""

from __future__ import annotations

import numpy as np

from isaklm_raytracer_tpu.scene.types import KDTreeArrays

BBOX_EPSILON = 0.01  # create_kd_tree.cuh:20


def build_kd_tree(
    vertices: np.ndarray,
    max_depth: int = 19,
    leaf_size: int = 7,
    use_native: bool = True,
) -> KDTreeArrays:
    """vertices: (N, 3, 3) float32 triangle corners.

    Uses the C++ builder (native/kd_builder.cpp, ~50x faster on
    million-triangle scenes) when available; bit-identical output."""
    import jax.numpy as jnp

    vertices = np.asarray(vertices, np.float32)

    if use_native:
        from isaklm_raytracer_tpu.native import kd_build_native

        built = kd_build_native(vertices, max_depth, leaf_size)
        if built is not None:
            return KDTreeArrays(
                child_a=jnp.asarray(built["child_a"]),
                child_b=jnp.asarray(built["child_b"]),
                axis=jnp.asarray(built["axis"]),
                plane=jnp.asarray(built["plane"]),
                is_leaf=jnp.asarray(built["is_leaf"]),
                tri_indices=jnp.asarray(built["tri_indices"]),
                bbox_min=jnp.asarray(built["bbox_min"]),
                bbox_max=jnp.asarray(built["bbox_max"]),
                max_depth=max_depth,
            )
    n = len(vertices)
    tmin = vertices.min(axis=1)  # (N, 3)
    tmax = vertices.max(axis=1)
    mid = (tmin + tmax) * 0.5

    child_a: list[int] = []
    child_b: list[int] = []
    axes: list[int] = []
    planes: list[float] = []
    leaves: list[bool] = []
    tri_indices: list[np.ndarray] = []
    index_count = 0

    def new_node() -> int:
        child_a.append(0)
        child_b.append(0)
        axes.append(0)
        planes.append(0.0)
        leaves.append(False)
        return len(child_a) - 1

    def add_leaf(ids: np.ndarray) -> int:
        nonlocal index_count
        node = new_node()
        leaves[node] = True
        child_a[node] = index_count
        child_b[node] = len(ids)
        tri_indices.append(ids)
        index_count += len(ids)
        return node

    def split(node: int, ids: np.ndarray, depth: int) -> None:
        axis = depth % 3
        vals = np.sort(mid[ids, axis])
        plane = float(vals[len(vals) // 2])

        axes[node] = axis
        planes[node] = float(plane)

        behind = ids[tmin[ids, axis] <= plane]
        afore = ids[tmax[ids, axis] >= plane]

        for which, child_ids in ((0, behind), (1, afore)):
            if len(child_ids) > leaf_size and depth < max_depth:
                child = new_node()
                if which == 0:
                    child_a[node] = child
                else:
                    child_b[node] = child
                split(child, child_ids, depth + 1)
            else:
                child = add_leaf(child_ids)
                if which == 0:
                    child_a[node] = child
                else:
                    child_b[node] = child

    root = new_node()
    all_ids = np.arange(n, dtype=np.int32)
    split(root, all_ids, 0)

    flat_indices = (
        np.concatenate(tri_indices).astype(np.int32)
        if tri_indices
        else np.zeros((0,), np.int32)
    )
    bbox_min = tmin.min(axis=0) - BBOX_EPSILON
    bbox_max = tmax.max(axis=0) + BBOX_EPSILON

    return KDTreeArrays(
        child_a=jnp.asarray(np.asarray(child_a, np.int32)),
        child_b=jnp.asarray(np.asarray(child_b, np.int32)),
        axis=jnp.asarray(np.asarray(axes, np.int32)),
        plane=jnp.asarray(np.asarray(planes, np.float32)),
        is_leaf=jnp.asarray(np.asarray(leaves, bool)),
        tri_indices=jnp.asarray(flat_indices),
        bbox_min=jnp.asarray(bbox_min, jnp.float32),
        bbox_max=jnp.asarray(bbox_max, jnp.float32),
        max_depth=max_depth,
    )
