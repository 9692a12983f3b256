"""Mesh-surgery parity against the reference geometry_ops (CPU torch).

The reference imports trimesh at module level but these two functions
only ever call trimesh.grouping.unique_rows; a faithful stub of that
helper (first-occurrence unique rows + inverse) lets the reference's own
torch code run unmodified. Density control correctness hinges on these
ops matching exactly (vertex numbering included), so the comparison is
elementwise, not up-to-permutation.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "sings")),
                                reason="reference repo not present")

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)


def _unique_rows(data, digits=None):
    """trimesh.grouping.unique_rows semantics: indices of first
    occurrences (in first-occurrence order) + inverse mapping."""
    arr = np.ascontiguousarray(np.asanyarray(data))
    view = arr.view([("", arr.dtype)] * arr.shape[1]).ravel()
    _, first, inverse = np.unique(view, return_index=True,
                                  return_inverse=True)
    order = np.argsort(first)
    remap = np.empty(len(order), dtype=np.int64)
    remap[order] = np.arange(len(order))
    return first[order], remap[inverse]


def _faces_to_edges(faces, return_index=False):
    faces = np.asanyarray(faces)
    edges = faces[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2)
    if return_index:
        return edges, np.tile(np.arange(len(faces)), (3, 1)).T.reshape(-1)
    return edges


if "trimesh" not in sys.modules:
    try:
        import trimesh  # noqa: F401
    except ImportError:
        _tm = types.ModuleType("trimesh")
        _gr = types.ModuleType("trimesh.grouping")
        _gr.unique_rows = _unique_rows
        _ge = types.ModuleType("trimesh.geometry")
        _ge.faces_to_edges = _faces_to_edges
        _tm.grouping = _gr
        _tm.geometry = _ge
        sys.modules["trimesh"] = _tm
        sys.modules["trimesh.grouping"] = _gr
        sys.modules["trimesh.geometry"] = _ge


def _test_mesh():
    """Small closed mesh (octahedron subdivided once) + attributes."""
    from sings_tpu.mesh.ops import subdivide

    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                      [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int64)
    verts, faces, _ = subdivide(verts, faces)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    rng = np.random.RandomState(3)
    verts = (verts + rng.normal(0, 0.05, verts.shape)).astype(np.float32)
    return verts, faces.astype(np.int64)


def test_subdivide_matches_reference():
    from sings.rec.utils.geometry_ops import subdivide_meshes as ref_sub

    from sings_tpu.mesh.ops import subdivide

    verts, faces = _test_mesh()
    rng = np.random.RandomState(5)
    attrs = {
        "lbs_weights": rng.rand(len(verts), 4).astype(np.float32),
        "vertex_label": rng.randint(0, 15, (len(verts),)).astype(np.int64),
        "vertex_id": np.arange(len(verts), dtype=np.int64),
    }
    face_index = np.array([0, 3, 7, 12, 13], np.int64)

    rv, rf, ra = ref_sub(torch.from_numpy(verts),
                         torch.from_numpy(faces),
                         face_index=torch.from_numpy(face_index),
                         vertex_attributes={k: torch.from_numpy(v)
                                            for k, v in attrs.items()})
    ov, of, oa = subdivide(verts, faces, face_index=face_index,
                           vertex_attributes=attrs)
    np.testing.assert_allclose(ov, rv.numpy(), atol=1e-6)
    np.testing.assert_array_equal(of, rf.numpy())
    for k in attrs:
        np.testing.assert_allclose(oa[k], ra[k].numpy(), atol=1e-6)


def test_collapse_edges_matches_reference():
    from sings.rec.utils.geometry_ops import collapse_edges as ref_col

    from sings_tpu.mesh.ops import collapse_edges, unique_edges

    verts, faces = _test_mesh()
    rng = np.random.RandomState(11)
    attr = rng.rand(len(verts), 5).astype(np.float32)
    edges = unique_edges(faces)
    sel = edges[rng.choice(len(edges), size=len(edges) // 2, replace=False)]
    sel = np.sort(sel, axis=1)

    rv, rf, ra, rdel = ref_col(torch.from_numpy(verts.copy()),
                               torch.from_numpy(attr.copy()),
                               torch.from_numpy(sel.copy()),
                               torch.from_numpy(faces),
                               collapse_rate=0.5)
    ov, of, oa, odel = collapse_edges(verts, attr, sel, faces,
                                      collapse_rate=0.5)
    np.testing.assert_array_equal(odel, rdel.numpy())
    np.testing.assert_allclose(ov, rv.numpy(), atol=1e-6)
    np.testing.assert_array_equal(of, rf.numpy())
    np.testing.assert_allclose(oa, ra.numpy(), atol=1e-6)


def test_native_collapse_matches_reference():
    from sings.rec.utils.geometry_ops import collapse_edges as ref_col

    from sings_tpu.mesh.ops import unique_edges
    from sings_tpu.native import collapse_edges_fast, get_lib

    if get_lib() is None:
        pytest.skip("native extension unavailable")

    verts, faces = _test_mesh()
    rng = np.random.RandomState(13)
    attr = rng.rand(len(verts), 3).astype(np.float32)
    edges = unique_edges(faces)
    sel = edges[rng.choice(len(edges), size=len(edges) // 2, replace=False)]
    sel = np.sort(sel, axis=1)

    rv, rf, ra, rdel = ref_col(torch.from_numpy(verts.copy()),
                               torch.from_numpy(attr.copy()),
                               torch.from_numpy(sel.copy()),
                               torch.from_numpy(faces),
                               collapse_rate=0.5)
    ov, of, oa, odel = collapse_edges_fast(verts, attr, sel, faces,
                                           collapse_rate=0.5)
    np.testing.assert_array_equal(odel, rdel.numpy())
    np.testing.assert_allclose(ov, rv.numpy(), atol=1e-6)
    np.testing.assert_array_equal(of, rf.numpy())
    np.testing.assert_allclose(oa, ra.numpy(), atol=1e-6)
