"""Native mesh-surgery library vs the numpy reference implementation."""
import time

import numpy as np
import pytest

from sings_tpu.kinematics.body_model import synthetic_template
from sings_tpu.mesh.ops import collapse_edges, unique_edges
from sings_tpu.native import collapse_edges_fast, get_lib


def test_native_builds():
    assert get_lib() is not None, "g++ build of mesh_native failed"


def _grid_mesh(k=12):
    """k x k vertex grid of triangles."""
    ys, xs = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(k * k)],
                     -1).astype(np.float32)
    faces = []
    for y in range(k - 1):
        for x in range(k - 1):
            a = y * k + x
            faces.append([a, a + 1, a + k])
            faces.append([a + 1, a + k + 1, a + k])
    return verts, np.asarray(faces, np.int64)


def test_native_matches_numpy_semantics():
    verts, faces = _grid_mesh(8)
    rng = np.random.RandomState(0)
    verts = verts + rng.rand(*verts.shape).astype(np.float32) * 0.3
    attrs = rng.rand(len(verts), 4).astype(np.float32)
    edges = unique_edges(faces)
    sel = edges[rng.choice(len(edges), 30, replace=False)]

    v_np, f_np, a_np, prune_np = collapse_edges(
        verts.copy(), attrs.copy(), sel.copy(), faces.copy(), 0.5)
    v_nt, f_nt, a_nt, prune_nt = collapse_edges_fast(
        verts, attrs, sel, faces, 0.5)

    # identical survivors and geometry (same greedy order: lengths are
    # distinct with random perturbation)
    np.testing.assert_array_equal(prune_np, prune_nt)
    np.testing.assert_allclose(v_np, v_nt, atol=1e-6)
    np.testing.assert_allclose(a_np, a_nt, atol=1e-6)
    # same face set (order may differ)
    set_np = {tuple(sorted(f)) for f in f_np.tolist()}
    set_nt = {tuple(sorted(f)) for f in f_nt.tolist()}
    assert set_np == set_nt


def test_native_handles_template_scale():
    tpl = synthetic_template(num_betas=4, n_seg=6, n_ring=10)
    edges = tpl.edges
    rng = np.random.RandomState(1)
    sel = edges[rng.choice(len(edges), min(400, len(edges)), replace=False)]
    attrs = tpl.lbs_weights.astype(np.float32)
    t0 = time.time()
    v, f, a, prune = collapse_edges_fast(
        tpl.v_template, attrs, sel.astype(np.int64), tpl.faces, 0.5)
    dt = time.time() - t0
    assert dt < 1.0  # native path must be fast
    assert prune.sum() > 0
    assert f.max() < len(v)
    assert len(a) == len(v)
