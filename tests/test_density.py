"""Density-control unit tests on a tiny synthetic avatar state."""
import numpy as np
import pytest

from sings_tpu.kinematics.body_model import synthetic_template
from sings_tpu.model.density import (
    densify_and_prune_vanilla, densify_and_subdivide, prune_and_simplify,
)


def make_state(capacity_extra=512):
    tpl = synthetic_template(num_betas=4, n_seg=4, n_ring=6)
    n = tpl.num_verts
    c = n + capacity_extra
    buffers = {
        "alive": np.concatenate([np.ones(n), np.zeros(c - n)]).astype(
            np.float32),
        "scaling_multiplier": np.ones((c, 1), np.float32),
        "opacity_offset": np.zeros((c, 1), np.float32),
        "lbs_weights": np.zeros((c, 24), np.float32),
        "vertex_label": np.full(c, -1, np.int32),
        "anchor_normals": np.zeros((c, 3), np.float32),
        "max_radii2d": np.zeros(c, np.float32),
        "xyz_grad_accum": np.zeros(c, np.float32),
        "grad_denom": np.ones(c, np.float32),
    }
    buffers["lbs_weights"][:n] = tpl.lbs_weights
    buffers["lbs_weights"][n:, 0] = 1.0
    buffers["vertex_label"][:n] = tpl.vertex_label
    fc, ec = 4 * c, 6 * c
    faces = np.zeros((fc, 3), np.int32)
    faces[: len(tpl.faces)] = tpl.faces
    fv = np.zeros(fc, np.float32)
    fv[: len(tpl.faces)] = 1.0
    edges = np.zeros((ec, 2), np.int32)
    edges[: len(tpl.edges)] = tpl.edges
    ev = np.zeros(ec, np.float32)
    ev[: len(tpl.edges)] = 1.0
    buffers.update(faces=faces, face_valid=fv, edges=edges, edge_valid=ev)

    xyz = np.zeros((c, 3), np.float32)
    xyz[:n] = tpl.v_template
    fwd = {
        "xyz_canon": xyz.copy(),
        "scales_canon": np.full((c, 3), 0.02, np.float32),
        "scales": np.full((c, 3), 0.02, np.float32),
        "shs": np.zeros((c, 16, 3), np.float32),
        "opacity": np.full((c, 1), 0.9, np.float32),
    }
    return tpl, buffers, xyz, fwd, n, c


def test_densify_adds_vertices_into_free_slots():
    tpl, buffers, xyz, fwd, n, c = make_state()
    # high gradients on some non-hand vertices
    sel = np.where(~np.isin(buffers["vertex_label"][:n], (6, 7)))[0][:20]
    buffers["xyz_grad_accum"][sel] = 1.0
    res = densify_and_subdivide(
        buffers, xyz, fwd, grad_threshold=0.001, scale_threshold=0.01,
        max_screen_size=None, max_n_gs=c,
        face_capacity=4 * c, edge_capacity=6 * c)
    assert res.changed
    assert res.num_alive > n
    # new slots are in the padding region and got positions + weights
    new = (res.changed_slots > 0.5)
    assert new.sum() == res.num_alive - n
    assert np.all(new[:n] == 0)
    np.testing.assert_allclose(
        res.lbs_weights[new].sum(1), 1.0, atol=1e-5)
    # new vertices are midpoints: inside the template bbox
    assert np.all(np.abs(res.new_xyz[new]) < 2.0)
    # faces reference only alive slots
    live_faces = res.faces[res.face_valid > 0.5]
    assert np.all(res.alive[live_faces] > 0.5)


def test_densify_respects_max_n_gs():
    tpl, buffers, xyz, fwd, n, c = make_state()
    buffers["xyz_grad_accum"][:n] = 1.0
    res = densify_and_subdivide(
        buffers, xyz, fwd, grad_threshold=0.001, scale_threshold=0.01,
        max_screen_size=None, max_n_gs=n + 30,
        face_capacity=4 * c, edge_capacity=6 * c)
    assert res.num_alive <= n + 30 + 3  # face granularity slack


def test_prune_removes_transparent_small():
    tpl, buffers, xyz, fwd, n, c = make_state()
    # a patch of transparent tiny gaussians (non-hand)
    victims = np.where(~np.isin(buffers["vertex_label"][:n], (6, 7)))[0][:150]
    fwd["opacity"][victims] = 0.001
    fwd["scales"][victims] = 1e-5
    res = prune_and_simplify(
        buffers, xyz, fwd, opacity_threshold=0.01, scale_threshold=1e-3,
        prune_max_n_gs_once=5000, min_n_gs=1, collapse_rate=0.5,
        face_capacity=4 * c, edge_capacity=6 * c)
    if res.changed:
        assert res.num_alive < n
        live_faces = res.faces[res.face_valid > 0.5]
        assert np.all(res.alive[live_faces] > 0.5)
        # hands never pruned
        hand = np.isin(buffers["vertex_label"], (6, 7)) & (
            buffers["alive"] > 0.5)
        assert np.all(res.alive[hand] > 0.5)


def test_prune_skips_below_minimum():
    tpl, buffers, xyz, fwd, n, c = make_state()
    fwd["opacity"][:] = 0.0
    res = prune_and_simplify(
        buffers, xyz, fwd, opacity_threshold=0.5, scale_threshold=1.0,
        min_n_gs=n + 1, face_capacity=4 * c, edge_capacity=6 * c)
    assert not res.changed


def test_vanilla_clone_split_prune():
    tpl, buffers, xyz, fwd, n, c = make_state()
    buffers["xyz_grad_accum"][:10] = 1.0       # clones (small scales)
    fwd["scales_canon"][:5] = 0.5              # first 5 -> split instead
    fwd["opacity"][20:30] = 0.001              # pruned
    res = densify_and_prune_vanilla(
        buffers, xyz, fwd, grad_threshold=0.5, min_opacity=0.01,
        percent_dense=0.1, densify_extent=1.0, max_screen_size=None,
        max_n_gs=c)
    assert res.changed
    # split parents killed, children added
    assert np.all(res.alive[:5] == 0.0)
    # transparent pruned
    assert np.all(res.alive[20:30] == 0.0)
    # -5 split parents, -10 pruned, +5 clones (idx 5..9), +10 children
    assert res.num_alive == n - 5 - 10 + 5 + 10


def test_densify_never_selects_hands():
    tpl, buffers, xyz, fwd, n, c = make_state()
    hand = np.isin(buffers["vertex_label"][:n], (6, 7))
    assert hand.sum() > 0
    # huge gradients EVERYWHERE incl. hands
    buffers["xyz_grad_accum"][:n] = 1.0
    res = densify_and_subdivide(
        buffers, xyz, fwd, grad_threshold=0.001, scale_threshold=0.01,
        max_screen_size=None, max_n_gs=c,
        face_capacity=4 * c, edge_capacity=6 * c)
    assert res.changed
    # parents' scaling multipliers rescale only for selected (non-hand)
    changed_mult = res.scaling_multiplier[:n, 0] != 1.0
    assert not np.any(changed_mult & hand)
