"""Banded (RCM + blocked MXU matmul) region laplacian vs the gather
formulation: identical losses and gradients on random meshes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sings_tpu.losses.regularizers import (
    build_region_laplacian, build_region_laplacian_banded,
)


def random_mesh(c=300, n_edges=900, regions=4, seed=0, dead_frac=0.1):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, regions, c)
    labels[rng.rand(c) < dead_frac] = -1  # dead/unlabeled slots
    e = rng.randint(0, c, (n_edges, 2))
    e = e[e[:, 0] != e[:, 1]]
    x = rng.randn(c, 3).astype(np.float32)
    w = rng.rand(regions + 11).astype(np.float32)  # 15-region table
    return labels, e, x, np.pad(w, (0, max(0, 15 - len(w))))[:15]


@pytest.mark.parametrize("seed", [0, 1])
def test_banded_matches_gather_loss_and_grad(seed):
    labels, e, x, w = random_mesh(seed=seed)
    lap_g = build_region_laplacian(e, labels, w, num_regions=15)
    lap_b = build_region_laplacian_banded(e, labels, w, num_regions=15)

    xj = jnp.asarray(x)
    for regions in (None, [1, 2]):
        a = float(lap_g.loss(xj, regions=regions))
        b = float(lap_b.loss(xj, regions=regions))
        np.testing.assert_allclose(b, a, rtol=1e-5, err_msg=str(regions))

    ga = jax.grad(lambda x: lap_g.loss(x))(xj)
    gb = jax.grad(lambda x: lap_b.loss(x))(xj)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=1e-4, atol=1e-6)


def test_banded_loss_fused_multiple_terms():
    labels, e, x, w = random_mesh(seed=2)
    lap_g = build_region_laplacian(e, labels, w, num_regions=15)
    lap_b = build_region_laplacian_banded(e, labels, w, num_regions=15)
    xj = jnp.asarray(x)
    y = jnp.asarray(np.random.RandomState(3).randn(*x.shape),
                    jnp.float32)
    terms = [(xj, None, None), (y, jnp.ones(15), [6, 7])]
    a = lap_g.loss_fused(terms)
    b = lap_b.loss_fused(terms)
    for ai, bi in zip(a, b):
        np.testing.assert_allclose(float(bi), float(ai), rtol=1e-5)

    # gradients through the fused path (both terms at once)
    def tot(lap, xj, y):
        o = lap.loss_fused([(xj, None, None), (y, jnp.ones(15), [6, 7])])
        return o[0] + 2.0 * o[1]

    ga = jax.grad(tot, argnums=(1, 2))(lap_g, xj, y)
    gb = jax.grad(tot, argnums=(1, 2))(lap_b, xj, y)
    for ai, bi in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(bi), np.asarray(ai),
                                   rtol=1e-4, atol=1e-6)


def test_banded_no_edges():
    labels = np.array([0, 1, -1, 2])
    e = np.zeros((0, 2), np.int64)
    w = np.ones(15, np.float32)
    lap = build_region_laplacian_banded(e, labels, w)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 3), jnp.float32)
    # isolated labeled verts: Lx = -x (matches the gather formulation)
    ref = build_region_laplacian(e, labels, w)
    np.testing.assert_allclose(float(lap.loss(x)), float(ref.loss(x)),
                               rtol=1e-6)


def test_banded_pad_width_grow_only():
    labels, e, x, w = random_mesh(seed=4)
    lap1 = build_region_laplacian_banded(e, labels, w)
    w1 = lap1.band.shape[1]
    lap2 = build_region_laplacian_banded(e, labels, w, pad_width=w1 + 64)
    assert lap2.band.shape[1] == w1 + 64
    xj = jnp.asarray(x)
    np.testing.assert_allclose(float(lap2.loss(xj)),
                               float(lap1.loss(xj)), rtol=1e-5)
