"""Nested triplane fast path vs the generic fused/unfused paths.

The nested path (power-of-two cell towers, one combined-row gather per
orientation, Morton segment reduction) must be numerically equivalent
to the generic paths evaluated on the SAME nested-resolution grids.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sings_tpu.fields.triplane import (
    TriplaneConfig, _nestable, init_triplane, triplane_features,
)


def make(nested=True, res=8, multires=(1, 2, 4), n=400, seed=0):
    cfg = TriplaneConfig(resolution=(res, res, res), out_dim=8,
                         multires=multires, nested=nested)
    params = init_triplane(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    # include out-of-range points (border clamp) and exact boundaries
    pts = rng.uniform(-1.3, 1.3, (n, 3)).astype(np.float32)
    pts[:8] = np.array([[0, 0, 0], [1, 1, 1], [-1, -1, -1],
                        [0.5, 0.5, 0.5], [1.3, 0, 0], [0, -1.3, 0],
                        [0.25, -0.75, 0.125], [0.999, 0.999, -0.999]],
                       np.float32)
    return cfg, params, jnp.asarray(pts)


def test_nested_shapes_and_detection():
    cfg, params, pts = make()
    assert _nestable(params["grids"], cfg.multires)
    assert params["grids"][0][0].shape == (8, 9, 9)
    assert params["grids"][2][0].shape == (8, 33, 33)
    out = triplane_features(params, pts, cfg)
    assert out.shape == (pts.shape[0], cfg.feat_dim)


def test_nested_forward_matches_unfused():
    cfg, params, pts = make()
    fast = triplane_features(params, pts, cfg, fused=True)
    slow = triplane_features(params, pts, cfg, fused=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=2e-6, atol=2e-6)


def test_nested_grads_match_generic_fused():
    """Same nested grids, generic fused custom-VJP vs the nested one:
    grid and coordinate gradients must agree."""
    cfg, params, pts = make()
    cfg_generic = cfg._replace(nested=False)  # generic path, same grids

    def loss(params, pts, cfg):
        f = triplane_features(params, pts, cfg)
        return jnp.sum(jnp.sin(3.0 * f) * f)

    g_fast = jax.grad(loss, argnums=(0, 1))(params, pts, cfg)
    g_ref = jax.grad(loss, argnums=(0, 1))(params, pts, cfg_generic)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_ref)):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=3e-5 * scale)


def test_nested_rejects_nonnested_grids():
    cfg, params, pts = make(nested=False)  # reference shapes (no +1)
    assert not _nestable(params["grids"], cfg.multires)
    # nested=True on non-nestable grids silently falls back to fused
    out = triplane_features(params, pts, cfg._replace(nested=True))
    ref = triplane_features(params, pts, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6)


@pytest.mark.parametrize("multires", [(1, 2), (1, 2, 4, 8)])
def test_nested_other_towers(multires):
    cfg, params, pts = make(multires=multires, res=4)
    fast = triplane_features(params, pts, cfg, fused=True)
    slow = triplane_features(params, pts, cfg, fused=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=2e-6, atol=2e-6)


def test_nested_cross_trace_reuse():
    """The Morton static-table cache must not leak tracers across jit
    traces (regression: first use inside a scanned jit poisoned every
    later trace with UnexpectedTracerError)."""
    from sings_tpu.fields.triplane import _morton_static

    _morton_static.cache_clear()
    cfg, params, pts = make(res=4, n=64)

    @jax.jit
    def first(params, pts):
        def step(c, _):
            f = triplane_features(params, pts, cfg)
            return c + jnp.sum(f), None

        out, _ = jax.lax.scan(step, 0.0, None, length=2)
        return out

    @jax.jit
    def second(params, pts):
        g = jax.grad(lambda p: jnp.sum(
            triplane_features(p, pts, cfg) ** 2))(params)
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))

    a = float(first(params, pts))
    b = float(second(params, pts))
    assert np.isfinite(a) and np.isfinite(b)
