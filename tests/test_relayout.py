"""Relayout kernels (ops/rasterizer/relayout.py) vs their XLA references."""
import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.rasterizer.relayout import (
    retile_image, retile_image_xla, untile_image, untile_image_xla)


def test_untile_matches_xla():
    rng = np.random.RandomState(0)
    tile, ntx, nty = 8, 4, 3
    x = jnp.asarray(rng.randn(nty * ntx, 8, tile * tile).astype(np.float32))
    got = untile_image(x, tile=tile, ntx=ntx, nty=nty, interpret=True)
    want = untile_image_xla(x, tile=tile, ntx=ntx, nty=nty)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_retile_matches_xla_with_zero_fill():
    rng = np.random.RandomState(1)
    tile, ntx, nty = 8, 3, 2
    img = jnp.asarray(
        rng.randn(4, nty * tile, ntx * tile).astype(np.float32))
    got = retile_image(img, tile=tile, ntx=ntx, nty=nty, interpret=True)
    want = retile_image_xla(img, tile=tile, ntx=ntx, nty=nty)
    assert got.shape == (nty * ntx, 8, tile * tile)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.all(np.asarray(got)[:, 4:] == 0.0)


def test_untile_retile_round_trip():
    rng = np.random.RandomState(2)
    tile, ntx, nty = 8, 2, 2
    img = jnp.asarray(
        rng.randn(8, nty * tile, ntx * tile).astype(np.float32))
    tiled = retile_image(img, tile=tile, ntx=ntx, nty=nty, interpret=True)
    back = untile_image(tiled, tile=tile, ntx=ntx, nty=nty, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


def test_relayout_vmap_matches_xla():
    """The refine path vmaps rasterize over frames — the relayout
    kernels must batch correctly under vmap."""
    import jax

    rng = np.random.RandomState(3)
    tile, ntx, nty, b = 8, 3, 2, 4
    xs = jnp.asarray(
        rng.randn(b, nty * ntx, 8, tile * tile).astype(np.float32))
    got = jax.vmap(lambda x: untile_image(
        x, tile=tile, ntx=ntx, nty=nty, interpret=True))(xs)
    want = jax.vmap(lambda x: untile_image_xla(
        x, tile=tile, ntx=ntx, nty=nty))(xs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    imgs = jnp.asarray(
        rng.randn(b, 4, nty * tile, ntx * tile).astype(np.float32))
    got = jax.vmap(lambda x: retile_image(
        x, tile=tile, ntx=ntx, nty=nty, interpret=True))(imgs)
    want = jax.vmap(lambda x: retile_image_xla(
        x, tile=tile, ntx=ntx, nty=nty))(imgs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rasterize_relayout_backends_agree():
    """Full rasterize (values + grads) with relayout='pallas' must be
    bit-identical to the XLA relayout path."""
    import jax

    from test_rasterizer import make_scene

    cam, means, scales, quats, opac, feats, bg = make_scene(n=50, hw=48)
    kw = dict(tile=16, chunk=8, max_span=8, interpret=True)

    def loss(relayout, m, s, o):
        out = rasterize_api(m, s, quats, o, feats, cam, bg=bg,
                            backend="pallas", relayout=relayout, **kw)
        return jnp.sum(out["render"] ** 2), out["render"]

    from sings_tpu.ops.rasterizer.api import rasterize as rasterize_api

    (lx, ix), gx = jax.value_and_grad(
        lambda *a: loss("xla", *a), argnums=(0, 1, 2), has_aux=True)(
        means, scales, opac)
    (lp, ip), gp = jax.value_and_grad(
        lambda *a: loss("pallas", *a), argnums=(0, 1, 2), has_aux=True)(
        means, scales, opac)
    np.testing.assert_array_equal(np.asarray(ix), np.asarray(ip))
    for a, b in zip(gx, gp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
