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
