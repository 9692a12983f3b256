"""Chunk-amortized KNN edge statistic (train/step.py knn_backend="chunk").

The statistic is stop-gradient'd (reference loss_items.py:73-83
.detach()), so computing it once at the chunk head and holding it
constant across inner_steps is exact at the head step and drifts only
with the (tiny) per-step position updates.
"""
import jax
import jax.numpy as jnp
import numpy as np


def test_edge_stat_matches_per_step_loss():
    """edge_stat + from_stat decomposition == the fused loss."""
    from sings_tpu.losses.regularizers import (
        edge_stat, gaussians_edge_loss, gaussians_edge_loss_from_stat,
    )

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(256, 3).astype(np.float32))
    scales = jnp.asarray(rng.rand(256, 3).astype(np.float32) * 0.05)
    alive = jnp.asarray((rng.rand(256) > 0.2).astype(np.float32))

    fused = gaussians_edge_loss(xyz, scales, alive, k=5, approx=False)
    stat = edge_stat(xyz, alive, k=5, approx=False)
    split = gaussians_edge_loss_from_stat(stat, scales, alive)
    np.testing.assert_allclose(float(split), float(fused), rtol=1e-6)


def test_scan_chunk_stat_matches_dense_first_step():
    """A scan with a chunk-head stat_fn reproduces the dense per-step
    connect term exactly at the chunk's first step (positions have not
    moved yet), and stays finite across the chunk."""
    import optax

    import __graft_entry__ as ge
    from sings_tpu.losses.regularizers import edge_stat
    from sings_tpu.model.avatar import get_canon_xyz
    from sings_tpu.train.step import make_train_scan, make_train_step

    tpl, dt, cache, cfg, state, camera = ge._tiny_setup()
    kw = ge._raster_kw()
    step_cfg, region_lap, lap_w = ge._dryrun_pieces(state, camera)
    tx = optax.adam(1e-3)
    opt_state = tx.init(state.params)
    body = make_train_step(cfg, step_cfg, dt, camera, tx, None, kw)

    h, w = camera.height, camera.width
    k_steps = 3
    batches = {
        "rgb": jnp.zeros((k_steps, 3, h, w)).at[:, 1].set(0.4),
        "mask": jnp.ones((k_steps, h, w)),
        "idx": jnp.zeros((k_steps,), jnp.int32),
        "smpl_scale": jnp.ones((k_steps, 1)),
    }
    rngs = jax.random.split(jax.random.PRNGKey(0), k_steps)

    def stat_fn(params, buffers):
        return edge_stat(get_canon_xyz(params, buffers, cfg),
                         buffers.alive, k=step_cfg.knn_k)

    scan_chunk = make_train_scan(body, stat_fn)
    scan_dense = make_train_scan(body, None)

    args = (cache, batches, rngs, jnp.asarray(0), jnp.asarray(0),
            region_lap, region_lap, lap_w, lap_w)
    # scan donates params/buffers/opt_state: feed each call copies
    p2 = jax.tree.map(jnp.copy, state.params)
    b2 = jax.tree.map(jnp.copy, state.buffers)
    o2 = tx.init(p2)
    _, _, _, loss_c, skip_c, m_c = scan_chunk(
        state.params, state.buffers, opt_state, *args)
    _, _, _, loss_d, skip_d, m_d = scan_dense(p2, b2, o2, *args)

    # step 0: identical statistic -> identical connect term and loss
    np.testing.assert_allclose(float(m_c["connect"][0]),
                               float(m_d["connect"][0]), rtol=1e-5)
    np.testing.assert_allclose(float(loss_c[0]), float(loss_d[0]),
                               rtol=1e-5)
    # later steps: the frozen statistic drifts only slightly
    assert np.all(np.isfinite(np.asarray(loss_c)))
    assert float(jnp.sum(skip_c)) == 0
    np.testing.assert_allclose(np.asarray(m_c["connect"]),
                               np.asarray(m_d["connect"]), rtol=0.25,
                               atol=1e-5)
