"""Micro-benchmark: strategies for the triplane backward scatter-add.

The gather backward of grid_sample_2d scatter-adds N*4 corner rows
(32ch) into each (H, W, C) plane; 9 planes ~= 1.8M rows ~= 19 ms/step.
Candidates: plain scatter, scatter with sorted indices, segment_sum.
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.timing import device_time

N, HW, C = 205_000, 256 * 256, 32
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, HW, N).astype(np.int32))
idx_sorted = jnp.asarray(np.sort(np.asarray(idx)))
vals = jnp.asarray(rng.randn(N, C).astype(np.float32))


def t(name, fn, *args):
    ms = device_time(fn, args, k1=1, k2=6, repeats=2) * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)


t("scatter-add (random idx)",
  lambda v: jnp.zeros((HW, C)).at[idx].add(v), vals)
t("scatter-add (sorted idx, hinted)",
  lambda v: jnp.zeros((HW, C)).at[idx_sorted].add(
      v, indices_are_sorted=True), vals)
t("segment_sum (sorted)",
  lambda v: jax.ops.segment_sum(v, idx_sorted, num_segments=HW,
                                indices_are_sorted=True), vals)
t("sort keys+32ch then hinted scatter",
  lambda v: jnp.zeros((HW, C)).at[
      jnp.sort(idx)].add(v, indices_are_sorted=True), vals)
# one-hot matmul on the row axis: dgrid = onehot(y)^T @ (wx-weighted vals)
rows = idx // 256
cols = idx % 256


def matmul_rows(v):
    oh = jax.nn.one_hot(rows, 256, dtype=v.dtype)        # (N, 256)
    t_ = jnp.einsum("nr,nc->rc", oh, v)                  # rows only
    return t_


t("one-hot rows matmul (lower bound probe)", matmul_rows, vals)
