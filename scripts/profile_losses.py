"""Focused device timings of the loss terms at training shapes."""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.losses.regularizers import (
    L2NormConfig, gaussians_edge_loss, l2_norm_loss, mesh_edge_loss,
)
from sings_tpu.ops.timing import device_time

C = 51200
rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.randn(C, 3).astype(np.float32) * 0.3)
scales = jnp.asarray(rng.rand(C, 3).astype(np.float32) * 0.01)
alive = jnp.asarray((np.arange(C) < 25600).astype(np.float32))


def t(name, fn, *args):
    ms = device_time(fn, args, k1=1, k2=4, repeats=2) * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)


from sings_tpu.losses.regularizers import build_region_laplacian  # noqa: E402

labels = rng.randint(0, 15, C)
labels[25600:] = -1
tri = np.sort(rng.randint(0, 25600, (C * 2, 2)), 1)
tri = np.unique(tri[tri[:, 0] != tri[:, 1]], axis=0)
rl = build_region_laplacian(tri, labels, np.ones(15, np.float32))
print(f"lap table: {rl.neighbors.shape}", flush=True)
wr = jnp.ones(15)
t("region laplacian fwd+bwd (x3 applies)",
  jax.grad(lambda x: rl.loss(x, wr) + rl.loss(x * 2, wr)
           + rl.loss(x, wr, regions=[6, 7])), xyz)

t("knn edge loss fwd (exact)",
  lambda x, s: gaussians_edge_loss(x, s, alive, k=9, approx=False),
  xyz, scales)
t("knn edge loss fwd (approx)",
  lambda x, s: gaussians_edge_loss(x, s, alive, k=9, approx=True),
  xyz, scales)
t("knn edge loss fwd+bwd (approx)",
  jax.grad(lambda x, s: gaussians_edge_loss(x, s, alive, k=9, approx=True),
           argnums=(0, 1)), xyz, scales)
