"""Device timings of the photometric loss terms at training shapes.

Breaks the ~19.5 ms "photometric fwd+bwd" step component into
L1 / SSIM / LPIPS(4x128^2 patches), and probes a bf16-compute LPIPS.
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.losses.lpips import get_lpips, lpips_distance
from sings_tpu.losses.photometric import (
    PhotometricWeights, masked_l1, photometric_loss, sample_patches,
    ssim_loss,
)
from sings_tpu.ops.timing import device_time

H, W = 512, 896
rng = np.random.RandomState(0)
pred = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
gt = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
mask = jnp.asarray((rng.rand(H, W) > 0.6).astype(np.float32))
params = get_lpips()
key = jax.random.PRNGKey(0)


def t(name, fn, *args):
    ms = device_time(fn, args, k1=1, k2=4, repeats=2) * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)


t("l1 fwd+bwd", jax.grad(lambda p: masked_l1(p, gt, mask)), pred)
t("ssim fwd+bwd", jax.grad(lambda p: ssim_loss(p, gt, mask)), pred)

patches = sample_patches(key, mask, (pred, gt))


def lpips_loss(p, g):
    return lpips_distance(params, p.clip(max=1.0), g).mean()


t("lpips 8x128^2 fwd+bwd (f32)",
  jax.grad(lpips_loss), patches[0], patches[1])


t("patch sampling alone",
  lambda m: sample_patches(key, m, (pred, gt))[0], mask)

t("full photometric fwd+bwd",
  jax.grad(lambda p: photometric_loss(
      key, p, gt, mask, jnp.zeros(3), PhotometricWeights(),
      lpips_fn=lambda a, b: lpips_distance(params, a, b))[0]), pred)
