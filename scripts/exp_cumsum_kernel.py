"""Micro-experiment: per-chunk cumsum strategies inside a Pallas kernel.

The composite kernels compute exclusive/inclusive prefix sums along the
chunk axis (128) x npx lanes (256). Current implementation: triangular
f32 matmul on the MXU (8.4 MFLOP per chunk). Candidates:
  a. tri matmul (current)
  b. jnp.cumsum along axis 0
  c. manual log-shift adds (7 passes)
  d. batched tri matmul (one (128,128)@(128,768) for 3 payloads)
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sings_tpu.ops.timing import device_time

CHUNK, NPX, STEPS = 128, 256, 4096


def _tri(chunk):
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (j < i).astype(jnp.float32)


def make_kernel(mode):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = jnp.zeros((1, NPX), jnp.float32)

        def body(c, acc):
            la = x * (1.0 + c * 1e-9)
            if mode == "tri":
                excl = jnp.dot(_tri(CHUNK), la,
                               preferred_element_type=jnp.float32)
            elif mode == "cumsum":
                excl = jnp.cumsum(la, axis=0) - la
            elif mode == "shift":
                s = la
                k = 1
                while k < CHUNK:
                    i0 = jax.lax.broadcasted_iota(
                        jnp.int32, (CHUNK, NPX), 0)
                    s = s + jnp.where(i0 >= k,
                                      pltpu.roll(s, k, 0), 0.0)
                    k *= 2
                excl = s - la
            elif mode == "tri3":
                big = jnp.concatenate([la, la * 2, la * 3], axis=1)
                r = jnp.dot(_tri(CHUNK), big,
                            preferred_element_type=jnp.float32)
                excl = r[:, :NPX] + r[:, NPX:2 * NPX] + r[:, 2 * NPX:]
            return acc + jnp.sum(excl, axis=0, keepdims=True)

        acc = jax.lax.fori_loop(0, STEPS, body, acc)
        o_ref[...] = acc

    return kernel


def run(mode):
    x = jnp.asarray(np.random.RandomState(0).randn(
        CHUNK, NPX).astype(np.float32))
    f = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((1, NPX), jnp.float32),
    )
    try:
        ms = device_time(f, (x,), k1=1, k2=6, repeats=2) * 1e3
        per = ms / STEPS * 1e3
        print(f"{mode}: {ms:.3f} ms total, {per:.2f} us/chunk", flush=True)
    except Exception as e:
        print(f"{mode}: FAILED {type(e).__name__}: {e}", flush=True)


for m in ["tri", "cumsum", "shift", "tri3"]:
    run(m)
