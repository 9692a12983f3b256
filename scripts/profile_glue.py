"""Micro-bench: strategies for the rasterizer backward pair-grad un-sort.

Current glue: gather (N*cap, 9) rows from the kernel's grad buffer by
pair_slot, reshape (N, cap, 9), sum over cap. Candidates compared at
training-ish shapes (N=51.2k, cap=9, grad_cap~=520k):
  A. row gather by pair_slot (current)
  B. near-identity gather to sorted order + multi-payload un-sort
  C. near-identity gather + gaussian-key sort + cumsum-diff segment sum
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.ops.timing import device_time

N, CAP = 51200, 9
P = N * CAP
GCAP = P + 2 * 128 * 1792 + 1
rng = np.random.RandomState(0)
pair_slot = jnp.asarray(rng.randint(0, GCAP - 1, P).astype(np.int32))
slot_sorted = jnp.asarray(
    np.sort(rng.randint(0, GCAP - 1, P)).astype(np.int32))
sf = jnp.asarray(rng.permutation(P).astype(np.int32))
gauss_sorted = jnp.asarray(np.sort(rng.randint(0, N, P)).astype(np.int32))
pair_grads = jnp.asarray(rng.randn(GCAP, 9).astype(np.float32))


def t(name, fn, *args):
    ms = device_time(fn, args, k1=1, k2=4, repeats=2) * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)


t("A. gather P rows by pair_slot + reshape-sum",
  lambda pg: pg[pair_slot].reshape(N, CAP, 9).sum(1), pair_grads)

t("A'. gather P rows, sorted idx hint",
  lambda pg: pg[slot_sorted].reshape(N, CAP, 9).sum(1), pair_grads)


def unsort_sort(pg):
    pgs = pg[slot_sorted]  # near-identity gather to sorted-pair order
    cols = [pgs[:, i] for i in range(9)]
    out = jax.lax.sort([sf] + cols, num_keys=1)
    return sum(o.reshape(N, CAP).sum(1) for o in out[1:])


t("B. gather sorted + 9-payload un-sort", unsort_sort, pair_grads)


def segsum_cumsum(pg):
    pgs = pg[slot_sorted]
    cs = jnp.cumsum(pgs, axis=0)
    ends = jnp.searchsorted(gauss_sorted,
                            jnp.arange(N + 1, dtype=jnp.int32))
    b = cs[jnp.maximum(ends, 1) - 1] * (ends > 0)[:, None]
    return b[1:] - b[:-1]


t("C. gather sorted + cumsum-diff by gaussian", segsum_cumsum, pair_grads)

t("D. segment_sum sorted keys",
  lambda pg: jax.ops.segment_sum(pg[slot_sorted], gauss_sorted,
                                 num_segments=N, indices_are_sorted=True),
  pair_grads)
