"""Device-time measurement that is robust to remote/async backends.

On tunneled TPU backends (this environment's 'axon' platform),
block_until_ready can return without waiting and every synchronous
host<->device roundtrip costs tens of milliseconds, so the usual
"loop + block" timing measures dispatch latency, not device compute.

device_time() instead chains K dependent iterations of the function
inside ONE lax.scan (so the device must execute them serially within a
single dispatch), reads back one scalar, and differences two scan
lengths to cancel the fixed dispatch + readback + compile-cache-lookup
overhead:

    t_iter = (T(k2) - T(k1)) / (k2 - k1)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _run_chained(fn, args, length: int):
    """Scan `length` dependent evaluations of fn(*args) -> pytree."""

    def body(tok, _):
        # perturb the first float arg by a zero-valued function of the
        # token: creates a true data dependency without changing values
        new_args = list(args)
        for i, a in enumerate(new_args):
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                                      jnp.floating):
                new_args[i] = a + (tok * 0.0).astype(a.dtype)
                break
        out = fn(*new_args)
        # token = reduction over EVERY output leaf: anything cheaper lets
        # XLA dead-code-eliminate the parts not feeding the token
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        tok = jnp.float32(0.0)
        for x in leaves:
            tok = tok + jnp.sum(x).astype(jnp.float32) * 1e-30
        return tok, ()

    @jax.jit
    def run():
        tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
        return tok

    return run


def device_time(fn, args, *, k1: int = 2, k2: int = 18,
                repeats: int = 3) -> float:
    """Per-iteration device seconds for fn(*args)."""
    run1 = _run_chained(fn, args, k1)
    run2 = _run_chained(fn, args, k2)
    float(run1())  # compile both + warm caches
    float(run2())

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run1())
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run2())
        t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (k2 - k1))
    return max(best, 0.0)
