"""Make JAX_PLATFORMS work for the CLI entry points.

Some environments register extra PJRT plugins via sitecustomize and
hard-set `jax_platforms` at import time, which silently overrides the
user's JAX_PLATFORMS environment variable. The CLI re-applies the env
var so `JAX_PLATFORMS=cpu python -m sings_tpu.cli.train ...` always
means what it says (e.g. running a quick CPU job while a TPU job owns
the accelerator).
"""
from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass
