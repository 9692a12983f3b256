"""Multi-avatar rendering: concatenate several avatars' gaussians into
one rasterizer call (reference gs_renderer_multiple.py:12-132, which
concats N avatars' attributes with per-avatar translations).

With static-capacity avatars this is a pure concatenation along the
gaussian axis — the tile binning and kernels are count-agnostic, so one
call composites any number of avatars with correct global depth order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graphics import Camera
from .api import rasterize


def rasterize_multi(
    avatar_outs: list[dict],
    camera: Camera,
    *,
    translations: list[jax.Array] | None = None,
    bg: jax.Array | None = None,
    sh_degree: int = 3,
    alives: list[jax.Array] | None = None,
    **raster_kw,
) -> dict:
    """Render several avatar forward-outputs into one image.

    avatar_outs: list of dicts with xyz, scales, rotq, opacity, shs.
    translations: optional per-avatar (3,) world offsets
    (gs_renderer_multiple applies per-avatar trans before concat).
    """
    n_av = len(avatar_outs)
    xyz, scales, rotq, opac, shs, alive = [], [], [], [], [], []
    for i, out in enumerate(avatar_outs):
        p = out["xyz"]
        if translations is not None:
            p = p + jnp.reshape(translations[i], (1, 3))
        xyz.append(p)
        scales.append(out["scales"])
        rotq.append(out["rotq"])
        opac.append(out["opacity"].reshape(-1))
        shs.append(out["shs"])
        if alives is not None:
            alive.append(alives[i])
        elif "alive" in out:
            alive.append(out["alive"] > 0.5)
        else:
            alive.append(jnp.ones(p.shape[0], bool))

    return rasterize(
        jnp.concatenate(xyz), jnp.concatenate(scales),
        jnp.concatenate(rotq), jnp.concatenate(opac),
        jnp.concatenate(shs), camera, sh_degree=sh_degree, bg=bg,
        alive=jnp.concatenate(alive), **raster_kw,
    )
