"""Multi-resolution triplane feature field (K-planes style).

Functional rebuild of the reference HexPlaneField
(sings/rec/models/modules/hexplane.py:108-189, itself from 4DGaussians):
3 axis-aligned 2D planes x len(multires) scales; bilinear sampling with
border padding and align_corners=True; Hadamard product over the three
planes within a scale; concatenation over scales.

Parameters are a plain pytree {"grids": [[plane_xy, plane_xz, plane_yz],
...]} so optax param labeling stays trivial. Gradients flow to both the
grids and the query coordinates (the gaussian centers are trainable).
"""
from __future__ import annotations

import itertools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..ops.sampling import grid_sample_2d


class TriplaneConfig(NamedTuple):
    resolution: Sequence[int] = (64, 64, 64)
    out_dim: int = 32
    multires: Sequence[int] = (1, 2, 4)
    bounds: float = 1.0  # AABB half-extent; can be reset per subject

    @property
    def feat_dim(self):
        return self.out_dim * len(self.multires)


# axis pairs per plane, matching itertools.combinations(range(3), 2):
# (0,1) -> xy, (0,2) -> xz, (1,2) -> yz (hexplane.py:78-80)
COO_COMBS = list(itertools.combinations(range(3), 2))


def init_triplane(key: jax.Array, cfg: TriplaneConfig) -> dict:
    """Uniform [0.1, 0.5) init like the reference (hexplane.py:39)."""
    grids = []
    for mult in cfg.multires:
        planes = []
        for (a, b) in COO_COMBS:
            key, sub = jax.random.split(key)
            # torch layout [1, C, reso[b], reso[a]] (reversed coo_comb);
            # we store (C, H=reso[b], W=reso[a])
            shape = (cfg.out_dim, cfg.resolution[b] * mult,
                     cfg.resolution[a] * mult)
            planes.append(jax.random.uniform(sub, shape, jnp.float32,
                                             0.1, 0.5))
        grids.append(planes)
    return {"grids": grids}


def normalize_aabb(pts: jax.Array, bounds: float) -> jax.Array:
    """Map [-bounds, bounds] -> [-1, 1] (hexplane.py:162-163).

    The reference stores aabb = [[b,b,b], [-b,-b,-b]] and computes
    (pts - b) * (2 / (-2b)) - 1 = -pts/b - 1 + ... reproduce exactly:
    (pts - aabb0) * (2 / (aabb1 - aabb0)) - 1 with aabb0=b, aabb1=-b.
    """
    return (pts - bounds) * (2.0 / (-2.0 * bounds)) - 1.0


def triplane_features(params: dict, pts: jax.Array,
                      cfg: TriplaneConfig) -> jax.Array:
    """(N, 3) points -> (N, feat_dim) features."""
    q = normalize_aabb(pts, cfg.bounds)
    outs = []
    for planes in params["grids"]:
        interp = 1.0
        for plane, (a, b) in zip(planes, COO_COMBS):
            coords = q[:, (a, b)]  # x indexes W (axis a), y indexes H (axis b)
            interp = interp * grid_sample_2d(plane, coords)
        outs.append(interp)
    return jnp.concatenate(outs, axis=-1)
