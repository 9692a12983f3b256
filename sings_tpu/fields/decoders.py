"""Geometry / appearance decoder MLPs (functional pytrees).

Rebuild of the reference decoders (sings/rec/models/modules/decoders.py):
  GeometryDecoder: 2-layer GELU trunk -> xyz_offsets(3), rot6d(6, only
    anisotropic), scales via softplus through a 2-layer head (1 channel
    broadcast to 3 when isotropic).
  AppearanceDecoder: trunk -> SH coeffs (16x3) + sigmoid opacity with a
    resettable additive offset used by opacity resets
    (decoders.py:36-39, sings_hybrid.py:1260-1278).

Initialization matches torch.nn.Linear defaults (kaiming-uniform
weights, uniform bias in +-1/sqrt(fan_in)) so training dynamics match.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _linear_init(key, fan_in, fan_out):
    k1, k2 = jax.random.split(key)
    bound_w = np.sqrt(1.0 / fan_in) * np.sqrt(3.0)  # kaiming uniform a=sqrt5
    bound_b = np.sqrt(1.0 / fan_in)
    w = jax.random.uniform(k1, (fan_in, fan_out), jnp.float32,
                           -bound_w, bound_w)
    b = jax.random.uniform(k2, (fan_out,), jnp.float32, -bound_b, bound_b)
    return {"w": w, "b": b}


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _gelu(x):
    # exact erf GELU: torch nn.GELU defaults to approximate='none'
    # (reference decoders.py act_fn_dict); jax.nn.gelu defaults to the
    # tanh approximation, which diverges ~1e-3
    return jax.nn.gelu(x, approximate=False)


class DecoderConfig(NamedTuple):
    n_features: int = 96          # triplane feat_dim (32 x 3 scales)
    isotropic: bool = True
    fixed_opacity: bool = False
    geo_hidden: int = 128
    app_hidden: int = 64
    sh_coeffs: int = 16


def init_geometry_decoder(key, cfg: DecoderConfig) -> dict:
    keys = jax.random.split(key, 6)
    p = {
        "net0": _linear_init(keys[0], cfg.n_features, cfg.geo_hidden),
        "net1": _linear_init(keys[1], cfg.geo_hidden, cfg.geo_hidden),
        "xyz": _linear_init(keys[2], cfg.geo_hidden, 3),
        "scales0": _linear_init(keys[3], cfg.geo_hidden, cfg.geo_hidden),
        "scales1": _linear_init(keys[4], cfg.geo_hidden,
                                1 if cfg.isotropic else 3),
    }
    if not cfg.isotropic:
        p["rot"] = _linear_init(keys[5], cfg.geo_hidden, 6)
    return p


def geometry_decoder(p: dict, feats: jax.Array, cfg: DecoderConfig) -> dict:
    x = _gelu(_linear(p["net0"], feats))
    x = _gelu(_linear(p["net1"], x))
    xyz_offsets = _linear(p["xyz"], x)
    rotations = _linear(p["rot"], x) if not cfg.isotropic else None
    s = _gelu(_linear(p["scales0"], x))
    scales_aux = _linear(p["scales1"], s)
    scales = jax.nn.softplus(scales_aux)
    if scales.shape[-1] == 1:
        scales_aux = jnp.repeat(scales_aux, 3, axis=-1)
        scales = jnp.repeat(scales, 3, axis=-1)
    return {
        "xyz_offsets": xyz_offsets,
        "rotations": rotations,
        "scales": scales,
        "scales_aux": scales_aux,
    }


def init_appearance_decoder(key, cfg: DecoderConfig) -> dict:
    keys = jax.random.split(key, 4)
    p = {
        "net0": _linear_init(keys[0], cfg.n_features, cfg.app_hidden),
        "net1": _linear_init(keys[1], cfg.app_hidden, cfg.app_hidden),
        "shs": _linear_init(keys[2], cfg.app_hidden, cfg.sh_coeffs * 3),
    }
    if not cfg.fixed_opacity:
        p["opacity"] = _linear_init(keys[3], cfg.app_hidden, 1)
    return p


def appearance_decoder(p: dict, feats: jax.Array, cfg: DecoderConfig,
                       opacity_offset: jax.Array | float = 0.0) -> dict:
    x = _gelu(_linear(p["net0"], feats))
    x = _gelu(_linear(p["net1"], x))
    shs = _linear(p["shs"], x).reshape(-1, cfg.sh_coeffs, 3)
    if cfg.fixed_opacity:
        opacity = jnp.ones((feats.shape[0], 1), feats.dtype)
    else:
        logit = _linear(p["opacity"], x)
        opacity = jax.nn.sigmoid(logit + opacity_offset)
    return {"shs": shs, "opacity": opacity}


def appearance_opacity_logit(p: dict, feats: jax.Array,
                             cfg: DecoderConfig) -> jax.Array:
    """Raw opacity logit, used to recompute the reset offset
    (reference reset_opacity: offset = where(logit > 0, 0, -logit))."""
    x = _gelu(_linear(p["net0"], feats))
    x = _gelu(_linear(p["net1"], x))
    return _linear(p["opacity"], x)
