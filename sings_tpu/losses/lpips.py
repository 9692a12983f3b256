"""LPIPS perceptual distance (VGG16 backbone), pure JAX.

Architecture-faithful rebuild of the `lpips` package the reference
imports (sings/rec/losses/loss.py:5,34): VGG16 conv features at
relu{1_2, 2_2, 3_3, 4_3, 5_3}, per-channel unit normalization, squared
difference, learned 1x1 linear heads, spatial + layer aggregation, with
the standard ImageNet shift/scale on inputs.

Weight provenance: this environment has no network egress and no cached
torchvision/lpips checkpoints, so pretrained VGG weights cannot be
downloaded. `load_weights(path)` accepts an .npz export of the official
weights (keys conv{i}_w/conv{i}_b, lin{j}_w) for metric-grade parity;
`init_random(key)` provides deterministic random features otherwise —
random multi-scale VGG features are a known usable perceptual loss
(training signal), but reported LPIPS *metric* values are then not
comparable to the reference's.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before)
_VGG_PLAN = [
    (64, False), (64, False),          # relu1_2 -> slice 0
    (128, True), (128, False),         # relu2_2 -> slice 1
    (256, True), (256, False), (256, False),   # relu3_3 -> slice 2
    (512, True), (512, False), (512, False),   # relu4_3 -> slice 3
    (512, True), (512, False), (512, False),   # relu5_3 -> slice 4
]
_SLICE_ENDS = {1, 3, 6, 9, 12}
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPSParams(NamedTuple):
    convs: tuple      # ((w (3,3,cin,cout), b (cout,)), ...)
    lins: tuple       # ((cout,) per slice)
    pretrained: bool


def init_random(key: jax.Array) -> LPIPSParams:
    convs = []
    cin = 3
    for cout, _ in _VGG_PLAN:
        key, k1 = jax.random.split(key)
        std = np.sqrt(2.0 / (9 * cin))
        w = jax.random.normal(k1, (3, 3, cin, cout), jnp.float32) * std
        convs.append((w, jnp.zeros((cout,), jnp.float32)))
        cin = cout
    lin_dims = [64, 128, 256, 512, 512]
    lins = tuple(jnp.ones((d,), jnp.float32) / d for d in lin_dims)
    return LPIPSParams(convs=tuple(convs), lins=lins, pretrained=False)


def load_weights(path: str) -> LPIPSParams:
    data = np.load(path)
    convs = tuple(
        (jnp.asarray(data[f"conv{i}_w"]), jnp.asarray(data[f"conv{i}_b"]))
        for i in range(len(_VGG_PLAN))
    )
    lins = tuple(jnp.asarray(data[f"lin{j}_w"]).reshape(-1) for j in range(5))
    return LPIPSParams(convs=convs, lins=lins, pretrained=True)


def get_lpips(weights_path: str | None = None,
              seed: int = 0) -> LPIPSParams:
    if weights_path and os.path.exists(weights_path):
        return load_weights(weights_path)
    return init_random(jax.random.PRNGKey(seed))


def _vgg_slices(params: LPIPSParams, x: jax.Array) -> list[jax.Array]:
    """x: (B, 3, H, W) in [0, 1] -> list of 5 feature maps (B, C, h, w)."""
    x = (x - 0.5) * 2.0  # lpips scaling_layer input convention [-1,1]
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(
        _SCALE)[None, :, None, None]
    feats = []
    for i, ((w, b), (cout, pool)) in enumerate(zip(params.convs, _VGG_PLAN)):
        if pool:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NCHW", "HWIO", "NCHW"))
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn)
        x = jax.nn.relu(x + b[None, :, None, None])
        if i in _SLICE_ENDS:
            feats.append(x)
    return feats


def lpips_distance(params: LPIPSParams, x: jax.Array,
                   y: jax.Array) -> jax.Array:
    """(B, 3, H, W) pairs in [0,1] -> (B,) perceptual distances."""
    fx = _vgg_slices(params, x)
    fy = _vgg_slices(params, y)
    total = 0.0
    for fa, fb, lin in zip(fx, fy, params.lins):
        na = fa / jnp.sqrt(jnp.sum(fa**2, axis=1, keepdims=True) + 1e-10)
        nb = fb / jnp.sqrt(jnp.sum(fb**2, axis=1, keepdims=True) + 1e-10)
        diff = (na - nb) ** 2
        weighted = jnp.einsum("bchw,c->bhw", diff, lin)
        total = total + weighted.mean(axis=(1, 2))
    return total
