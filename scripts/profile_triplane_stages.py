"""Stage-level attribution of the field-decode cost at the recipe shape.

docs/PERF.md r4: field decode fwd+bwd = 50.7 ms (fwd 12.5) at 127.7k
capacity — the single biggest step term after the rasterizer. The r4
nested-triplane toggle measured ~0 at the step level, so the cost is
NOT in the corner gathers. This probe times each stage of
fields/triplane.py's nested backward in isolation on the chip:

  * full triplane fwd / fwd+bwd (nested and plain-fused variants)
  * decoder MLPs alone
  * the backward's components: per-orientation sort, blocked cumsum,
    wv[order] gather, searchsorted + boundary-difference gathers, the
    dq weight-path vjp, and the forward's combined-row table build.

Run: timeout 1800 python scripts/profile_triplane_stages.py [N]
"""
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.fields.decoders import (
    DecoderConfig, appearance_decoder, geometry_decoder,
    init_appearance_decoder, init_geometry_decoder,
)
from sings_tpu.fields.triplane import (
    COO_COMBS, TriplaneConfig, _cumsum_rows, _nested_gather,
    init_triplane, normalize_aabb, triplane_features,
)
from sings_tpu.ops.timing import device_time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 148224
S, C = 3, 32


def t(name, fn, *args):
    ms = device_time(fn, args, k1=1, k2=4, repeats=2) * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)


def main():
    cfg_n = TriplaneConfig(nested=True)
    cfg_f = TriplaneConfig(nested=False)
    params_n = init_triplane(jax.random.PRNGKey(0), cfg_n)
    params_f = init_triplane(jax.random.PRNGKey(0), cfg_f)
    dcfg = DecoderConfig()
    geo_p = init_geometry_decoder(jax.random.PRNGKey(1), dcfg)
    app_p = init_appearance_decoder(jax.random.PRNGKey(2), dcfg)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(N, 3).astype(np.float32) * 1.6 - 0.8)
    print(f"N = {N}", flush=True)

    # ---- end-to-end field decode
    def feats_fn(params, cfg, pts):
        return triplane_features(params, pts, cfg)

    def decode_loss(params, cfg, pts):
        f = triplane_features(params, pts, cfg)
        geo = geometry_decoder(geo_p, f, dcfg)
        app = appearance_decoder(app_p, f, dcfg, jnp.zeros(()))
        return (jnp.sum(geo["xyz_offsets"] ** 2) + jnp.sum(geo["scales"])
                + jnp.sum(app["shs"] ** 2) + jnp.sum(app["opacity"]))

    for name, params, cfg in (("nested", params_n, cfg_n),
                              ("fused", params_f, cfg_f)):
        t(f"triplane fwd ({name})",
          lambda p, q: jnp.sum(feats_fn(p, cfg, q)), params, pts)
        t(f"triplane fwd+bwd-to-grids+pts ({name})",
          jax.grad(lambda p, q: jnp.sum(feats_fn(p, cfg, q) ** 2),
                   argnums=(0, 1)), params, pts)
        t(f"decode fwd+bwd ({name})",
          jax.grad(lambda p, q: decode_loss(p, cfg, q), argnums=(0, 1)),
          params, pts)

    # ---- decoder MLPs alone
    feats0 = triplane_features(params_n, pts, cfg_n)

    def mlp_loss(gp, ap, f):
        geo = geometry_decoder(gp, f, dcfg)
        app = appearance_decoder(ap, f, dcfg, jnp.zeros(()))
        return (jnp.sum(geo["xyz_offsets"] ** 2) + jnp.sum(geo["scales"])
                + jnp.sum(app["shs"] ** 2) + jnp.sum(app["opacity"]))

    t("decoder MLPs fwd+bwd", jax.grad(mlp_loss, argnums=(0, 1, 2)),
      geo_p, app_p, feats0)

    # ---- nested backward stages in isolation
    meta = tuple(
        (a, b, p.shape[1], p.shape[2])
        for planes in params_n["grids"]
        for p, (a, b) in zip(planes, COO_COMBS))
    flat = tuple(p for planes in params_n["grids"] for p in planes)
    q = normalize_aabb(pts, cfg_n.bounds)

    t("fwd: combined-row table build + gather (_nested_gather)",
      lambda g, qq: [r.sum() for r in _nested_gather(meta, g, qq)[0]],
      flat, q)

    # one orientation's reduction pipeline at (N, S*4C)
    wv = jnp.asarray(rng.randn(N, S * 4 * C).astype(np.float32))
    codes = jnp.asarray(rng.randint(0, 256 * 256, N).astype(np.int32))

    t("bwd stage: sort_key_val (N int32) x3",
      lambda c: [jax.lax.sort_key_val(
          c + i, jnp.arange(N, dtype=jnp.int32))[0].sum()
          for i in range(3)], codes)

    order = jax.lax.sort_key_val(codes, jnp.arange(N, dtype=jnp.int32))[1]
    t("bwd stage: wv[order] gather (N, S*4C) x3",
      lambda w, o: [w[(o + i) % N].sum() for i in range(3)], wv, order)

    t("bwd stage: _cumsum_rows (N, S*4C) x3",
      lambda w: [_cumsum_rows(w + i).sum() for i in range(3)], wv)

    skey = jax.lax.sort_key_val(codes, jnp.arange(N, dtype=jnp.int32))[0]
    cells_per_level = [(64 * 64), (128 * 128), (256 * 256)]

    def boundary(w, sk):
        outs = []
        csum = _cumsum_rows(w)
        csum = jnp.concatenate(
            [jnp.zeros((1, w.shape[1]), w.dtype), csum], 0)
        for o in range(3):
            for nc in cells_per_level:
                lo = jnp.searchsorted(
                    sk, jnp.arange(nc, dtype=jnp.int32), side="left",
                    method="sort").astype(jnp.int32)
                hi = jnp.searchsorted(
                    sk, jnp.arange(1, nc + 1, dtype=jnp.int32),
                    side="left", method="sort").astype(jnp.int32)
                block = csum[:, :4 * C]
                outs.append((block[hi] - block[lo]).sum())
        return outs

    t("bwd stage: searchsorted + boundary gathers (9 levels, incl 1 cumsum)",
      boundary, wv, skey)

    # dq weight path (9 tiny vjps)
    def dq_path(qq):
        from sings_tpu.fields.triplane import _corner_coords, _weights
        acc = 0.0
        for (a, b, h, w) in meta:
            coords = qq[:, (a, b)]
            _, _, tx, ty = _corner_coords(coords, h, w)
            acc = acc + jnp.sum(_weights(tx, ty) ** 2)
        return acc

    t("bwd stage: dq weight path (autodiff, 9 planes)",
      jax.grad(dq_path), q)


if __name__ == "__main__":
    main()
