"""Component-level device timings at training shapes.

Breaks the ~180 ms/step base cost (profile_step.py ablations showed the
loss terms are nearly free) into: field decode fwd, field fwd+bwd
(triplane scatter-add backward), full avatar forward, rasterize fwd,
rasterize fwd+bwd, optimizer update. Run with the TPU idle.
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sings_tpu.config.core import load_config
from sings_tpu.config.defaults import DEFAULTS
from sings_tpu.model.avatar import avatar_forward, get_gs_attrs
from sings_tpu.ops.rasterizer.api import rasterize
from sings_tpu.ops.timing import device_time
from sings_tpu.train.trainer import Trainer


def main():
    cfg = load_config(DEFAULTS, "configs/human_complex.yaml", [
        "output_path=/tmp/profile_run", "exp_name=prof",
        "train.init_steps=1", "tpu.auto_fit_synthetic=False",
    ])
    tr = Trainer(cfg)
    params, buffers, acfg = tr.params, tr.buffers, tr.avatar_cfg
    print(f"capacity={acfg.capacity} image={tr.camera.width}x"
          f"{tr.camera.height}", flush=True)

    def t(name, fn, *args):
        ms = device_time(fn, args, k1=1, k2=4, repeats=2) * 1e3
        print(f"{name}: {ms:.2f} ms", flush=True)
        return ms

    # 1. field decode forward
    t("decode fwd", lambda p: get_gs_attrs(p, buffers, acfg)["scales"],
      params)

    # 2. field decode fwd+bwd (triplane gather backward = grid scatter)
    def decode_loss(p):
        o = get_gs_attrs(p, buffers, acfg)
        return sum(jnp.sum(o[k]) for k in
                   ("xyz_canon", "scales", "shs", "opacity"))
    t("decode fwd+bwd", jax.grad(decode_loss), params)

    # 3. full avatar forward (decode + smpl + lbs)
    def fwd(p):
        out = avatar_forward(p, buffers, acfg, tr.template, tr.cache,
                             smpl_scale=jnp.ones(1), dataset_idx=0)
        return out["xyz"], out["scales"], out["rotq"], out["shs"], \
            out["opacity"]
    t("avatar fwd", fwd, params)

    # 4/5. rasterize fwd and fwd+bwd at training shapes
    xyz, scales, rotq, shs, opac = jax.jit(fwd)(params)
    alive = buffers.alive > 0.5

    def render(xyz, scales, shs):
        pkg = rasterize(xyz, scales, rotq, opac[:, 0], shs, tr.camera,
                        sh_degree=3, alive=alive, **tr.raster_kw)
        return pkg["render"]
    t("rasterize fwd", render, xyz, scales, shs)
    t("rasterize fwd+bwd",
      jax.grad(lambda *a: jnp.sum(render(*a) ** 2), argnums=(0, 1, 2)),
      xyz, scales, shs)

    # 6. optimizer update alone
    zeros = jax.tree.map(jnp.zeros_like, params)

    def opt(p, s):
        u, s = tr.tx.update(zeros, s, p)
        import optax
        return optax.apply_updates(p, u)
    t("adam update", opt, params, tr.opt_state)

    # 7. smpl + lbs alone (avatar fwd minus decode)
    attrs = jax.jit(lambda p: get_gs_attrs(p, buffers, acfg))(params)
    attrs = jax.tree.map(jax.lax.stop_gradient, attrs)

    def pose_only(xyzc):
        out = avatar_forward(
            params, buffers, acfg, tr.template, tr.cache,
            smpl_scale=jnp.ones(1), dataset_idx=0,
            gs_attrs=dict(attrs, xyz_canon=xyzc))
        return out["xyz"]
    t("pose fwd", pose_only, attrs["xyz_canon"])


if __name__ == "__main__":
    main()
