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

    # 8. KNN edge statistic at capacity (dense exact, hw approx top-k)
    from sings_tpu.losses.regularizers import edge_stat

    t("knn stat dense", lambda x: edge_stat(x, buffers.alive, k=9),
      attrs["xyz_canon"])

    # 9. photometric fwd+bwd at training config (L1+SSIM+patches)
    from sings_tpu.losses.photometric import photometric_loss

    w = tr.step_cfg.weights
    gt = jnp.zeros((3, tr.camera.height, tr.camera.width)).at[1].set(0.4)
    mask = jnp.ones((tr.camera.height, tr.camera.width))
    render_img = jax.jit(render)(xyz, scales, shs)

    def lpips_fn(a, b):
        from sings_tpu.losses.lpips import lpips_distance
        return lpips_distance(tr.lpips_params, a, b)

    def photo(img):
        tot, _ = photometric_loss(
            jax.random.PRNGKey(0), img, gt, mask, jnp.zeros(3),
            w.photometric, lpips_fn if w.photometric.lpips > 0 else None)
        return tot
    t("photometric fwd+bwd", jax.grad(photo), render_img)

    # 10. laplacian terms fwd+bwd (fused pos + hands + color)
    def laps(xyzc, shs):
        pos = tr.region_lap.loss_fused(
            [(xyzc, tr.lap_pos_w, None),
             (xyzc, jnp.ones_like(tr.lap_pos_w), [6, 7])])
        col = tr.region_lap.loss(shs[:, 0], tr.lap_color_w)
        return pos[0] + pos[1] + col
    t("laplacians fwd+bwd", jax.grad(laps, argnums=(0, 1)),
      attrs["xyz_canon"], attrs["shs"])

    # 11. the FULL train step body (everything, incl. optimizer)
    batch = {"rgb": gt, "mask": mask, "idx": jnp.asarray(0),
             "smpl_scale": jnp.ones(1)}

    def full_step(params, buffers, opt_state):
        p, b, o, m, _ = tr.train_step_body(
            params, buffers, opt_state, tr.cache, batch,
            jax.random.PRNGKey(1), jnp.asarray(500), jnp.asarray(0),
            tr.region_lap, tr.region_lap, tr.lap_pos_w, tr.lap_color_w)
        return p, b, o, m["loss"]
    t("FULL step (per-step knn)", full_step, params, buffers,
      tr.opt_state)


if __name__ == "__main__":
    main()
