"""Rasterizer sweep at the TRUE training distribution (VERDICT r4 #3).

The bench scene (50k random gaussians, scales 0.004-0.02) measured
pair_cap as a loss — but the trained avatar's gaussians are ~3x more
numerous and much SMALLER (scales track the KNN edge statistic,
p99 ~ 0.006), so most enumeration slots of cap = max_span^2 = 9 are
invalid and ride both global sorts as dead keys. This sweep times the
full differentiable raster on the r3b checkpoint's REAL decoded
gaussians at the training camera.

Usage: python scripts/sweep_raster_recipe.py [run_dir]
"""
import os
import sys

os.makedirs("/root/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import glob

import jax.numpy as jnp
import numpy as np

from sings_tpu.config.core import load_config
from sings_tpu.config.defaults import DEFAULTS
from sings_tpu.model.avatar import avatar_forward
from sings_tpu.ops.rasterizer.api import rasterize
from sings_tpu.ops.rasterizer.common import preprocess
from sings_tpu.ops.rasterizer.tiles import bin_gaussians
from sings_tpu.ops.timing import device_time
from sings_tpu.train.step import sh_degree_mask
from sings_tpu.train.trainer import Trainer

outdir = sys.argv[1] if len(sys.argv) > 1 else "work/run_r3b"
saved = glob.glob(os.path.join(outdir, "*", "*", "config_train.yaml"))
cfg = load_config(DEFAULTS, saved[0] if saved else
                  "configs/human_complex.yaml",
                  [f"output_path={outdir}"])
tr = Trainer(cfg, mode="train")
assert tr.step > 0, "needs a finished run's checkpoint"

out = jax.jit(lambda p: avatar_forward(
    p, tr.buffers, tr.avatar_cfg, tr.template, tr.cache,
    smpl_scale=jnp.ones(1), dataset_idx=0))(tr.params)
xyz = jax.lax.stop_gradient(out["xyz"])
scales = jax.lax.stop_gradient(out["scales"])
rotq = jax.lax.stop_gradient(out["rotq"])
opac = jax.lax.stop_gradient(out["opacity"][:, 0])
shs = jax.lax.stop_gradient(out["shs"] * sh_degree_mask(
    jnp.asarray(3))[None, :, None])
alive = tr.buffers.alive > 0.5
cam = tr.camera
n = xyz.shape[0]
print(f"n={n} alive={int(tr.buffers.alive.sum())} "
      f"img={cam.height}x{cam.width}", flush=True)
sc = np.asarray(scales)[np.asarray(alive)]
print(f"scales p50/p99: {np.percentile(sc, 50):.4f} "
      f"{np.percentile(sc, 99):.4f}", flush=True)

ntx, nty = -(-cam.width // 16), -(-cam.height // 16)
base_kw = dict(tr.raster_kw)

# overflow accounting across pair_cap / max_span at the real scene
g2d = jax.jit(lambda: preprocess(
    xyz, scales, rotq, opac, shs, cam, sh_degree=3, alive=alive,
    tile=base_kw.get("tile", 16)))()
for ms_, pc, mw, tc in ((3, None, 4, None), (3, 4, 4, None),
                        (2, None, 4, None),
                        (3, 4, 2, -(-g2d.means2d.shape[0] // 4 // 128) * 128),
                        (3, 4, 3, -(-g2d.means2d.shape[0] // 8 // 128) * 128)):
    b = bin_gaussians(g2d, tile=16, n_tiles_x=ntx, n_tiles_y=nty,
                      max_span=ms_, align=128,
                      max_pairs=base_kw.get("max_pairs"), pair_cap=pc,
                      main_width=mw, tail_capacity=tc)
    print(f"max_span={ms_} pair_cap={pc} mw={mw} tc={tc}: "
          f"pairs={int(b.num_pairs)} overflow={int(b.overflow)}",
          flush=True)


def run(tag, **over):
    kw = dict(base_kw)
    kw.update(over)
    try:
        _run_inner(tag, kw)
    except Exception as e:  # a failed variant must not kill the sweep
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def _run_inner(tag, kw):

    def loss(xyz, scales, opac, shs):
        pkg = rasterize(xyz, scales, rotq, opac, shs, cam, sh_degree=3,
                        bg=jnp.zeros(3), alive=alive, **kw)
        return jnp.sum(pkg["render"] ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))
    dt = device_time(g, (xyz, scales, opac, shs), k1=1, k2=5,
                     repeats=2) * 1e3
    print(f"{tag}: fwd+bwd {dt:.2f} ms", flush=True)


# chip-time-trimmed variant set (each run is a cold remote compile).
# r5 first pass (run_r4 ckpt, docs/PERF.md): base 45.36, pc4 28.25
# (-38%, adopted), tile8 76.81, tile8+pc4 55.61. This pass measures the
# panel layout and the narrow un-sort glue at the adopted pc4 point:
# with pair_cap=4 the main_slot table is (N, 4) but the trained
# distribution averages ~1.9 real pairs/gaussian, so main_width=2 plus
# a compacted tail should cut the row-count-bound un-sort gather ~40%.
run("pc4", pair_cap=4)
run("pc4 panel", pair_cap=4, layout="panel")
run("pc4 mw2", pair_cap=4, main_width=2,
    tail_capacity=-(-n // 4 // 128) * 128)
run("pc4 mw2 panel", pair_cap=4, main_width=2,
    tail_capacity=-(-n // 4 // 128) * 128, layout="panel")
run("pc4 mw3 panel", pair_cap=4, main_width=3,
    tail_capacity=-(-n // 8 // 128) * 128, layout="panel")
