"""Training orchestrator (reference sings/rec/trainer/gs_trainer.py).

Owns the host-side loop: data selection, the single jitted train step,
periodic checkpoint/validation/animation/visualization, SH-degree
annealing, and density control (host-side topology surgery between
jitted steps). All schedule behavior matches the reference's
_adjust_density / _periodic_check quirks (SURVEY.md section 7),
including the densify_interval += 1 drift after a prune.
"""
from __future__ import annotations

import functools
import json
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config.defaults import (
    DEFAULT_COLOR_REGIONS_W, DEFAULT_POSITION_REGIONS_W, parse_region_weights,
)
from ..fields.decoders import DecoderConfig
from ..fields.triplane import TriplaneConfig
from ..kinematics.body_model import load_template
from ..kinematics.template import (
    DeviceTemplate, canonical_pose_cache,
)
from ..losses.lpips import get_lpips, lpips_distance
from ..losses.photometric import PhotometricWeights
from ..losses.regularizers import (
    L2NormConfig, build_cot_region_laplacian, build_region_laplacian,
    shard_region_laplacian,
)
from ..model.avatar import (
    AvatarConfig, avatar_forward, avatar_forward_chunk, fit_initial_attrs,
    get_gs_attrs, init_avatar, initial_attr_targets,
)
from ..model.density import densify_and_subdivide, prune_and_simplify
from ..ops.rasterizer.api import rasterize
from ..ops.ssim import psnr, ssim
from ..data.anim import load_anim_dataset
from ..data.cameras import get_rotating_cameras, get_smpl_static_params
from ..data.kit import TrainingKit, load_kit
from ..export.ply import save_ply, save_splat
from ..fields.decoders import appearance_opacity_logit
from ..fields.triplane import triplane_features
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .optim import LRConfig, TrainFlags, make_optimizer, zero_moments_for_slots
from .step import LossWeights, StepConfig, make_train_step


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def default_raster_kw(cfg, height, width):
    kw = dict(
        tile=cfg.tpu.raster.tile,
        chunk=cfg.tpu.raster.chunk,
        max_span=cfg.tpu.raster.max_span,
        max_pairs=cfg.tpu.raster.max_pairs,
        main_width=cfg.tpu.raster.main_width,
        tail_capacity=cfg.tpu.raster.tail_capacity,
        pair_cap=cfg.tpu.raster.get("pair_cap"),
        scan_roll=bool(cfg.tpu.raster.get("scan_roll", False)),
        layout=cfg.tpu.raster.get("layout", "tiled"),
    )
    if jax.default_backend() != "tpu":
        kw.update(chunk=8, interpret=True)
    return kw


class Trainer:
    def __init__(self, cfg, mode: str = "train"):
        self.cfg = cfg
        self.rng = jax.random.PRNGKey(cfg.seed)
        random.seed(cfg.seed)
        np.random.seed(cfg.seed)

        self.logdir = cfg.logdir or os.path.join(
            cfg.output_path, cfg.exp_name, cfg.dataset.name)
        self.logdir_ckpt = cfg.logdir_ckpt or os.path.join(
            self.logdir, "ckpt")
        for sub in ("", "ckpt", "val", "train", "anim", "meshes", "canon"):
            os.makedirs(os.path.join(self.logdir, sub), exist_ok=True)
        # per-run log file (reference train_avatar.py:18-52 get_logger)
        from .logging_util import install_run_log
        install_run_log(self.logdir, mode)

        self.bg_color = (jnp.ones(3) if cfg.bg_color == "white"
                         else jnp.zeros(3))

        # ---------------- data
        kit_dir = os.path.join(cfg.dataset.root_dir, cfg.dataset.batch or "",
                               cfg.dataset.name, cfg.dataset.seq or "")
        self.kit: TrainingKit = load_kit(
            os.path.normpath(kit_dir),
            downscale=int(cfg.dataset.get("downscale", 1) or 1),
            max_frames=cfg.dataset.get("max_frames"),
        )
        self.camera = self.kit.camera
        self.images = jnp.asarray(self.kit.images)
        self.masks = jnp.asarray(self.kit.masks)

        self.anim_dataset = None
        if cfg.anim_cfg_path and os.path.exists(cfg.anim_cfg_path):
            import yaml

            with open(cfg.anim_cfg_path) as fh:
                ac = yaml.safe_load(fh)
            self.anim_dataset = load_anim_dataset(
                ac["motion_src"], ac.get("motion_type", "custom"),
                ac.get("motion_start", 0), ac.get("motion_end", -1),
                ac.get("motion_skip", 1),
                tuple(ac.get("render_size", (512, 512))),
                rebase=ac.get("motion_rebase"),
                fx=float(ac.get("fx", 5000.0)),
                fy=float(ac.get("fy", 5000.0)),
            )

        # ---------------- body template
        hcfg = cfg.human
        model_dir = os.path.join(cfg.tpu.smpl_model_dir, hcfg.body_template)
        self.tpl = load_template(
            model_dir, hcfg.body_template,
            num_betas=len(self.kit.smpl["betas"]),
            n_subdivision=hcfg.n_subdivision,
            synthetic_res=float(cfg.tpu.get("synthetic_res", 1.0)),
        )
        if self.tpl.name == "synthetic":
            # the kit's betas parametrize the real (licensed) SMPL; on
            # the synthetic template they are meaningless AND the wrong
            # size (the template appends bone-proportion dims) — zero
            # them at the template's dimension. The calibration below
            # (or its cache) replaces them with fitted values.
            smpl = dict(self.kit.smpl)
            smpl["betas"] = np.zeros(self.tpl.num_betas, np.float32)
            self.kit = self.kit._replace(smpl=smpl)
        if (self.tpl.name == "synthetic"
                and cfg.tpu.get("auto_fit_synthetic", True)):
            # the kit's SMPL fits assume the real (licensed) SMPL body;
            # calibrate the synthetic template's skeleton proportions +
            # per-frame poses against the kit's sapiens keypoints and
            # masks so photometric training starts geometrically
            # aligned. In eval mode this only loads the cached
            # calibration (the anim-time contract needs the same betas
            # dim as the checkpoint).
            self._fit_synthetic_body(hcfg)
        self.template = DeviceTemplate.from_host(self.tpl)

        # simultaneous multi-case training (train/trainer_cases.py)
        # stacks per-frame pose params across cases, so every case must
        # carry the same frame capacity; pad by repeating the last frame
        pad_f = int(cfg.dataset.get("pad_frames_to", 0) or 0)
        if pad_f > self.kit.smpl["body_pose"].shape[0]:
            smpl = dict(self.kit.smpl)
            extra = pad_f - smpl["body_pose"].shape[0]
            for k in ("body_pose", "global_orient", "transl"):
                smpl[k] = np.concatenate(
                    [smpl[k], np.repeat(smpl[k][-1:], extra, axis=0)])
            self.kit = self.kit._replace(smpl=smpl)

        # ---------------- avatar config + state
        n = self.tpl.num_verts
        max_n = int(hcfg.density_control.max_n_gaussians)
        # densify headroom above the template init; the KNN edge loss is
        # ~quadratic in capacity, so recipes trade headroom (1.25x) for
        # a higher-resolution template rather than letting a small init
        # grow into a big buffer (tpu.capacity_mult)
        cap_mult = float(cfg.tpu.get("capacity_mult", 2.0))
        capacity = _round_up(min(max_n, int(n * cap_mult)), 256)
        tri = TriplaneConfig(
            resolution=tuple(hcfg.kplanes.resolution),
            out_dim=hcfg.kplanes.output_coordinate_dim,
            multires=tuple(hcfg.kplanes.multires),
            # +1 grid points so multires cells nest -> 3x fewer triplane
            # gather rows + one fused Morton reduction in backward
            # (fields/triplane.py nested path; PARITY.md deviation)
            nested=bool(cfg.tpu.get("triplane_nested", False)),
        )
        dec = DecoderConfig(
            n_features=tri.feat_dim,
            isotropic=hcfg.attribute_control.isotropic,
            fixed_opacity=hcfg.attribute_control.fixed_opacity,
        )
        self.avatar_cfg = AvatarConfig(
            capacity=capacity,
            face_capacity=_round_up(capacity * 3, 256),
            edge_capacity=_round_up(capacity * 4, 256),
            num_frames=self.kit.smpl["body_pose"].shape[0],
            num_betas=len(self.kit.smpl["betas"]),
            sh_degree=hcfg.sh_degree,
            isotropic=hcfg.attribute_control.isotropic,
            fixed_opacity=hcfg.attribute_control.fixed_opacity,
            init_opacity=hcfg.attribute_control.init_opacity,
            init_scale_multiplier=hcfg.attribute_control.init_scale_multiplier,
            thickness_factor=hcfg.attribute_control.thickness_factor,
            disable_posedirs=hcfg.disable_posedirs,
            canonical_pose=hcfg.canon_pose_type,
            body_template=hcfg.body_template,
            triplane=tri,
            decoder=dec,
            offset_clamp=float(cfg.tpu.get(
                "offset_clamp",
                0.05 if self.tpl.name == "synthetic" else 0.0)),
            scale_clamp=float(cfg.tpu.get(
                "scale_clamp",
                0.05 if self.tpl.name == "synthetic" else 0.0)),
        )

        betas = jnp.asarray(self.kit.smpl["betas"])
        self.cache = canonical_pose_cache(self.template, betas,
                                          hcfg.canon_pose_type)
        key, self.rng = jax.random.split(self.rng)
        state = init_avatar(key, self.avatar_cfg, self.tpl, self.cache,
                            self.kit.smpl)
        self.params = state.params
        self.buffers = state.buffers
        self.active_sh_degree = 0
        self.step = 0

        # ---------------- optimizer + step
        lr = LRConfig(
            position_init=hcfg.lr.position_init,
            position_final=hcfg.lr.position_final,
            position_delay_mult=hcfg.lr.position_delay_mult,
            position_max_steps=hcfg.lr.position_max_steps,
            smpl_spatial=hcfg.lr.smpl_spatial,
            vembed=hcfg.lr.vembed,
            geometry=hcfg.lr.geometry,
            appearance=hcfg.lr.appearance,
            smpl_pose=hcfg.lr.smpl_pose,
            smpl_betas=hcfg.lr.smpl_betas,
            smpl_trans=hcfg.lr.smpl_trans,
            mlp_max_steps=hcfg.lr.mlp_max_steps,
        )
        flags = TrainFlags(optim_pose=hcfg.optim_pose,
                           optim_betas=hcfg.optim_betas,
                           optim_trans=hcfg.optim_trans)
        self.tx = make_optimizer(
            lr, flags,
            grad_clip_norm=float(cfg.tpu.get("grad_clip_norm", 0.0) or 0.0))
        self.opt_state = self.tx.init(self.params)

        loss_cfg = hcfg.loss
        weights = LossWeights(
            photometric=PhotometricWeights(
                l1=loss_cfg.l1_w, ssim=loss_cfg.ssim_w,
                lpips=loss_cfg.lpips_w,
                num_patches=loss_cfg.num_patches,
                patch_size=min(loss_cfg.patch_size,
                               min(self.camera.height, self.camera.width)
                               // 2 * 2),
                grad_pyramid=float(loss_cfg.get("grad_pyramid_w", 0.0)),
                grad_pyramid_levels=int(
                    loss_cfg.get("grad_pyramid_levels", 3)),
            ),
            silhouette=float(loss_cfg.get("silhouette_w", 0.0)),
            l2=L2NormConfig(**{k: float(v) for k, v in loss_cfg.l2_norm.items()}),
            mesh_edge=float(loss_cfg.mesh_edge),
            gaussian_connect=float(loss_cfg.gaussian_connect),
            lap_position_strength=float(loss_cfg.laplacian.position_strength),
            lap_color_strength=float(loss_cfg.laplacian.color_strength),
            lap_impose_from=int(loss_cfg.laplacian.impose_from_iter),
        )
        dc = hcfg.density_control.hybrid
        self.inner_steps = int(cfg.tpu.get("inner_steps", 1) or 1)
        knn_backend = str(cfg.tpu.get("knn_backend", "auto"))
        if knn_backend == "auto":
            # "chunk": the EXACT dense statistic computed once per scan
            # chunk and held constant across its inner_steps — the
            # statistic is stop-gradient'd (loss_items.py:73-83
            # .detach()) and canonical positions move negligibly in 8
            # steps, so this amortizes the O(N^2) KNN (~31 ms @128k)
            # by inner_steps with no accuracy loss at the steps where
            # it is computed. ("window" Morton remains opt-in: ~85%
            # true-NN recall / ~5-7% mean statistic error.)
            knn_backend = "chunk" if self.inner_steps > 1 else "dense"
        self.step_cfg = step_cfg = StepConfig(
            weights=weights,
            opt_geo_from=hcfg.opt_geo_from,
            opt_app_from=hcfg.opt_app_from,
            opacity_norm_from=max(dc.prune_until_iter, dc.densify_until_iter),
            knn_backend=knn_backend,
            # the trainer passes ONE region laplacian for both the pos
            # and color slots (see _rebuild_laplacians) — fuse all
            # three terms into a single table/band stream
            lap_shared=True,
        )
        self.lpips_params = get_lpips(cfg.tpu.lpips_weights, seed=cfg.seed)
        if not self.lpips_params.pretrained and loss_cfg.lpips_w > 0:
            # random-feature LPIPS is a usable perceptual signal but its
            # gradient scale is uncalibrated — at the reference weight it
            # overwhelms L1 and drives colors to saturation
            factor = float(cfg.tpu.get("random_lpips_factor", 0.05))
            print(f"[lpips] no pretrained weights: scaling lpips_w "
                  f"{loss_cfg.lpips_w} -> {loss_cfg.lpips_w * factor}")
            weights = weights._replace(photometric=weights.photometric._replace(
                lpips=loss_cfg.lpips_w * factor))
            self.step_cfg = step_cfg = step_cfg._replace(weights=weights)
        self.raster_kw = default_raster_kw(cfg, self.camera.height,
                                           self.camera.width)
        self.train_step_body = make_train_step(
            self.avatar_cfg, step_cfg, self.template, self.camera, self.tx,
            self.lpips_params if loss_cfg.lpips_w > 0 else None,
            self.raster_kw,
        )
        self.train_step = jax.jit(self.train_step_body,
                                  donate_argnums=(0, 1, 2))
        from .step import make_train_scan

        stat_fn = None
        if knn_backend == "chunk":
            from ..losses.regularizers import edge_stat
            from ..model.avatar import get_canon_xyz

            def stat_fn(params, buffers):  # noqa: F811
                xyz = get_canon_xyz(params, buffers, self.avatar_cfg)
                return edge_stat(xyz, buffers.alive,
                                 k=step_cfg.knn_k)
        self.train_scan = make_train_scan(self.train_step_body, stat_fn)

        # ---------------- optional (dp, gs) device mesh (dist/)
        mesh_cfg = dict(cfg.tpu.get("mesh", {}) or {})
        mesh_dp = int(mesh_cfg.get("dp", 1) or 1)
        mesh_gs = int(mesh_cfg.get("gs", 1) or 1)
        self.mesh = None
        self.mesh_dp = 1
        if mesh_dp * mesh_gs > 1:
            ndev = len(jax.devices())
            if ndev < mesh_dp * mesh_gs:
                raise ValueError(
                    f"tpu.mesh requests dp={mesh_dp} x gs={mesh_gs} devices,"
                    f" only {ndev} available")
            if self.camera.height % mesh_gs:
                raise ValueError(
                    f"image height {self.camera.height} must split into "
                    f"gs={mesh_gs} strips (use dataset.downscale or gs that"
                    " divides it)")
            assert capacity % mesh_gs == 0  # capacity is 256-aligned
            from ..dist.shard import make_mesh
            from ..dist.train_sharded import make_sharded_train_step

            self.mesh = make_mesh(mesh_dp * mesh_gs, dp=mesh_dp)
            self.mesh_dp = mesh_dp
            strip_bounds, strip_h_max = None, None
            if mesh_cfg.get("balance_strips") and mesh_gs > 1:
                # pair-balanced boundaries from the (static) training
                # masks' row histogram — the person's row density is
                # the pair-density proxy (docs/SCALING.md mitigation 2)
                from ..dist.shard import balanced_strip_bounds
                row_w = np.asarray(self.masks.sum(axis=(0, 2)))
                strip_bounds, strip_h_max = balanced_strip_bounds(
                    row_w, mesh_gs, tile=self.raster_kw.get("tile", 16))
                print(f"[mesh] balanced strips: bounds="
                      f"{strip_bounds.tolist()} h_max={strip_h_max}")
            self.train_step_sharded = make_sharded_train_step(
                self.mesh, self.avatar_cfg, step_cfg, self.template,
                self.camera, self.tx,
                self.lpips_params if loss_cfg.lpips_w > 0 else None,
                self.raster_kw, strip_bounds=strip_bounds,
                strip_h_max=strip_h_max)
            # dp frame-batching replaces single-chip dispatch fusion
            self.inner_steps = 1
            print(f"[mesh] training on a (dp={mesh_dp}, gs={mesh_gs}) "
                  "device mesh")

        # region laplacians
        self.lap_pos_w = jnp.asarray(parse_region_weights(
            loss_cfg.laplacian.position_regions_w,
            DEFAULT_POSITION_REGIONS_W))
        self.lap_color_w = jnp.asarray(parse_region_weights(
            loss_cfg.laplacian.color_regions_w, DEFAULT_COLOR_REGIONS_W))
        self._lap_pad = None
        self._lap_rows_pad = None
        self._rebuild_laplacians()

        self.density_cfg = dict(dc)
        # pre-load any existing results json so a post-hoc validate()
        # (scripts/eval_refined.py) merges its row instead of
        # overwriting the run's recorded metric history
        self.eval_metrics = {}
        _run_mode = "eval" if cfg.get("eval") else "train"
        _res_path = os.path.join(self.logdir, f"results_{_run_mode}.json")
        if os.path.exists(_res_path):
            try:
                with open(_res_path) as fh:
                    self.eval_metrics = json.load(fh)
            except Exception as e:
                print(f"[init] could not reload {_res_path}: {e}",
                      flush=True)

        # auto-resume (graceful on shape mismatch, like the reference's
        # load_state_dict fallback, sings_hybrid.py:201-237)
        ckpt = hcfg.ckpt or latest_checkpoint(self.logdir_ckpt)
        loaded = False
        if ckpt and os.path.exists(str(ckpt)):
            loaded = self.load_ckpt(str(ckpt))
            if not loaded and (mode != "train" or cfg.eval):
                raise RuntimeError(
                    f"checkpoint {ckpt} is incompatible with the current "
                    "config and this is an eval/animate run")
        if not loaded and mode == "train" and not cfg.eval:
            self._init_attrs()

    # ------------------------------------------------------------------
    def _fit_synthetic_body(self, hcfg):
        """Geometrically calibrate the synthetic template (see __init__).

        Two stages, mirroring the reference refiner's signals
        (ooptimize_smplh.py:263-404): (A) keypoint-only skeleton fit —
        shared bone proportions + per-frame pose/transl against the
        kit's sapiens coco-133 keypoints; (B) silhouette+keypoint
        refinement of all betas (thickness) and poses against the SAM2
        masks. Result is cached in the logdir (the anim/eval contract).
        """
        nb = self.tpl.num_betas
        cache_path = os.path.join(self.logdir, "synthetic_fit.npz")
        if os.path.exists(cache_path):
            data = dict(np.load(cache_path))
            if data["betas"].shape[-1] == nb:
                self.kit = self.kit._replace(smpl={
                    k: data[k] for k in ("betas", "global_orient",
                                         "body_pose", "transl")})
                print("[fit_synthetic] loaded cached calibration",
                      flush=True)
                return
            print("[fit_synthetic] cached calibration has stale betas "
                  f"({data['betas'].shape[-1]} != {nb}); refitting",
                  flush=True)
        if self.cfg.eval:
            # eval without a calibration cache: keep the kit poses and
            # the zeroed betas (already sized to the template)
            print("[fit_synthetic] eval mode, no cache: zeroed betas",
                  flush=True)
            return
        from ..kinematics.template import DeviceTemplate as _DT
        from ..preprocess.refine import (RefineConfig, SkeletonFitConfig,
                                         coco133_body_targets,
                                         face_anchor_targets,
                                         fit_skeleton, refine_smpl)

        d = max(1, min(self.camera.height, self.camera.width) // 128)
        init = {
            "betas": np.zeros(nb, np.float32),
            "global_orient": self.kit.smpl["global_orient"],
            "body_pose": self.kit.smpl["body_pose"],
            "transl": self.kit.smpl["transl"],
        }
        K = np.array(
            [[self.camera.width / (2 * self.camera.tan_fovx), 0,
              self.camera.width / 2],
             [0, self.camera.height / (2 * self.camera.tan_fovy),
              self.camera.height / 2],
             [0, 0, 1]], np.float32)
        dt = _DT.from_host(self.tpl)

        kp_t = kp_w = face_t = face_w = face_o = None
        if self.kit.keypoints is not None:
            kp_t, kp_w = coco133_body_targets(self.kit.keypoints,
                                              self.kit.keypoint_scores)
            face_t, face_w = face_anchor_targets(self.kit.keypoints,
                                                 self.kit.keypoint_scores)
            beta_mask = np.zeros(nb, np.float32)
            beta_mask[0] = 1.0
            if self.tpl.n_bone_betas:
                beta_mask[-self.tpl.n_bone_betas:] = 1.0
            res_a = fit_skeleton(
                dt, K, init, kp_t, kp_w,
                SkeletonFitConfig(steps=int(self.cfg.tpu.get(
                    "skeleton_fit_steps", 500))),
                beta_mask=beta_mask,
                face_targets=face_t, face_weights=face_w)
            print(f"[fit_synthetic] keypoint px err "
                  f"{res_a['px_err'][0]:.2f} -> {res_a['px_err'][-1]:.2f}",
                  flush=True)
            init = {k: res_a[k] for k in init}
            face_o = res_a.get("face_offsets")
        else:
            print("[fit_synthetic] no keypoints_coco133 in kit; "
                  "silhouette-only fit", flush=True)

        cfg = RefineConfig(
            steps=int(self.cfg.tpu.get("synthetic_fit_steps", 300)),
            lr=0.01, render_downscale=d,
            w_keypoints=0.5 if kp_t is not None else 0.0,
            w_face=0.5 if face_o is not None else 0.0,
            w_prior=0.05, optimize_betas=True)
        res = refine_smpl(
            dt, self.camera, K, init, self.kit.masks,
            keypoints2d=kp_t, keypoint_valid=kp_w,
            cfg=cfg, raster_kw=self.raster_kw
            if hasattr(self, "raster_kw") else None,
            face_targets=face_t, face_weights=face_w, face_offsets=face_o)
        print(f"[fit_synthetic] silhouette loss "
              f"{res['losses'][0]:.4f} -> {res['losses'][-1]:.4f}",
              flush=True)
        smpl = {k: res[k] for k in ("betas", "global_orient", "body_pose",
                                    "transl")}
        self.kit = self.kit._replace(smpl=smpl)
        np.savez(cache_path, **smpl)

    def _init_attrs(self):
        targets = initial_attr_targets(self.avatar_cfg, self.tpl, self.cache)
        self.params, losses = fit_initial_attrs(
            self.params, self.buffers, self.avatar_cfg, targets,
            steps=self.cfg.train.init_steps)
        print(f"[init_attrs] loss {float(losses[0]):.5f} -> "
              f"{float(losses[-1]):.5f}")
        self.opt_state = self.tx.init(self.params)

    def _rebuild_laplacians(self):
        b = self.buffers
        edges = np.asarray(b.edges)[np.asarray(b.edge_valid) > 0.5]
        # dead slots keep their last label in the buffer; exclude them so
        # pruned vertices don't enter the laplacian as isolated rows
        labels = np.where(np.asarray(b.alive) > 0.5,
                          np.asarray(b.vertex_label), -1)
        lap_type = str(self.cfg.human.loss.laplacian.type)
        if lap_type == "cotangent":
            # weights depend on current canonical anchor positions and
            # are frozen between rebuilds, like the reference's
            # torch.no_grad() build (loss_items.py:165-167)
            faces = np.asarray(b.faces)[np.asarray(b.face_valid) > 0.5]
            verts = np.asarray(self.params.xyz)
            self.region_lap = build_cot_region_laplacian(
                verts, faces, labels, np.asarray(self.lap_pos_w),
                num_regions=15,
                pad_rows_to=self._lap_rows_pad,
                pad_width_to=self._lap_pad or 8)
            self._lap_rows_pad = max(self._lap_rows_pad or 0,
                                     self.region_lap.neighbors.shape[0])
        elif lap_type == "standard":
            backend = str(self.cfg.tpu.get("laplacian_backend", "auto"))
            if backend == "auto":
                # banded (RCM + blocked MXU matmul) wins when the
                # gather row count is large; the mesh path keeps the
                # gather tables (its row-split sharding relies on them)
                backend = ("banded" if self.mesh is None
                           and self.buffers.alive.shape[0] >= 32768
                           else "gather")
            if backend == "banded":
                from ..losses.regularizers import (
                    build_region_laplacian_banded,
                )

                # Grow-only, 64-BUCKETED half-width from the RAW RCM
                # bandwidth. Deriving the headroom from the padded width
                # compounded 12% per rebuild (r4 run: 463->519->582->652)
                # and recompiled the whole train step at EVERY densify
                # (~5 min each on the remote backend). Bucketing the raw
                # half-width keeps the compiled shape stable across
                # densifies unless the mesh genuinely outgrows a bucket.
                # width_fn sizes the band in ONE build (the tables are
                # the expensive part; a build-measure-rebuild ran the
                # host-side construction twice per densify).
                def _bucketed(raw_w: int) -> int:
                    bw_raw = (raw_w - 1) // 2
                    bw_pad = -(-max(int(bw_raw * 1.12), 1) // 64) * 64
                    return 2 * bw_pad + 1

                self.region_lap = build_region_laplacian_banded(
                    edges, labels, np.asarray(self.lap_pos_w),
                    num_regions=15, width_fn=_bucketed,
                    pad_width=getattr(self, "_lap_band_pad", 0) or None)
                self._lap_band_pad = self.region_lap.band.shape[1]
                print(f"[laplacian] banded backend, band width "
                      f"{self.region_lap.band.shape[1]}", flush=True)
            else:
                # grow-only neighbor-table width so the padded shapes
                # (and the compiled step) stay stable across topology
                # changes
                self.region_lap = build_region_laplacian(
                    edges, labels, np.asarray(self.lap_pos_w),
                    num_regions=15, pad_to=self._lap_pad or 8)
        else:
            # 'norm' raises in the reference too (loss_items.py:111-113)
            raise NotImplementedError(
                f"laplacian.type={lap_type!r} (reference supports "
                "'standard'; 'cotangent'; 'norm' is NotImplementedError "
                "there as well)")
        if hasattr(self.region_lap, "neighbors"):
            self._lap_pad = max(self._lap_pad or 8,
                                self.region_lap.neighbors.shape[1])
        if self.mesh is not None:
            if lap_type != "standard":
                raise NotImplementedError(
                    "tpu.mesh gs-sharding supports laplacian.type="
                    "'standard' only")
            self.region_lap_mesh = shard_region_laplacian(
                self.region_lap, int(self.mesh.shape["gs"]))

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        num_steps = cfg.train.num_steps
        order = list(range(len(self.kit.train_split)))
        random.shuffle(order)
        cursor = 0
        t0 = time.time()
        log_every = 50

        steps_since_log = 0
        last_terms = {}
        while self.step < num_steps:
            t_iter = self.step

            # how many consecutive steps can run inside one dispatch
            k = 1
            if self.inner_steps > 1 and not self._is_event(t_iter):
                while (k < self.inner_steps and t_iter + k < num_steps
                       and not self._is_event(t_iter + k)):
                    k += 1

            frames = []
            for _ in range(k if self.mesh is None else self.mesh_dp):
                if cursor >= len(order):
                    random.shuffle(order)
                    cursor = 0
                frames.append(self.kit.train_split[order[cursor]])
                cursor += 1

            key, self.rng = jax.random.split(self.rng)
            if self.mesh is not None:
                # one optimizer update, gradients averaged over the dp
                # frames and each frame's work split over the gs strips
                from ..dist.shard import shard_batch

                idxs = jnp.asarray(frames)
                batch = {
                    "rgb": self.images[idxs],
                    "mask": self.masks[idxs],
                    "idx": idxs,
                    "smpl_scale": jnp.ones((len(frames), 1)),
                }
                (self.params, self.buffers, self.opt_state,
                 metrics) = self.train_step_sharded(
                    self.params, self.buffers, self.opt_state, self.cache,
                    shard_batch(batch, self.mesh), key, jnp.asarray(t_iter),
                    jnp.asarray(self.active_sh_degree),
                    self.region_lap_mesh, self.region_lap_mesh,
                    self.lap_pos_w, self.lap_color_w,
                )
                last_loss = metrics["loss"]
                last_terms = {k: float(v) for k, v in metrics.items()
                              if k not in ("loss", "skipped")
                              and getattr(v, "ndim", 1) == 0}
                if float(metrics["skipped"]) > 0:
                    print(f"[{t_iter}] WARNING: non-finite gradients, "
                          "update skipped")
                render = None
            elif k == 1:
                frame = frames[0]
                batch = {
                    "rgb": self.images[frame],
                    "mask": self.masks[frame],
                    "idx": jnp.asarray(frame),
                    "smpl_scale": jnp.ones(1),
                }
                (self.params, self.buffers, self.opt_state, metrics,
                 render) = self.train_step(
                    self.params, self.buffers, self.opt_state, self.cache,
                    batch, key, jnp.asarray(t_iter),
                    jnp.asarray(self.active_sh_degree),
                    self.region_lap, self.region_lap,
                    self.lap_pos_w, self.lap_color_w,
                )
                last_loss = metrics["loss"]
                last_terms = {k: float(v) for k, v in metrics.items()
                              if k not in ("loss", "skipped")
                              and getattr(v, "ndim", 1) == 0}
                if float(metrics["skipped"]) > 0:
                    print(f"[{t_iter}] WARNING: non-finite gradients, "
                          "update skipped")
            else:
                idxs = jnp.asarray(frames)
                batches = {
                    "rgb": self.images[idxs],
                    "mask": self.masks[idxs],
                    "idx": idxs,
                    "smpl_scale": jnp.ones((k, 1)),
                }
                rngs = jax.random.split(key, k)
                (self.params, self.buffers, self.opt_state,
                 losses, skipped, term_metrics) = self.train_scan(
                    self.params, self.buffers, self.opt_state, self.cache,
                    batches, rngs, jnp.asarray(t_iter),
                    jnp.asarray(self.active_sh_degree),
                    self.region_lap, self.region_lap,
                    self.lap_pos_w, self.lap_color_w,
                )
                last_loss = losses[-1]
                last_terms = {k: float(v[-1]) for k, v in
                              term_metrics.items()
                              if k not in ("loss", "skipped")}
                n_skip = float(jnp.sum(skipped))
                if n_skip > 0:
                    print(f"[{t_iter}] WARNING: {int(n_skip)}/{k} steps had "
                          "non-finite gradients, updates skipped")
                render = None

            steps_since_log += k
            if steps_since_log >= log_every:
                n_alive = int(np.asarray(self.buffers.alive).sum())
                dt = time.time() - t0
                terms = "".join(
                    f" {k.replace('photo_', '')}={v:.3f}"
                    for k, v in sorted(last_terms.items())) \
                    if last_terms else ""
                print(f"[{t_iter:6d}] loss={float(last_loss):.4f} "
                      f"n_gs={n_alive/1000:.1f}K "
                      f"({steps_since_log/max(dt,1e-9):.2f} it/s)"
                      f"{terms}",
                      flush=True)
                t0 = time.time()
                steps_since_log = 0

            last_t = t_iter + k - 1
            self._periodic_check(last_t, render)
            self._adjust_density(last_t)
            self.step += k

        self.save_ckpt("final")
        return self.validate("final")

    # ------------------------------------------------------------------
    def _is_event(self, t):
        """True when step t triggers host-side work after it runs
        (periodic checks, SH bump, density control) — scan chunks must
        break at these boundaries."""
        cfg = self.cfg
        if t > 0 and (
            t % cfg.train.save_ckpt_interval == 0
            or t % cfg.train.val_interval == 0
            or (self.anim_dataset is not None
                and t % cfg.train.anim_interval == 0)
            or t % cfg.train.viz_interval == 0
            or t % 1000 == 0
        ):
            return True
        dc = self.density_cfg
        if (dc["prune_from_iter"] <= t < dc["prune_until_iter"]
                and (t - dc["prune_from_iter"]) % dc["prune_interval"] == 0):
            return True
        if (dc["densify_from_iter"] <= t < dc["densify_until_iter"]
                and (t - dc["densify_from_iter"] - dc["densify_interval"])
                % dc["densify_interval"] == 0):
            return True
        return False

    def _periodic_check(self, t_iter, render):
        cfg = self.cfg
        if t_iter > 0 and t_iter % cfg.train.save_ckpt_interval == 0:
            self.save_ckpt(f"{t_iter:06d}")
        if t_iter > 0 and t_iter % cfg.train.val_interval == 0:
            self.validate(f"{t_iter:06d}")
        if (self.anim_dataset is not None and t_iter > 0
                and t_iter % cfg.train.anim_interval == 0):
            self.animate_chunk(iter_s=f"{t_iter:06d}", max_frames=32,
                               save_video=False)
        if t_iter > 0 and t_iter % cfg.train.viz_interval == 0:
            self.visualize(f"{t_iter:06d}")
        if t_iter % 1000 == 0 and t_iter > 0:
            if self.active_sh_degree < self.cfg.human.sh_degree:
                self.active_sh_degree += 1

    # ------------------------------------------------------------------
    def _fwd_numpy(self):
        """Fresh forward for density decisions, pulled to host."""
        out = avatar_forward(
            self.params, self.buffers, self.avatar_cfg, self.template,
            self.cache, dataset_idx=0, smpl_scale=jnp.ones(1),
        )
        return {k: np.asarray(v) for k, v in out.items()
                if k in ("xyz_canon", "scales_canon", "scales", "shs",
                         "opacity")}

    def _buffers_numpy(self):
        return {f: np.asarray(getattr(self.buffers, f))
                for f in self.buffers._fields}

    def _apply_density_result(self, res):
        if not res.changed:
            return
        b = self.buffers
        self.buffers = b._replace(
            alive=jnp.asarray(res.alive),
            scaling_multiplier=jnp.asarray(res.scaling_multiplier),
            lbs_weights=jnp.asarray(res.lbs_weights),
            vertex_label=jnp.asarray(res.vertex_label),
            anchor_normals=jnp.asarray(res.anchor_normals),
            faces=jnp.asarray(res.faces),
            face_valid=jnp.asarray(res.face_valid),
            edges=jnp.asarray(res.edges),
            edge_valid=jnp.asarray(res.edge_valid),
            num_level0=jnp.asarray(res.num_alive, jnp.int32),
            max_radii2d=jnp.zeros_like(b.max_radii2d),
            xyz_grad_accum=jnp.zeros_like(b.xyz_grad_accum),
            grad_denom=jnp.zeros_like(b.grad_denom),
        )
        if res.new_xyz is not None:
            self.params = self.params._replace(xyz=jnp.asarray(res.new_xyz))
        self.opt_state = zero_moments_for_slots(
            self.opt_state, jnp.asarray(res.changed_slots))
        self._reset_opacity()
        self._rebuild_laplacians()

    def _reset_opacity(self):
        """Raise the opacity floor to 0.5 (sings_hybrid.py:1260-1278)."""
        if self.avatar_cfg.fixed_opacity:
            return
        feats = triplane_features(self.params.triplane, self.params.xyz,
                                  self.avatar_cfg.triplane)
        logit = appearance_opacity_logit(self.params.appearance_dec, feats,
                                         self.avatar_cfg.decoder)
        offset = jnp.where(logit > 0, 0.0, -logit)
        self.buffers = self.buffers._replace(opacity_offset=offset)

    def _adjust_density(self, t_iter):
        dc = self.density_cfg
        prune_flag = False
        if (dc["prune_from_iter"] <= t_iter < dc["prune_until_iter"]
                and (t_iter - dc["prune_from_iter"])
                % dc["prune_interval"] == 0):
            fwd = self._fwd_numpy()
            res = prune_and_simplify(
                self._buffers_numpy(), np.asarray(self.params.xyz), fwd,
                opacity_threshold=dc["prune_opacity_threshold"],
                scale_threshold=dc["prune_scale_threshold"],
                prune_max_n_gs_once=dc.get("prune_max_n_gs_once", 5000),
                min_n_gs=int(
                    self.cfg.human.density_control.min_n_gaussians),
                collapse_rate=dc.get("prune_collapse_rate", 0.5),
                face_capacity=self.avatar_cfg.face_capacity,
                edge_capacity=self.avatar_cfg.edge_capacity,
            )
            if res.changed:
                prune_flag = True
                print(f"[density] prune -> {res.num_alive} gaussians")
                self._apply_density_result(res)

        if (dc["densify_from_iter"] <= t_iter < dc["densify_until_iter"]
                and (t_iter - dc["densify_from_iter"]
                     - dc["densify_interval"])
                % dc["densify_interval"] == 0):
            if prune_flag:
                # reference quirk: skip + drift the interval
                # (gs_trainer.py:311-313)
                dc["densify_interval"] += 1
                return
            fwd = self._fwd_numpy()
            res = densify_and_subdivide(
                self._buffers_numpy(), np.asarray(self.params.xyz), fwd,
                grad_threshold=dc["densify_grad_threshold"],
                scale_threshold=dc["densify_scale_threshold"],
                max_screen_size=dc.get("densify_render_size_threshold", 20),
                max_n_gs=int(
                    self.cfg.human.density_control.max_n_gaussians),
                face_capacity=self.avatar_cfg.face_capacity,
                edge_capacity=self.avatar_cfg.edge_capacity,
            )
            if res.changed:
                print(f"[density] densify -> {res.num_alive} gaussians")
                new_mask = res.changed_slots > 0.5
                self._apply_density_result(res)
                self._rescale_new_scales(new_mask, fwd)

    def _rescale_new_scales(self, new_mask: np.ndarray, old_fwd: dict):
        """Match decoded scales of new slots to interpolated targets
        (sings_hybrid.py:1140-1147): target = clipped mean parent scale."""
        fwd = self._fwd_numpy()
        target = np.clip(old_fwd["scales_canon"].mean(-1), None, 0.008)
        fresh = fwd["scales_canon"].mean(-1)
        mult = np.asarray(self.buffers.scaling_multiplier).copy()
        # new slots interpolate targets from their own decoded values
        ratio = np.clip(target.mean() / np.maximum(fresh, 1e-9), 0.05, 20.0)
        mult[new_mask, 0] *= ratio[new_mask]
        self.buffers = self.buffers._replace(
            scaling_multiplier=jnp.asarray(mult))

    # ------------------------------------------------------------------
    def _eval_render_fn(self, camera):
        """Jitted eval renderer, cached per camera geometry (unjitted
        execution pays one dispatch roundtrip PER OP on tunneled
        backends). Camera matrices are passed as arrays so all cameras
        of one geometry share the compiled program."""
        key = (camera.height, camera.width, round(camera.tan_fovx, 8),
               round(camera.tan_fovy, 8))
        if not hasattr(self, "_eval_render_cache"):
            self._eval_render_cache = {}
        if key not in self._eval_render_cache:
            from ..ops.graphics import Camera
            from .step import sh_degree_mask

            geom = camera

            @jax.jit
            def render(params, buffers, cache, cam_arrays, data, bg, deg):
                cam = Camera(
                    view=cam_arrays[0], proj=cam_arrays[1],
                    cam_center=cam_arrays[2], height=geom.height,
                    width=geom.width, tan_fovx=geom.tan_fovx,
                    tan_fovy=geom.tan_fovy,
                    clamp_tan_fovx=geom.clamp_tan_fovx,
                    clamp_tan_fovy=geom.clamp_tan_fovy)
                out = avatar_forward(
                    params, buffers, self.avatar_cfg, self.template, cache,
                    global_orient=data["global_orient"],
                    body_pose=data["body_pose"],
                    betas=data["betas"],
                    transl=data["transl"],
                    smpl_scale=data["smpl_scale"],
                    ext_tfs=data.get("ext_tfs"),
                    eval_mode=True,
                )
                shs = out["shs"] * sh_degree_mask(deg)[None, :, None]
                pkg = rasterize(
                    out["xyz"], out["scales"], out["rotq"],
                    out["opacity"][:, 0], shs, cam, sh_degree=3, bg=bg,
                    alive=buffers.alive > 0.5, backend="pallas",
                    **self.raster_kw)
                # raw render: the reference's val psnr/ssim use the
                # unclamped image (gs_trainer.py:584-585); lpips clips
                # max=1 at its call site, saving clamps for PNG
                return pkg["render"], out

            self._eval_render_cache[key] = render
        return self._eval_render_cache[key]

    def _render_eval(self, data: dict, camera=None, bg=None):
        camera = camera or self.camera
        bg = self.bg_color * 0 if bg is None else bg
        fn = self._eval_render_fn(camera)
        if data.get("global_orient") is None and "dataset_idx" in data:
            # learned per-frame poses (6D param -> axis-angle), same
            # compiled program as the explicit-args path
            from ..ops.rotations import rotation_6d_to_axis_angle

            i = int(data["dataset_idx"])
            data = dict(
                data,
                global_orient=rotation_6d_to_axis_angle(
                    self.params.global_orient[i].reshape(1, 6)).reshape(3),
                body_pose=rotation_6d_to_axis_angle(
                    self.params.body_pose[i].reshape(-1, 6)).reshape(-1),
                betas=self.params.betas,
                transl=self.params.transl[i],
            )
        data_j = {
            "global_orient": jnp.asarray(data["global_orient"]),
            "body_pose": jnp.asarray(data["body_pose"]),
            "betas": jnp.asarray(data.get("betas", self.params.betas)),
            "transl": jnp.asarray(data["transl"]),
            "smpl_scale": jnp.asarray(data.get("smpl_scale", np.ones(1))),
        }
        if data.get("ext_tfs") is not None:
            data_j["ext_tfs"] = tuple(
                jnp.asarray(x) for x in data["ext_tfs"])
        return fn(self.params, self.buffers, self.cache,
                  (camera.view, camera.proj, camera.cam_center), data_j,
                  jnp.asarray(bg), jnp.asarray(self.active_sh_degree))

    def _val_pose_refine(self, data, frame, steps, chunk=16):
        """Test-time pose refinement for a val frame: optimize
        (global_orient, body_pose, transl) of the FROZEN avatar against
        the masked MSE. NOT part of the reference protocol (its
        validate renders the raw preprocess-fit poses,
        gs_trainer.py:560-568 dataset_idx=-1) — reported separately as
        psnr_masked_refined; see PARITY.md. Dispatched in short chunks
        (long single programs fault the tunneled worker)."""
        import optax

        from ..ops.graphics import Camera
        from .step import sh_degree_mask

        geom = self.camera
        gt = self.images[frame]
        mask = self.masks[frame]
        if not hasattr(self, "_val_refine_fn"):
            tx = optax.adam(2e-3)

            @functools.partial(jax.jit, static_argnames=("length",))
            def run(params, buffers, cache, cam_arrays, pose, opt_state,
                    fixed, gt, mask, deg, length):
                cam = Camera(
                    view=cam_arrays[0], proj=cam_arrays[1],
                    cam_center=cam_arrays[2], height=geom.height,
                    width=geom.width, tan_fovx=geom.tan_fovx,
                    tan_fovy=geom.tan_fovy,
                    clamp_tan_fovx=geom.clamp_tan_fovx,
                    clamp_tan_fovy=geom.clamp_tan_fovy)

                def loss_fn(pose):
                    out = avatar_forward(
                        params, buffers, self.avatar_cfg, self.template,
                        cache, global_orient=pose["global_orient"],
                        body_pose=pose["body_pose"], betas=fixed["betas"],
                        transl=pose["transl"],
                        smpl_scale=fixed["smpl_scale"], eval_mode=True)
                    shs = out["shs"] * sh_degree_mask(deg)[None, :, None]
                    pkg = rasterize(
                        out["xyz"], out["scales"], out["rotq"],
                        out["opacity"][:, 0], shs, cam, sh_degree=3,
                        bg=jnp.zeros(3), alive=buffers.alive > 0.5,
                        backend="pallas", **self.raster_kw)
                    m = mask[None]
                    return ((pkg["render"] - gt) * m).__pow__(2).sum() \
                        / jnp.maximum(m.sum() * 3, 1.0)

                def body(carry, _):
                    pose, opt_state = carry
                    loss, grads = jax.value_and_grad(loss_fn)(pose)
                    finite = jnp.all(jnp.asarray([
                        jnp.all(jnp.isfinite(g))
                        for g in jax.tree.leaves(grads)]))
                    grads = jax.tree.map(
                        lambda g: jnp.where(finite, g, 0.0), grads)
                    updates, opt_state = tx.update(grads, opt_state, pose)
                    return (optax.apply_updates(pose, updates),
                            opt_state), loss

                (pose, opt_state), losses = jax.lax.scan(
                    body, (pose, opt_state), None, length=length)
                return pose, opt_state, losses

            self._val_refine_fn = (run, tx)
        run, tx = self._val_refine_fn
        pose = {
            "global_orient": jnp.asarray(data["global_orient"]),
            "body_pose": jnp.asarray(data["body_pose"]),
            "transl": jnp.asarray(data["transl"]),
        }
        fixed = {
            "betas": jnp.asarray(data["betas"]),
            "smpl_scale": jnp.ones(1),
        }
        opt_state = tx.init(pose)
        cam_arrays = (geom.view, geom.proj, geom.cam_center)
        done = 0
        while done < steps:
            ln = min(chunk, steps - done)
            pose, opt_state, _ = run(
                self.params, self.buffers, self.cache, cam_arrays, pose,
                opt_state, fixed, gt, mask,
                jnp.asarray(self.active_sh_degree), ln)
            done += ln
        return {k: np.asarray(v) for k, v in pose.items()}

    def _val_gauge_alignment(self):
        """Global canonical-frame drift, estimated from TRAIN frames
        only (no val data): training's learned per-frame poses drift
        the avatar's canonical frame relative to the preprocess fit's
        frame, and val frames render RAW fit poses (reference protocol,
        gs_trainer.py:560-568) — so the whole sequence-level drift
        shows up as val error. The drift is a gauge freedom (one rigid
        transform shared by every frame), recoverable as the average
        learned-vs-fit offset:

            dR = polar(sum_i R_learned_i @ R_fit_i^T),
            dt = mean_i(t_learned_i - dR @ t_fit_i)

        Applying (dR, dt) + the learned shared betas to val fit poses
        is protocol-legal (uses zero val-frame information). Returns
        (dR (3,3), dt (3,)) numpy or None when poses aren't learned.
        """
        if self.params.global_orient is None:
            return None
        from ..ops.rotations import (axis_angle_to_matrix,
                                     rotation_6d_to_matrix)

        tr = np.asarray(self.kit.train_split)
        r_l = np.asarray(rotation_6d_to_matrix(
            self.params.global_orient[tr].reshape(-1, 6)))
        r_f = np.asarray(axis_angle_to_matrix(jnp.asarray(
            self.kit.smpl["global_orient"][tr].reshape(-1, 3))))
        m = np.einsum("fij,fkj->ik", r_l, r_f)  # sum R_l R_f^T
        u, _s, vt = np.linalg.svd(m)
        d = np.sign(np.linalg.det(u @ vt))
        dr = u @ np.diag([1.0, 1.0, d]) @ vt
        t_l = np.asarray(self.params.transl[tr])
        t_f = self.kit.smpl["transl"][tr]
        dt = (t_l - t_f @ dr.T).mean(axis=0)
        return dr.astype(np.float32), dt.astype(np.float32)

    def validate(self, iter_s="final"):
        # psnr/ssim/lpips follow the reference protocol exactly (black-bg
        # render vs raw GT, gs_trainer.py:549,584-586). On kits with a
        # light background this makes raw full-frame PSNR background-
        # dominated and ~constant over training (~1.4 dB here): the GT
        # keeps its background (Customdataset.py:233-244 does not mask;
        # the reference masks only for name=='zju', gs_trainer.py:580-583)
        # while the render is on black. psnr_composite is the
        # like-for-like full-frame row (GT*mask vs render, both on
        # black); psnr_masked restricts to the person mask.
        metrics = {"psnr": [], "ssim": [], "lpips": [], "psnr_masked": [],
                   "psnr_composite": []}
        refine_steps = int(self.cfg.tpu.get("val_pose_refine_steps", 0))
        if refine_steps > 0:
            metrics["psnr_masked_refined"] = []
        gauge = None
        if bool(self.cfg.tpu.get("val_gauge_align", True)):
            try:
                gauge = self._val_gauge_alignment()
            except Exception as e:  # diagnostics must never kill a run
                print(f"[val] gauge alignment failed: {e}", flush=True)
        if gauge is not None:
            metrics["psnr_masked_aligned"] = []
        for i, frame in enumerate(self.kit.val_split):
            data = {
                "global_orient": self.kit.smpl["global_orient"][frame],
                "body_pose": self.kit.smpl["body_pose"][frame],
                "betas": self.kit.smpl["betas"],
                "transl": self.kit.smpl["transl"][frame],
            }
            img, _ = self._render_eval(data, bg=jnp.zeros(3))
            gt = self.images[frame]
            metrics["psnr"].append(float(psnr(img, gt)))
            metrics["ssim"].append(float(ssim(img, gt)))
            metrics["lpips"].append(float(lpips_distance(
                self.lpips_params, img[None].clip(max=1.0), gt[None])[0]))
            m = self.masks[frame][None]
            mse_m = float((((img - gt) * m) ** 2).sum()
                          / jnp.maximum(m.sum() * 3, 1.0))
            metrics["psnr_masked"].append(
                float(20 * np.log10(1.0 / max(np.sqrt(mse_m), 1e-6))))
            metrics["psnr_composite"].append(float(psnr(img, gt * m)))
            if gauge is not None:
                try:
                    from ..ops.rotations import (axis_angle_to_matrix,
                                                 matrix_to_axis_angle)

                    dr, dt = gauge
                    r_val = axis_angle_to_matrix(
                        jnp.asarray(data["global_orient"]).reshape(1, 3))[0]
                    go_a = np.asarray(matrix_to_axis_angle(
                        (jnp.asarray(dr) @ r_val)[None]))[0]
                    data_a = dict(
                        data, global_orient=go_a,
                        transl=dr @ data["transl"] + dt,
                        betas=np.asarray(self.params.betas)
                        if self.params.betas is not None
                        else data["betas"])
                    img_a, _ = self._render_eval(data_a, bg=jnp.zeros(3))
                    mse_a = float((((img_a - gt) * m) ** 2).sum()
                                  / jnp.maximum(m.sum() * 3, 1.0))
                    metrics["psnr_masked_aligned"].append(
                        float(20 * np.log10(
                            1.0 / max(np.sqrt(mse_a), 1e-6))))
                except Exception as e:
                    print(f"[val] gauge-aligned render failed: {e}",
                          flush=True)
                    gauge = None
                    metrics.pop("psnr_masked_aligned", None)
            if refine_steps > 0:
                try:
                    pose = self._val_pose_refine(data, frame, refine_steps)
                    img_r, _ = self._render_eval(
                        dict(data, **pose), bg=jnp.zeros(3))
                    mse_r = float((((img_r - gt) * m) ** 2).sum()
                                  / jnp.maximum(m.sum() * 3, 1.0))
                    metrics["psnr_masked_refined"].append(
                        float(20 * np.log10(
                            1.0 / max(np.sqrt(mse_r), 1e-6))))
                except Exception as e:
                    print(f"[val] pose refine failed: {e}", flush=True)
                    refine_steps = 0
                    metrics.pop("psnr_masked_refined", None)
            if i < 4:
                self._save_image_pair(
                    gt, img, os.path.join(
                        self.logdir, "val", f"full_{iter_s}_{i:03d}.png"))
        result = {k: float(np.mean(v)) for k, v in metrics.items()}
        # train-frame masked PSNR with the LEARNED per-frame poses —
        # the avatar-quality upper bound. A val/train gap here
        # attributes the val score to val-frame pose misfit (val poses
        # come from the preprocess fit and get no photometric
        # refinement), not to the avatar itself.
        try:
            tr = []
            for frame in self.kit.train_split[:: max(
                    1, len(self.kit.train_split) // 8)][:8]:
                img, _ = self._render_eval(
                    {"global_orient": None, "body_pose": None,
                     "betas": None, "transl": None,
                     "dataset_idx": int(frame)}, bg=jnp.zeros(3))
                gt = self.images[frame]
                m = self.masks[frame][None]
                mse_m = float((((img - gt) * m) ** 2).sum()
                              / jnp.maximum(m.sum() * 3, 1.0))
                tr.append(float(20 * np.log10(
                    1.0 / max(np.sqrt(mse_m), 1e-6))))
            result["psnr_masked_train"] = float(np.mean(tr))
        except Exception as e:  # diagnostics must never kill a run
            print(f"[val] train-frame diagnostics failed: {e}", flush=True)
        # random-feature LPIPS is a usable training signal but NOT
        # comparable to the reference's pretrained-VGG metric — flag it
        result["lpips_pretrained"] = bool(self.lpips_params.pretrained)
        # saturation diagnostics (VERDICT r2 weak #4: scale/opacity
        # rails went unnoticed for a whole round) — alive-only stats
        try:
            from ..model.avatar import get_gs_attrs

            attrs = get_gs_attrs(self.params, self.buffers,
                                 self.avatar_cfg)
            alive = np.asarray(self.buffers.alive) > 0.5
            sc = np.asarray(attrs["scales"])[alive]
            op = np.asarray(attrs["opacity"])[alive].reshape(-1)
            print(f"[val {iter_s}] scales mean/p99/max "
                  f"{sc.mean():.4f}/{np.percentile(sc, 99):.4f}/"
                  f"{sc.max():.4f} opacity mean/p99 {op.mean():.4f}/"
                  f"{np.percentile(op, 99):.4f}", flush=True)
            result["scales_p99"] = float(np.percentile(sc, 99))
            result["opacity_mean"] = float(op.mean())
        except Exception as e:  # diagnostics must never kill a run
            print(f"[val] attr diagnostics failed: {e}", flush=True)
        self.eval_metrics[iter_s] = result
        print(f"[val {iter_s}] " + " ".join(
            f"{k}={v:.4f}" for k, v in result.items()), flush=True)
        # reference naming: results_{train|eval}.json keyed on cfg.eval
        # (train_avatar.py:70-72), NOT cfg.mode (which is the model
        # family, "human")
        run_mode = "eval" if self.cfg.get("eval") else "train"
        with open(os.path.join(self.logdir,
                               f"results_{run_mode}.json"), "w") as fh:
            json.dump(self.eval_metrics, fh, indent=2)
        return result

    @staticmethod
    def _save_image_pair(gt, pred, path):
        from PIL import Image

        a = (np.asarray(gt).transpose(1, 2, 0) * 255).astype(np.uint8)
        b = (np.asarray(pred).transpose(1, 2, 0).clip(0, 1) * 255).astype(
            np.uint8)
        Image.fromarray(np.concatenate([a, b], axis=1)).save(path)

    # ------------------------------------------------------------------
    def animate_chunk(self, chunk_size=16, iter_s="final", save_video=True,
                      max_frames=None):
        if self.anim_dataset is None:
            print("No animation dataset")
            return 0.0
        ds = self.anim_dataset
        num_frames = ds.num_frames if max_frames is None else min(
            ds.num_frames, max_frames)
        out_dir = os.path.join(self.logdir, "anim")
        os.makedirs(out_dir, exist_ok=True)

        gs_attrs = get_gs_attrs(self.params, self.buffers, self.avatar_cfg)
        from .step import sh_degree_mask

        if not hasattr(self, "_anim_render_j"):
            # one dispatch per chunk: decode-once forward + lax.map over
            # the per-frame rasterization (per-frame dispatch would pay a
            # host roundtrip each)
            def render_chunk(params, buffers, gs_attrs, chunk, deg):
                out = avatar_forward_chunk(
                    params, buffers, self.avatar_cfg, self.template,
                    self.cache, gs_attrs,
                    global_orient=chunk["global_orient"],
                    body_pose=chunk["body_pose"],
                    betas=params.betas,
                    transl=chunk["transl"],
                    smpl_scale=chunk["smpl_scale"],
                    ext_tfs=chunk["ext_tfs"],
                )
                deg_mask = sh_degree_mask(deg)

                def one(frame):
                    xyz, scales, rotq, opacity, shs = frame
                    pkg = rasterize(
                        xyz, scales, rotq, opacity[:, 0],
                        shs * deg_mask[None, :, None], ds.camera,
                        sh_degree=3, bg=self.bg_color,
                        alive=buffers.alive > 0.5, backend="pallas",
                        **self.raster_kw)
                    # quantize on device: the tunneled readback is
                    # bandwidth-bound, uint8 HWC is 4x less than f32
                    img = jnp.clip(pkg["render"], 0.0, 1.0)
                    return jnp.round(img.transpose(1, 2, 0) * 255.0
                                     ).astype(jnp.uint8)

                return jax.lax.map(
                    one, (out["xyz"], out["scales"], out["rotq"],
                          out["opacity"], out["shs"]))

            self._anim_render_j = jax.jit(render_chunk)

        import concurrent.futures as cf

        def encode(args):
            imgs, start, b = args
            from PIL import Image

            for j in range(b):
                Image.fromarray(imgs[j]).save(
                    os.path.join(out_dir, f"{start + j:05d}.jpg"))
            return b

        t_start = time.time()
        frames_done = 0
        pending: list[tuple] = []  # dispatched, unread chunks
        encodes = []
        with cf.ThreadPoolExecutor(max_workers=4) as pool:
            def drain(limit):
                nonlocal frames_done
                while len(pending) > limit:
                    dev_imgs, s0, b0 = pending.pop(0)
                    encodes.append(pool.submit(
                        encode, (np.asarray(dev_imgs), s0, b0)))
                    frames_done += b0

            for start in range(0, num_frames, chunk_size):
                chunk = ds.get_chunk(start, start + chunk_size)
                # the dataset may hold more frames than requested;
                # clamp so exactly num_frames images are written
                b = min(chunk["body_pose"].shape[0], num_frames - start)
                if b < chunk_size:  # pad to static shape, drop extras below
                    def fit(x):
                        x = x[:b]
                        return np.concatenate(
                            [x, np.repeat(x[-1:], chunk_size - b, 0)])

                    chunk = {
                        k: (tuple(fit(x) for x in v)
                            if isinstance(v, tuple) else fit(v))
                        for k, v in chunk.items()
                    }
                chunk_j = jax.tree.map(jnp.asarray, chunk)
                # dispatch is async: chunk k+1 renders while chunk k is
                # read back over the tunnel and JPEG-encoded
                pending.append((self._anim_render_j(
                    self.params, self.buffers, gs_attrs, chunk_j,
                    jnp.asarray(self.active_sh_degree)), start, b))
                drain(1)
            drain(0)
            for f in encodes:
                f.result()
        dt = time.time() - t_start
        fps = frames_done / max(dt, 1e-9)
        print(f"[anim] {frames_done} frames in {dt:.2f}s ({fps:.2f} fps)",
              flush=True)
        if save_video:
            from ..export.video import create_video

            video = os.path.join(
                self.logdir, f"anim_{ds.motion_name}_{iter_s}.mp4")
            create_video(out_dir, video, fps=20, ext="jpg")
        return fps

    def render_canonical(self, iter_s="final", nframes=10, img_size=256,
                         pose_type=None):
        """Turntable render in a static pose (gs_trainer.py:757-851;
        pose_type defaults to cfg.human.canon_pose_type like :759)."""
        pose_type = pose_type or self.cfg.human.canon_pose_type
        cams = get_rotating_cameras(img_size=img_size, nframes=nframes)
        static = get_smpl_static_params(
            np.asarray(self.params.betas), pose_type=pose_type)
        out_dir = os.path.join(self.logdir, "canon")
        for i, cam in enumerate(cams):
            img, _ = self._render_eval(static, camera=cam, bg=self.bg_color)
            from PIL import Image

            Image.fromarray(
                (np.asarray(img).transpose(1, 2, 0).clip(0, 1) * 255)
                .astype(np.uint8)
            ).save(os.path.join(out_dir, f"{pose_type}_{i:05d}.png"))

    def visualize(self, iter_s):
        out = avatar_forward(
            self.params, self.buffers, self.avatar_cfg, self.template,
            self.cache, dataset_idx=0, smpl_scale=jnp.ones(1),
        )
        save_ply(out, os.path.join(self.logdir, "meshes",
                                   f"human_pcd_{iter_s}_splat.ply"),
                 alive=np.asarray(self.buffers.alive))
        from ..export.ply import save_ellipsoid_mesh

        save_ellipsoid_mesh(
            out, os.path.join(self.logdir, "meshes",
                              f"human_voxel_{iter_s}_deformed_rgb.ply"),
            alive=np.asarray(self.buffers.alive))

    def save_splat_file(self, pose_type="little_a_pose"):
        data = get_smpl_static_params(np.asarray(self.params.betas),
                                      pose_type=pose_type)
        _, out = self._render_eval(data, bg=self.bg_color)
        save_splat(out, os.path.join(self.logdir, "showcase.splat"),
                   alive=np.asarray(self.buffers.alive))

    # ------------------------------------------------------------------
    def save_ckpt(self, iter_s="final"):
        path = os.path.join(self.logdir_ckpt, f"human_{iter_s}.npz")
        save_checkpoint(
            path, params=self.params, buffers=self.buffers,
            opt_state=self.opt_state, step=self.step,
            active_sh_degree=self.active_sh_degree)
        print(f"[ckpt] saved {path}", flush=True)

    def load_ckpt(self, path: str) -> bool:
        from .checkpoint import CheckpointShapeMismatch

        try:
            res = load_checkpoint(
                path, params_template=self.params,
                buffers_template=self.buffers, opt_template=self.opt_state)
        except CheckpointShapeMismatch as e:
            print(f"[ckpt] IGNORING {path}: {e} (likely written with a "
                  "different capacity/config) — training from scratch",
                  flush=True)
            return False
        self.params = res["params"]
        self.buffers = res["buffers"]
        self.opt_state = res["opt_state"]
        self.step = res["step"]
        self.active_sh_degree = res["active_sh_degree"]
        self._rebuild_laplacians()
        print(f"[ckpt] loaded {path} (step {self.step})", flush=True)
        return True
