"""Simultaneous multi-case training pool.

The reference's "batch training" is a sequential shell loop of
single-case trainings (scripts/run_batch/train_batch.sh:33-38). This
pool is the TPU-native redesign: C independent avatar cases train in
LOCKSTEP over a (case, gs) device mesh — one jitted dispatch per
iteration updates every case at once (dist/train_cases.py), while all
host-side orchestration (frame sampling, periodic checkpoint/val/viz,
density control, laplacian rebuilds) runs per case between dispatches
with the exact single-case Trainer semantics: the pool owns one Trainer
per case and unstacks device state into them only at event steps.

Requirements across cases (asserted): same recipe (schedules, loss
weights), same image resolution, same body template / capacity. Frame
counts may differ — per-frame pose parameters are padded to the longest
case (dataset.pad_frames_to, injected here before Trainer construction
so checkpoints round-trip with stable shapes).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..dist.train_cases import (
    camera_arrays, make_case_mesh, make_case_train_step, shard_cases,
    stack_cases,
)


class CasePool:
    def __init__(self, cfgs: list, gs: int = 1):
        from ..data.kit import scan_kit_frames
        from .trainer import Trainer
        import os

        assert cfgs, "need at least one case config"
        # size the shared per-frame parameter axis before building any
        # Trainer, so checkpoint shapes are stable across runs
        f_max = 0
        for cfg in cfgs:
            kit_dir = os.path.normpath(os.path.join(
                cfg.dataset.root_dir, cfg.dataset.batch or "",
                cfg.dataset.name, cfg.dataset.seq or ""))
            f_max = max(f_max, scan_kit_frames(
                kit_dir, max_frames=cfg.dataset.get("max_frames")))
        for cfg in cfgs:
            cfg.dataset.pad_frames_to = int(f_max)

        self.trainers = [Trainer(cfg, mode="train") for cfg in cfgs]
        t0 = self.trainers[0]
        for t in self.trainers[1:]:
            assert t.mesh is None, (
                "tpu.mesh and simultaneous cases are exclusive — the "
                "pool builds its own (case, gs) mesh")
            assert (t.camera.height, t.camera.width) == (
                t0.camera.height, t0.camera.width), (
                "all cases must share one image resolution "
                "(use dataset.downscale)")
            assert t.avatar_cfg == t0.avatar_cfg, (
                "cases disagree on AvatarConfig (body template / "
                "capacity / recipe must match)")
            assert t.step_cfg == t0.step_cfg, "cases disagree on recipe"
            assert t.cfg.train.num_steps == t0.cfg.train.num_steps
            np.testing.assert_allclose(np.asarray(t.lap_pos_w),
                                       np.asarray(t0.lap_pos_w))
            np.testing.assert_allclose(np.asarray(t.lap_color_w),
                                       np.asarray(t0.lap_color_w))
        assert t0.mesh is None

        self.mesh = make_case_mesh(len(self.trainers), gs)
        lpips = (t0.lpips_params
                 if float(t0.cfg.human.loss.lpips_w) > 0 else None)
        self.step_fn = make_case_train_step(
            self.mesh, t0.avatar_cfg, t0.step_cfg, t0.template,
            t0.camera.height, t0.camera.width, t0.tx, lpips, t0.raster_kw)

        self.rng = jax.random.PRNGKey(int(t0.cfg.seed))
        self.active_sh_degree = min(
            t.active_sh_degree for t in self.trainers)
        self.step = min(t.step for t in self.trainers)

        # static per-case inputs
        self._cams = shard_cases(stack_cases(
            [camera_arrays(t.camera) for t in self.trainers]), self.mesh)
        self._caches = shard_cases(stack_cases(
            [t.cache for t in self.trainers]), self.mesh)

        self._unify_laps()
        self._stack_state()

        # per-case frame shuffles (single-case Trainer uses the global
        # `random` module; the pool needs independent streams)
        self._frame_rand = [np.random.RandomState(int(t.cfg.seed) + 7919 * c)
                            for c, t in enumerate(self.trainers)]
        self._orders = [list(range(len(t.kit.train_split)))
                        for t in self.trainers]
        for r, o in zip(self._frame_rand, self._orders):
            r.shuffle(o)
        self._cursors = [0] * len(self.trainers)

    # ------------------------------------------------------------------
    def _unify_laps(self):
        """All cases must share one laplacian neighbor-table width (the
        stacked tables are one sharded array)."""
        w = max(t.region_lap.neighbors.shape[1] for t in self.trainers)
        for t in self.trainers:
            if t.region_lap.neighbors.shape[1] != w:
                t._lap_pad = w
                t._rebuild_laplacians()

    def _stack_state(self):
        from ..losses.regularizers import shard_region_laplacian

        ts = self.trainers
        sc = lambda xs: shard_cases(stack_cases(xs), self.mesh)  # noqa: E731
        self._params = sc([t.params for t in ts])
        self._buffers = sc([t.buffers for t in ts])
        self._opt = sc([t.opt_state for t in ts])
        # gs-sharded laplacian row ranges, one transpose width across
        # cases so the stacked (case, gs, ...) tables are one array
        n_gs = int(self.mesh.shape["gs"])
        srls = [shard_region_laplacian(t.region_lap, n_gs) for t in ts]
        dt = max(s.t_neighbors.shape[-1] for s in srls)
        srls = [s if s.t_neighbors.shape[-1] == dt else
                shard_region_laplacian(t.region_lap, n_gs,
                                       pad_t_width_to=dt)
                for s, t in zip(srls, ts)]
        self._rlap = jax.device_put(
            stack_cases(srls),
            jax.NamedSharding(self.mesh, jax.P("case", "gs")))

    def _unstack_state(self, t_iter: int):
        for c, t in enumerate(self.trainers):
            pick = lambda tree: jax.tree.map(lambda x: x[c], tree)  # noqa: E731,B023
            t.params = pick(self._params)
            t.buffers = pick(self._buffers)
            t.opt_state = pick(self._opt)
            t.step = t_iter
            t.active_sh_degree = self.active_sh_degree

    def _next_frame(self, c: int) -> int:
        if self._cursors[c] >= len(self._orders[c]):
            self._frame_rand[c].shuffle(self._orders[c])
            self._cursors[c] = 0
        t = self.trainers[c]
        frame = t.kit.train_split[self._orders[c][self._cursors[c]]]
        self._cursors[c] += 1
        return frame

    # ------------------------------------------------------------------
    def train(self):
        ts = self.trainers
        t0 = ts[0]
        num_steps = int(t0.cfg.train.num_steps)
        names = [t.kit.name for t in ts]
        print(f"[pool] {len(ts)} cases {names} on a (case={len(ts)}, "
              f"gs={self.mesh.shape['gs']}) mesh")
        log_every, steps_since_log, tlog = 50, 0, time.time()

        while self.step < num_steps:
            t_iter = self.step
            frames = [self._next_frame(c) for c in range(len(ts))]
            batch = {
                "rgb": jnp.stack([t.images[f]
                                  for t, f in zip(ts, frames)]),
                "mask": jnp.stack([t.masks[f]
                                   for t, f in zip(ts, frames)]),
                "idx": jnp.asarray(frames),
                "smpl_scale": jnp.ones((len(ts), 1)),
            }
            key, self.rng = jax.random.split(self.rng)
            with self.mesh:
                (self._params, self._buffers, self._opt,
                 metrics) = self.step_fn(
                    self._params, self._buffers, self._opt, self._caches,
                    self._cams, shard_cases(batch, self.mesh), key,
                    jnp.asarray(t_iter), jnp.asarray(self.active_sh_degree),
                    self._rlap, self._rlap, t0.lap_pos_w, t0.lap_color_w)

            skipped = np.asarray(metrics["skipped"])
            if skipped.any():
                bad = [n for n, s in zip(names, skipped) if s > 0]
                print(f"[{t_iter}] WARNING: non-finite gradients, update "
                      f"skipped for {bad}")

            steps_since_log += 1
            if steps_since_log >= log_every:
                losses = np.asarray(metrics["loss"]).round(4).tolist()
                n_gs = np.asarray(
                    self._buffers.alive.sum(axis=1)).astype(int).tolist()
                dt = time.time() - tlog
                print(f"[{t_iter:6d}] losses={losses} n_gs={n_gs} "
                      f"({steps_since_log / max(dt, 1e-9):.2f} it/s)",
                      flush=True)
                tlog, steps_since_log = time.time(), 0

            if any(t._is_event(t_iter) for t in ts):
                self._unstack_state(t_iter)
                for t in ts:
                    t._periodic_check(t_iter, None)
                    t._adjust_density(t_iter)
                # one SH schedule for the pool (same rule as
                # Trainer._periodic_check)
                if (t_iter % 1000 == 0 and t_iter > 0
                        and self.active_sh_degree
                        < t0.cfg.human.sh_degree):
                    self.active_sh_degree += 1
                self._unify_laps()
                self._stack_state()
            self.step += 1

        self._unstack_state(num_steps)
        results = {}
        for c, t in enumerate(ts):
            t.save_ckpt("final")
            key = t.kit.name if t.kit.name not in results else (
                f"{t.kit.name}#{c}")
            results[key] = t.validate("final")
        return results
