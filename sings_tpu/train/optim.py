"""Optimizer: Adam with per-group learning rates and schedules.

Reference semantics (sings_hybrid.py:744-838 + general.py:76-126):
Adam(eps=1e-15) with groups {xyz, v_embed(triplane), geometry_dec,
appearance_dec, global_orient, body_pose, betas, transl}. The
reference's update_learning_rate() early-returns after updating the xyz
group, so only xyz actually follows a schedule (the exponential decay);
all other groups keep their initial LR. We reproduce that behavior and
keep the cosine schedules available but disabled by default
(documented quirk, SURVEY.md section 7).

Implementation: a single optax chain — scale_by_adam then a per-leaf
learning-rate map driven by the AvatarParams field name, entirely
inside jit (no host-side param-group mutation).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..model.avatar import AvatarParams
from ..ops.schedules import constant_lr, expon_lr


class LRConfig(NamedTuple):
    position_init: float = 0.00016
    position_final: float = 1.6e-06
    position_delay_mult: float = 0.01
    position_max_steps: int = 16000
    smpl_spatial: float = 2.0
    vembed: float = 0.0005
    geometry: float = 0.0005
    appearance: float = 0.0005
    smpl_pose: float = 0.0001
    smpl_betas: float = 0.0001
    smpl_trans: float = 0.0001
    mlp_max_steps: int = 16000


class TrainFlags(NamedTuple):
    """Per-group trainability (reference optim_pose/optim_trans/...)."""

    optim_pose: bool = True
    optim_betas: bool = False
    optim_trans: bool = True


def lr_schedules(cfg: LRConfig):
    """Field-name -> schedule(step) map."""
    xyz = expon_lr(
        lr_init=cfg.position_init * cfg.smpl_spatial,
        lr_final=cfg.position_final * cfg.smpl_spatial,
        lr_delay_mult=cfg.position_delay_mult,
        max_steps=cfg.position_max_steps,
    )
    return {
        "xyz": xyz,
        "triplane": constant_lr(cfg.vembed),
        "geometry_dec": constant_lr(cfg.geometry),
        "appearance_dec": constant_lr(cfg.appearance),
        "global_orient": constant_lr(cfg.smpl_pose),
        "body_pose": constant_lr(cfg.smpl_pose),
        "betas": constant_lr(cfg.smpl_betas),
        "transl": constant_lr(cfg.smpl_trans),
    }


def make_optimizer(cfg: LRConfig, flags: TrainFlags,
                   grad_clip_norm: float = 0.0):
    """Adam(eps=1e-15) + per-field scheduled LR + trainability masks.

    grad_clip_norm > 0 prepends global-norm clipping (no reference
    equivalent — the reference trains unclipped; useful against the
    loss spikes at density events when training the synthetic template).
    """
    schedules = lr_schedules(cfg)

    def scale_by_group() -> optax.GradientTransformation:
        def init_fn(params):
            return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

        def update_fn(updates, state, params=None):
            step = state.count
            lr_map = {k: fn(step) for k, fn in schedules.items()}

            def scale(field, u):
                lr = lr_map[field]
                frozen = (
                    (field in ("global_orient", "body_pose")
                     and not flags.optim_pose)
                    or (field == "betas" and not flags.optim_betas)
                    or (field == "transl" and not flags.optim_trans)
                )
                mult = 0.0 if frozen else 1.0
                return jax.tree.map(lambda x: -lr * mult * x, u)

            new_updates = AvatarParams(
                **{f: scale(f, getattr(updates, f))
                   for f in AvatarParams._fields}
            )
            return new_updates, optax.ScaleByScheduleState(count=step + 1)

        return optax.GradientTransformation(init_fn, update_fn)

    parts = []
    if grad_clip_norm and grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    parts += [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15),
        scale_by_group(),
    ]
    return optax.chain(*parts)


def zero_moments_for_slots(opt_state, slot_mask: jax.Array):
    """Zero Adam moments of per-gaussian slots after topology changes.

    slot_mask: (C,) float, 1 where moments must reset (new/removed
    slots). Applies only to leaves whose leading dim == C (the
    per-gaussian params: xyz). Reference semantics: new slots get zero
    exp_avg/exp_avg_sq, survivors keep theirs (sings_hybrid.py:856-932).
    """
    c = slot_mask.shape[0]
    keep = (1.0 - slot_mask)

    def fix(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == c:
            return x * keep.reshape((c,) + (1,) * (x.ndim - 1))
        return x

    def fix_adam(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=s.count,
                mu=jax.tree.map(fix, s.mu),
                nu=jax.tree.map(fix, s.nu),
            )
        return s

    return tuple(fix_adam(s) for s in opt_state)
