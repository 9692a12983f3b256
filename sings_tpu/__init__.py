"""sings_tpu: TPU-native animatable human Gaussian-splat avatar framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SinGS
("Animatable Single-Image Human Gaussian Splats with Kinematic Priors",
CVPR 2025; reference implementation surveyed in /root/repo/SURVEY.md).

Layer map (mirrors SURVEY.md section 1, redesigned TPU-first):

  cli/        train / animate entry points, layered config
  train/      functional trainer, optax optimizer groups, density control
  model/      avatar state pytree + forward (fields -> LBS -> gaussians)
  fields/     triplane feature field + decoder MLPs
  kinematics/ SMPL/SMPLH body template, LBS, poses, AMASS mapping
  ops/        rasterizer (Pallas kernels + pure-JAX reference), math ops
  mesh/       subdivision / edge collapse / laplacians (host) + device apply
  losses/     photometric (l1/ssim/lpips-patch) + regularizers
  data/       training-kit loader, animation motions, camera factories
  dist/       jax.sharding mesh axes, sharded train step
  export/     .ply / .splat writers
"""

__version__ = "0.1.0"
