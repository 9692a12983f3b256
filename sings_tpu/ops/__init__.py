from . import graphics, knn, rotations, sampling, schedules, sh, ssim  # noqa: F401
