from .common import Gaussians2D, preprocess  # noqa: F401
from .reference import composite_dense  # noqa: F401
