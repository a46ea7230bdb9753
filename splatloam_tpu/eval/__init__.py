from .odometry import evaluate_rpe  # noqa: F401
from .recon import crop_union, evaluate_recon, nn_correspondence  # noqa: F401
