from . import knn, projection  # noqa: F401
from .rasterizer import render  # noqa: F401
