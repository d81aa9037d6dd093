from . import spatial_join  # noqa: F401
