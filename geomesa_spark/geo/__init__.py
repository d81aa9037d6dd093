from . import kernels, wkt  # noqa: F401
