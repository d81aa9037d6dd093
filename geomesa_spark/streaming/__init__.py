from . import live  # noqa: F401
