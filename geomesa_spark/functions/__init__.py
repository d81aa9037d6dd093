from . import st_funcs  # noqa: F401
