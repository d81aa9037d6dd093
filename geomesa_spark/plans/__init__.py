from . import lineage, planner  # noqa: F401
