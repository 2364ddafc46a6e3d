from .registry import REGISTRY, Query  # noqa: F401
