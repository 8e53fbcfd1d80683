from .cache import enable_persistent_cache  # noqa: F401
