from .native import available as native_available, scan as native_scan  # noqa: F401
