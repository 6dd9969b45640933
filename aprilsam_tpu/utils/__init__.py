from .cache import enable_compilation_cache, setup_precision

__all__ = ["enable_compilation_cache", "setup_precision"]
