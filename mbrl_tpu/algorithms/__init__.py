from . import mbpo, pets

__all__ = ["pets", "mbpo"]
