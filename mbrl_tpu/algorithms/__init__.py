from . import mbpo, pets, planet

__all__ = ["pets", "mbpo", "planet"]
