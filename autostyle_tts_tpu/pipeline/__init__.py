from .engine import Engine, EngineParams  # noqa: F401
