from .store import SearchHit, StyleStore  # noqa: F401
