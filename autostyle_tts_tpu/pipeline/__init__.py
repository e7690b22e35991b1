from .engine import Engine, EngineParams  # noqa: F401
from .rag import DialogTurn, EmbedderService, build_style_db, search_dialog  # noqa: F401
from .stream_serve import StreamEvent, StreamingScheduler  # noqa: F401
