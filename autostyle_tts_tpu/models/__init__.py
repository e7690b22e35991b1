from . import (  # noqa: F401
    cfm,
    frontend,
    speaker,
    speech_tokenizer,
    token_lm,
    transformer,
    vocoder,
)
