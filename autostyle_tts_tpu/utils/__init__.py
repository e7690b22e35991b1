from . import audio_io, config, manifest, rng, timing  # noqa: F401
