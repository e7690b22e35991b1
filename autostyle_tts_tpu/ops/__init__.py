from . import attention, resample, sampling, stft, topk  # noqa: F401
