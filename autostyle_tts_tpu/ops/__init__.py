from . import (  # noqa: F401
    attention,
    conv,
    pallas_attn,
    quant,
    resample,
    sampling,
    stft,
    topk,
)
