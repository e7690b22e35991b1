from . import lora_sft, reformat  # noqa: F401
