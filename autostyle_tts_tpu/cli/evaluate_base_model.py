"""Base-model ERC eval (reference C20, src/evaluate_base_model.py + _cn.py):
generation-based weighted-F1 of the UN-finetuned embedder on a chat-format
test JSONL (one CLI, --language picks the label set)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..train import lora_sft, reformat
from ..utils.manifest import read_jsonl
from .common import add_common_args, build_config


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--test_jsonl", type=str, required=True)
    p.add_argument("--language", type=str, default="en", choices=["en", "zh"])
    p.add_argument("--embedder_checkpoint", type=str, default=None)
    p.add_argument("--output_file", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args(argv)

    import jax

    from ..models import transformer as core

    cfg = build_config(args)
    ecfg = cfg.embedder
    params = core.init_params(jax.random.PRNGKey(args.seed), ecfg)
    if args.embedder_checkpoint:
        from ..utils.checkpoint import load_pytree

        params = load_pytree(args.embedder_checkpoint, params)
    samples = read_jsonl(args.test_jsonl)
    labels = reformat.label_set(args.language)
    f1, preds = lora_sft.evaluate_generation(
        params, ecfg, samples, labels, batch_size=args.batch_size
    )
    print(f"weighted_f1={f1:.4f} over {len(samples)} samples")
    if args.output_file:
        Path(args.output_file).parent.mkdir(parents=True, exist_ok=True)
        with open(args.output_file, "w", encoding="utf-8") as f:
            json.dump(
                {"weighted_f1": f1,
                 "predictions": preds,
                 "references": [s["messages"][-1]["content"] for s in samples]},
                f, ensure_ascii=False, indent=2,
            )
        print(f"wrote predictions -> {args.output_file}")


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
