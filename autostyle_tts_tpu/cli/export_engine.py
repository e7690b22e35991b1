"""Export/import engine parameter snapshots (.npz pytree).

The synthesis models' checkpoint-loading path: every synthesis CLI accepts
--checkpoint; this CLI produces one (from a fresh init, an existing snapshot,
or with --quantize_int8 applied), replacing the reference's pickled
CosyVoice-300M checkpoint directory as the weight interchange format."""

from __future__ import annotations

import argparse

from .common import add_common_args, build_engine, save_engine_checkpoint


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--output", type=str, required=True, help="snapshot .npz path")
    args = p.parse_args(argv)
    engine = build_engine(args)
    save_engine_checkpoint(engine, args.output)
    print(f"engine params -> {args.output}")


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
