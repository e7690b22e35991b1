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
    p.add_argument("--stage_ckpt", action="append", default=[],
                   metavar="STAGE=DIR",
                   help="merge a train_acoustic checkpoint dir into the "
                        "engine snapshot; STAGE in tokenizer|token_lm|cfm|"
                        "vocoder (repeatable)")
    args = p.parse_args(argv)
    engine = build_engine(args)
    for spec in args.stage_ckpt:
        stage, _, ckpt_dir = spec.partition("=")
        from ..train import acoustic
        from ..utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        if stage == "tokenizer":
            import jax

            from ..train.synthcorpus import N_PHONEME_CLASSES

            like = {
                "tok": engine.params.speech_tokenizer,
                "head": acoustic.init_tokenizer_head(
                    jax.random.PRNGKey(0), engine.cfg.speech_tokenizer,
                    N_PHONEME_CLASSES,
                ),
            }
            engine.params.speech_tokenizer = mgr.restore(like)["tok"]
        elif stage in ("token_lm", "cfm", "vocoder"):
            setattr(engine.params, stage,
                    mgr.restore(getattr(engine.params, stage)))
        else:
            raise SystemExit(f"unknown stage in --stage_ckpt: {spec!r}")
        print(f"merged {stage} <- {ckpt_dir} (step {mgr.latest_step()})")
    save_engine_checkpoint(engine, args.output)
    print(f"engine params -> {args.output}")


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
