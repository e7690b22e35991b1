"""Train the synthesis stack from a (wav, text) manifest.

The reference had no way to train its engine (pretrained CosyVoice only,
SURVEY §0); this CLI trains any stage on TPU:

  --stage token_lm | cfm | vocoder | vocoder_gan

Data: --manifest JSON/JSONL of {wav|file_id, text[, speaker]} (+ --wav_dir).
Checkpoints land in --out_dir via the step-numbered CheckpointManager; resume
is automatic from the latest checkpoint.
"""

from __future__ import annotations

import argparse

from ..train import acoustic
from ..train.data import load_acoustic_manifest, make_acoustic_batches
from ..utils.checkpoint import CheckpointManager
from .common import add_common_args, build_engine


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--manifest", type=str, required=True)
    p.add_argument("--wav_dir", type=str, default="")
    p.add_argument("--stage", type=str, required=True,
                   choices=["tokenizer", "token_lm", "cfm", "vocoder",
                            "vocoder_gan", "phn_head"])
    p.add_argument("--n_phoneme_classes", type=int, default=0,
                   help="tokenizer stage: phoneme label classes (0 = the "
                        "synthcorpus inventory)")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--prompt_seconds", type=float, default=3.0)
    p.add_argument("--save_every", type=int, default=200)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--stall_min", type=float, default=20.0,
                   help="abort (exit 17) when no step completes for this "
                        "many minutes — the tunneled device can wedge "
                        "silently mid-RPC; checkpoints make the rerun a "
                        "resume (scripts/train_synth_prod_resume.sh)")
    p.add_argument("--cache_items", type=int, default=40000,
                   help="feature-cache capacity in items (host RAM bound; "
                        "a corpus larger than this refeaturizes the "
                        "overflow every epoch)")
    args = p.parse_args(argv)

    import jax

    # liveness: stamped after every optimizer step by all stage loops below
    import os
    import threading
    import time as _time

    beat = {"t": _time.time(), "step": 0}

    def _watchdog():
        while True:
            _time.sleep(60)
            stale = _time.time() - beat["t"]
            if stale > args.stall_min * 60:
                print(f"[watchdog] no step for {stale / 60:.1f} min "
                      f"(last {beat}) — device wedged, aborting", flush=True)
                os._exit(17)

    threading.Thread(target=_watchdog, daemon=True).start()

    engine = build_engine(args)
    cfg = engine.cfg
    items = load_acoustic_manifest(args.manifest, args.wav_dir)
    print(f"{len(items)} training items")
    feat_cache = {}  # per-item wav+features, reused across epochs
    a = cfg.audio
    opt = acoustic.default_optimizer(
        args.learning_rate,
        total_steps=max(1, args.epochs * len(items) // args.batch_size),
    )
    mgr = CheckpointManager(args.out_dir, save_total_limit=2)

    def start_epoch(step: int) -> int:
        # resume skips fully-completed epochs (a watchdog-retried stage
        # would otherwise re-run its whole epoch budget on top)
        return min(args.epochs, step // max(1, len(items) // args.batch_size))


    if args.stage == "tokenizer":
        from ..train.synthcorpus import N_PHONEME_CLASSES

        import jax.numpy as jnp

        n_cls = args.n_phoneme_classes or N_PHONEME_CLASSES
        params = {
            # COPY: the step donates its param buffers, but the engine's
            # featurizer (used by the data pipeline) still reads the original
            # speech-tokenizer tree every batch
            "tok": jax.tree_util.tree_map(
                jnp.copy, engine.params.speech_tokenizer
            ),
            "head": acoustic.init_tokenizer_head(
                jax.random.PRNGKey(args.seed + 2), cfg.speech_tokenizer, n_cls
            ),
        }
        step_fn = acoustic.make_tokenizer_step(
            cfg.speech_tokenizer, a, opt, n_cls
        )
        opt_state = opt.init(params)
        usage = acoustic.init_usage(cfg.speech_tokenizer)
        step = mgr.latest_step() or 0
        if step:
            params = mgr.restore(params)
        key = jax.random.PRNGKey(args.seed)
        for epoch in range(start_epoch(step), args.epochs):
            for batch in make_acoustic_batches(
                engine, items, args.batch_size, args.prompt_seconds,
                seed=args.seed + epoch, stages=("tokenizer",), cache=feat_cache,
                cache_max_items=args.cache_items,
            ):
                key, sub = jax.random.split(key)
                params, opt_state, usage, loss, ce, acc, n_used = step_fn(
                    params, opt_state, usage, batch["tokenizer"], sub
                )
                step += 1
                beat["t"], beat["step"] = _time.time(), step
                if step % args.log_every == 0:
                    print(f"step {step}: loss={float(loss):.4f} "
                          f"phn_ce={float(ce):.4f} phn_acc={float(acc):.3f} "
                          f"codes_used={int(n_used)}")
                if step % args.save_every == 0:
                    mgr.save(step, params)
        mgr.save(max(step, 1), params)
        print(f"done: {step} steps -> {args.out_dir}")
        return

    if args.stage == "phn_head":
        # standalone phoneme-recognizer head on the FROZEN tokenizer from
        # --checkpoint (the shipped trained engine): the intelligibility
        # gate's transcriber (pipeline/simeval.phoneme_error_rate)
        from ..train.synthcorpus import N_PHONEME_CLASSES

        n_cls = args.n_phoneme_classes or N_PHONEME_CLASSES
        head = acoustic.init_tokenizer_head(
            jax.random.PRNGKey(args.seed + 3), cfg.speech_tokenizer, n_cls
        )
        step_fn = acoustic.make_phn_head_step(
            cfg.speech_tokenizer, a, opt, n_cls
        )
        opt_state = opt.init(head)
        step = mgr.latest_step() or 0
        if step:
            head = mgr.restore(head)
        for epoch in range(start_epoch(step), args.epochs):
            for batch in make_acoustic_batches(
                engine, items, args.batch_size, args.prompt_seconds,
                seed=args.seed + epoch, stages=("tokenizer",),
                cache=feat_cache, cache_max_items=args.cache_items,
            ):
                head, opt_state, ce, acc = step_fn(
                    engine.params.speech_tokenizer, head, opt_state,
                    batch["tokenizer"],
                )
                step += 1
                beat["t"], beat["step"] = _time.time(), step
                if step % args.log_every == 0:
                    print(f"step {step}: phn_ce={float(ce):.4f} "
                          f"phn_acc={float(acc):.3f}")
                if step % args.save_every == 0:
                    mgr.save(step, head)
        mgr.save(max(step, 1), head)
        print(f"done: {step} steps -> {args.out_dir}")
        return

    if args.stage == "token_lm":
        params = engine.params.token_lm
        step_fn = acoustic.make_token_lm_step(cfg.token_lm, opt)
        batch_key = "token_lm"
    elif args.stage == "cfm":
        params = engine.params.cfm
        step_fn = acoustic.make_cfm_step(cfg.cfm, opt)
        batch_key = "cfm"
    elif args.stage == "vocoder":
        params = engine.params.vocoder
        step_fn = acoustic.make_vocoder_step(
            cfg.vocoder, opt, sr=a.sample_rate, n_fft=a.n_fft, hop=a.hop_length
        )
        batch_key = "vocoder"
    else:  # vocoder_gan
        from ..models import discriminator as disc_lib

        g_params = engine.params.vocoder
        d_params = disc_lib.init_params(jax.random.PRNGKey(args.seed + 1))
        d_opt = acoustic.default_optimizer(args.learning_rate)
        gen_step, disc_step = acoustic.make_vocoder_gan_steps(
            cfg.vocoder, opt, d_opt, sr=a.sample_rate, n_fft=a.n_fft,
            hop=a.hop_length,
        )
        g_st, d_st = opt.init(g_params), d_opt.init(d_params)
        step = mgr.latest_step() or 0
        if step:
            g_params = mgr.restore(g_params)
        key = jax.random.PRNGKey(args.seed)
        for epoch in range(start_epoch(step), args.epochs):
            for batch in make_acoustic_batches(
                engine, items, args.batch_size, args.prompt_seconds,
                seed=args.seed + epoch, stages=("vocoder",), cache=feat_cache,
                cache_max_items=args.cache_items,
            ):
                key, k1, k2 = jax.random.split(key, 3)
                d_params, d_st, d_loss = disc_step(
                    d_params, d_st, g_params, batch["vocoder"], k1
                )
                g_params, g_st, g_loss = gen_step(
                    g_params, g_st, d_params, batch["vocoder"], k2
                )
                step += 1
                beat["t"], beat["step"] = _time.time(), step
                if step % args.log_every == 0:
                    print(f"step {step}: g={float(g_loss):.4f} d={float(d_loss):.4f}")
                if step % args.save_every == 0:
                    mgr.save(step, g_params)
        mgr.save(max(step, 1), g_params)
        print(f"done: {step} steps -> {args.out_dir}")
        return

    opt_state = opt.init(params)
    step = mgr.latest_step() or 0
    if step:
        params = mgr.restore(params)
    key = jax.random.PRNGKey(args.seed)
    for epoch in range(start_epoch(step), args.epochs):
        for batch in make_acoustic_batches(
            engine, items, args.batch_size, args.prompt_seconds,
            seed=args.seed + epoch, stages=(batch_key,), cache=feat_cache,
            cache_max_items=args.cache_items,
        ):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step_fn(params, opt_state, batch[batch_key], sub)
            step += 1
            beat["t"], beat["step"] = _time.time(), step
            if step % args.log_every == 0:
                print(f"step {step}: loss={float(loss):.4f}")
            if step % args.save_every == 0:
                mgr.save(step, params)
    mgr.save(max(step, 1), params)
    print(f"done: {step} steps -> {args.out_dir}")


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
