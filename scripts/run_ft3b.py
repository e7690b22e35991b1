"""One REAL 3B LoRA-SFT leg on IEMOCAP, on-chip (r4 VERDICT #2).

Reference C14 (src/ft_llm.py:263-307) trains Llama-3.2-3B for 3 epochs to a
best-weighted-F1 adapter. This leg runs the same protocol (int8 frozen base
= QLoRA stance, LoRA r=32 alpha=128 all-linear, bs4 x accum4, lr 3e-4
linear, NEFTune 5, seq 1024, window +-5) at the REAL Llama-3.2-3B geometry
on the bundled real splits, reports generation-based weighted-F1 before and
after, and saves the adapter (f16) + meta as a repo artifact that
bench.py's `sft.f1_3b` section re-evaluates every round.

No pretrained base exists in this zero-egress env (docs/WEIGHTS.md), so the
base is the SEEDED random init — the leg proves the production-geometry
training path optimizes and the adapter artifact round-trips, not that a
random 3B matches a pretrained one's absolute F1.

  python scripts/run_ft3b.py [--epochs 1] [--out artifacts/ft3b]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
DATA = Path("/root/reference/data")


def iemocap_samples(split: str, window: int = 5):
    from autostyle_tts_tpu.train import reformat

    convs = json.loads((DATA / f"iemocap.{split}.json").read_text())
    out = []
    for conv_id, conv in convs.items():
        out.extend(reformat.conversation_to_messages(conv_id, conv, window=window))
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--eval_every", type=int, default=150)
    p.add_argument("--eval_n", type=int, default=0,
                   help="cap valid samples during in-train eval (0 = all)")
    p.add_argument("--out", type=str, default=str(REPO / "artifacts" / "ft3b"))
    p.add_argument("--dry", action="store_true",
                   help="CPU validation: tiny geometry, 2-conversation data")
    p.add_argument("--skip_before", type=float, default=None,
                   help="skip the 18-min f1_before eval and record this "
                        "value (the seeded random base measured 0.0000)")
    p.add_argument("--stall_min", type=float, default=25.0,
                   help="abort if no train/eval progress for this many "
                        "minutes (the tunneled device wedges silently)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from autostyle_tts_tpu.models import transformer as core
    from autostyle_tts_tpu.train import lora_sft, reformat
    from autostyle_tts_tpu.utils.checkpoint import save_pytree
    from autostyle_tts_tpu.utils.config import Config

    cfg = Config().embedder          # llama32_3b_config
    tcfg = dataclasses.replace(
        Config().train, seed=args.seed, epochs=args.epochs,
        eval_every=args.eval_every, save_every=args.eval_every,
    )
    labels = reformat.label_set("en")
    train_samples = iemocap_samples("train")
    valid_samples = iemocap_samples("valid")
    if args.dry:
        from autostyle_tts_tpu.utils.config import tiny_config

        cfg = tiny_config().embedder
        tcfg = dataclasses.replace(
            tcfg, batch_size=2, grad_accum=1, max_seq_len=128,
            eval_every=10, save_every=10,
        )
        train_samples = train_samples[:40]
        valid_samples = valid_samples[:16]
    eval_in_train = valid_samples[: args.eval_n] if args.eval_n else valid_samples
    print(f"{len(train_samples)} train / {len(valid_samples)} valid samples; "
          f"geometry dim={cfg.dim} L={cfg.n_layers} seq={tcfg.max_seq_len}")

    t0 = time.time()
    params = core.init_params_quantized(
        jax.random.PRNGKey(args.seed), cfg, bits=8
    )
    print(f"int8 base initialized in {time.time() - t0:.1f}s")

    # stale-progress watchdog: the tunneled device can wedge mid-RPC with
    # zero client-side signal (observed once: 40 min silent at training
    # start). lora_sft stamps HEARTBEAT every micro-step / eval batch;
    # going stall_min without a stamp means the run is dead — exit loudly
    # so the driver restarts instead of burning the round's TPU hours.
    import os
    import threading

    lora_sft.HEARTBEAT["t"] = time.time()

    def _watchdog():
        while True:
            time.sleep(60)
            stale = time.time() - lora_sft.HEARTBEAT["t"]
            if stale > args.stall_min * 60:
                print(f"[watchdog] no progress for {stale/60:.1f} min "
                      f"(last: {lora_sft.HEARTBEAT}) — device wedged, "
                      f"aborting", flush=True)
                os._exit(17)

    threading.Thread(target=_watchdog, daemon=True).start()

    t0 = time.time()
    if args.skip_before is not None:
        f1_before = float(args.skip_before)
        print(f"f1_before={f1_before:.4f} (recorded, eval skipped)")
    else:
        f1_before, _ = lora_sft.evaluate_generation(
            params, cfg, valid_samples, labels
        )
        print(f"f1_before={f1_before:.4f} ({time.time() - t0:.1f}s)")

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    res = lora_sft.train(
        params, cfg, tcfg, train_samples,
        eval_samples=eval_in_train, labels=labels,
        out_dir=str(out_dir / "run"),
    )
    wall = time.time() - t0
    print(f"trained {res['steps']} steps in {wall:.1f}s "
          f"(best_f1={res['best_f1']:.4f} @ {res['best_step']})")

    # final-vs-best: report the better adapter (load_best_model_at_end parity)
    lora = res["lora"]
    from autostyle_tts_tpu.utils.checkpoint import load_pytree

    best = Path(res["best_checkpoint"])
    if best.exists() and res["best_f1"] >= 0:
        lora = load_pytree(best, lora)
    t0 = time.time()
    f1_after, _ = lora_sft.evaluate_generation(
        params, cfg, valid_samples, labels,
        lora=lora, lora_scale=tcfg.lora.alpha / tcfg.lora.r,
    )
    print(f"f1_after={f1_after:.4f} ({time.time() - t0:.1f}s)")

    # artifact: f16 adapter + meta (bench.py sft.f1_3b re-evaluates this)
    lora_f16 = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float16), lora
    )
    save_pytree(out_dir / "adapter_f16.npz", lora_f16)
    n_par = sum(a.size for a in jax.tree_util.tree_leaves(lora_f16))
    meta = {
        "geometry": f"llama32_3b dim={cfg.dim} L={cfg.n_layers}",
        "base": f"init_params_quantized(PRNGKey({args.seed}), bits=8) — "
                "seeded random (no pretrained weights in this env)",
        "protocol": "LoRA r=32 a=128 all-linear, bs4 x accum4, lr 3e-4 "
                    "linear, NEFTune 5, seq 1024, window +-5 "
                    "(src/ft_llm.py:254-307 parity)",
        "epochs": args.epochs,
        "seed": args.seed,
        "steps": res["steps"],
        "train_wall_s": round(wall, 1),
        "f1_before": round(float(f1_before), 4),
        "f1_after": round(float(f1_after), 4),
        "best_f1_in_train": round(float(res["best_f1"]), 4),
        "adapter_params": int(n_par),
        "packing": res["packing"],
        "train_samples": len(train_samples),
        "valid_samples": len(valid_samples),
    }
    (out_dir / "meta.json").write_text(json.dumps(meta, indent=2))
    print(json.dumps(meta, indent=2))


if __name__ == "__main__":
    main()
