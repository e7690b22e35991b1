"""Shared CLI plumbing: config/override flags, engine/embedder builders,
checkpoint loading, result-dir conventions.

Replaces the reference's per-script argparse blocks with cluster-path
defaults (SURVEY §5 config row). Every CLI accepts:
  --config cfg.json          load a Config tree
  --set section.field=value  dotted overrides (repeatable)
  --checkpoint DIR/FILE      load engine params (npz pytree snapshot)
  --tiny                     tiny geometry (tests/smoke)
"""

from __future__ import annotations

import argparse
import datetime
import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ..utils import config as config_lib
from ..utils.checkpoint import load_pytree, save_pytree


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", type=str, default=None, help="Config JSON path")
    p.add_argument(
        "--set", dest="overrides", action="append", default=[],
        metavar="KEY=VALUE", help="dotted config override (repeatable)",
    )
    p.add_argument("--checkpoint", type=str, default=None,
                   help="engine params snapshot (.npz)")
    p.add_argument("--tiny", action="store_true", help="tiny test geometry")
    p.add_argument("--demo", action="store_true",
                   help="demo geometry: ~15M-param stack at production "
                        "audio rates (trainable on the synthcorpus)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--profile", action="store_true",
                   help="per-stage wall-time report (+jax.profiler spans) at exit")
    p.add_argument("--dp", type=int, default=0,
                   help="shard request batches over N devices (data axis); "
                        "0 = single device")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree (model axis); total devices "
                        "used = dp*tp")


def build_config(args) -> config_lib.Config:
    cfg = (
        config_lib.tiny_config() if args.tiny
        else config_lib.demo_config() if getattr(args, "demo", False)
        else config_lib.load(args.config) if args.config
        else config_lib.Config()
    )
    if args.overrides:
        config_lib.apply_overrides(cfg, args.overrides)
    return cfg


def build_engine(args):
    """Engine with optional checkpoint restore + persistent compile cache."""
    import jax

    cache_dir = os.environ.get("ASTTTS_COMPILE_CACHE", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from ..pipeline import Engine, EngineParams

    cfg = build_config(args)
    params = None
    if args.checkpoint:
        import jax.numpy as jnp

        init = EngineParams.init(jax.random.PRNGKey(args.seed), cfg)
        loaded = load_pytree(args.checkpoint, init.tree())
        params = EngineParams.from_tree(
            jax.tree_util.tree_map(jnp.asarray, loaded)
        )
    profile = bool(getattr(args, "profile", False))
    mesh = None
    dp, tp = int(getattr(args, "dp", 0) or 0), int(getattr(args, "tp", 1) or 1)
    if dp > 1 or tp > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(data=max(dp, 1), model=tp)
    engine = Engine(cfg, params=params, seed=args.seed, profile=profile,
                    mesh=mesh)
    if profile:
        import atexit

        atexit.register(lambda: print("\n-- stage timing --\n" + engine.watch.report()))
    return engine


def save_engine_checkpoint(engine, path: str) -> None:
    save_pytree(path, engine.params.tree())


def timestamped_dir(base: str) -> Path:
    """Result-dir anti-clobber convention (reference tts_with_rag.py:165-168)."""
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    d = Path(base) / stamp
    d.mkdir(parents=True, exist_ok=True)
    return d


def read_lines(path: str) -> List[str]:
    with open(path, encoding="utf-8") as f:
        return [ln.strip() for ln in f if ln.strip()]


def save_wav_22050_or_24k(path, wav: np.ndarray, engine) -> None:
    """Save at the engine's output rate (24 kHz per BASELINE north star; the
    reference hardcoded 22 050 — divergence recorded in SURVEY §7)."""
    from ..utils.audio_io import write_wav

    write_wav(path, wav, engine.cfg.audio.sample_rate)


def run_cli(main_fn) -> None:
    """__main__ wrapper: surface failures as one-line `error:` messages with
    exit code 1 instead of tracebacks (ASTTTS_DEBUG=1 re-raises). Library and
    test callers invoke main() directly and still get real exceptions."""
    import sys

    try:
        main_fn()
    except KeyboardInterrupt:
        sys.exit(130)
    except Exception as e:  # noqa: BLE001 — terminal UX boundary
        if os.environ.get("ASTTTS_DEBUG") == "1":
            raise
        print(f"error: {type(e).__name__}: {e}", file=sys.stderr)
        sys.exit(1)
