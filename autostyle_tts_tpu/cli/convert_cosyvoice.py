"""Ingest/convert a CosyVoice-300M release directory.

  # audit: dump every artifact's tensor names + shapes
  python -m autostyle_tts_tpu.cli.convert_cosyvoice \\
      --model_dir /path/CosyVoice-300M --inventory --report_json inv.json

  # convert with a rule table (see utils/cosyvoice_convert.RULESETS)
  python -m autostyle_tts_tpu.cli.convert_cosyvoice \\
      --model_dir ... --rules rules.json --output engine.npz

Reads torch .pt state_dicts and ONNX weights (our own protobuf parser — no
onnx package needed). Reference load site: tts_with_rag.py:107.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..utils import cosyvoice_convert as cc


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--inventory", action="store_true",
                   help="dump tensor names/shapes for every artifact")
    p.add_argument("--rules", type=str, default=None,
                   help="JSON rule table {artifact: [{src,dst,transform,"
                        "fuse,fuse_axis}]} overriding the built-ins")
    p.add_argument("--report_json", type=str, default=None)
    p.add_argument("--strict", action="store_true",
                   help="fail if any source tensor is unmapped")
    p.add_argument("--output", type=str, default=None,
                   help="write a CosyEngine .npz snapshot of the converted "
                        "llm/flow/hift trees (models/compat)")
    args = p.parse_args(argv)

    if args.inventory:
        inv = cc.inventory(args.model_dir)
        text = json.dumps(inv, indent=2)
        if args.report_json:
            Path(args.report_json).write_text(text)
        n = sum(len(v) for v in inv.values())
        print(f"{len(inv)} artifacts, {n} tensors"
              + (f" -> {args.report_json}" if args.report_json else ""))
        if not args.report_json:
            print(text)
        return

    rulesets = dict(cc.RULESETS)
    if args.rules:
        raw = json.loads(Path(args.rules).read_text())
        for artifact, rules in raw.items():
            rulesets[artifact] = [cc.Rule(**r) for r in rules]
    reports = {}
    trees = {}
    for artifact, rules in rulesets.items():
        path = Path(args.model_dir) / artifact
        if not path.exists():
            continue
        tensors = cc.load_artifact(path)
        tree, report = cc.apply_rules(tensors, rules)
        trees[artifact] = tree
        reports[artifact] = report.__dict__
        print(f"{artifact}: mapped={len(report.mapped)} "
              f"unmapped={len(report.unmapped_src)}")
        if args.strict and report.unmapped_src:
            raise SystemExit(
                f"{artifact}: unmapped tensors: {report.unmapped_src[:10]}..."
            )
    # campplus.onnx converts by GRAPH, not by rule table (its D-TDNN
    # initializer names are not blind-reconstructible): the node graph is
    # carried verbatim into the snapshot and executed op-for-op on the TPU
    # by ops/onnx_exec (models/compat/campplus.py).
    camp_path = Path(args.model_dir) / "campplus.onnx"
    if camp_path.exists():
        import numpy as np

        from ..ops import onnx_exec
        from ..utils.onnx_load import load_onnx_graph

        raw_bytes = camp_path.read_bytes()
        graph = load_onnx_graph(raw_bytes)
        bad = onnx_exec.unsupported_ops(graph)
        reports["campplus.onnx"] = {
            "mode": "graph-executed",
            "ops": onnx_exec.op_histogram(graph),
            "unsupported_ops": bad,
            "n_initializers": len(graph.initializers),
            "inputs": graph.inputs, "outputs": graph.outputs,
        }
        print(f"campplus.onnx: graph-executed, {len(graph.nodes)} nodes, "
              f"unsupported={bad or 'none'}")
        if args.strict and bad:
            raise SystemExit(
                f"campplus.onnx: unsupported ops {bad} — extend "
                f"ops/onnx_exec.OPS"
            )
        if not bad:
            trees["campplus.onnx"] = {
                "__onnx__": np.frombuffer(raw_bytes, np.uint8)
            }
    if args.report_json:
        Path(args.report_json).write_text(json.dumps(reports, indent=2))
    if not reports:
        print("no rule tables matched any artifact — run --inventory first "
              "and author rules (utils/cosyvoice_convert.py docstring)")
    if args.output:
        if not {"llm.pt", "flow.pt", "hift.pt"} <= set(trees):
            raise SystemExit(
                "--output needs llm.pt + flow.pt + hift.pt converted; got "
                f"{sorted(trees)}"
            )
        from ..models.compat.engine import CosyEngine, save_snapshot

        save_snapshot(args.output, trees)
        # load-check: geometry inference + a one-step smoke is the caller's
        # job (tests run the full synthesis); here we prove the snapshot
        # round-trips into an engine
        CosyEngine.load(args.output)
        print(f"engine snapshot -> {args.output} (loads clean)")


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
