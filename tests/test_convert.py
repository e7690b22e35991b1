"""CosyVoice artifact ingestion: ONNX wire parser round-trip, torch .pt
ingestion, and the rule-driven mapping engine (fusion/transpose/stacking +
coverage report). Real-artifact rule tables require the release files
(zero-egress environment) — these tests pin the machinery."""

import numpy as np
import pytest

from autostyle_tts_tpu.utils import cosyvoice_convert as cc
from autostyle_tts_tpu.utils.onnx_load import (
    load_onnx_weights, write_onnx_tensors,
)


def test_onnx_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "enc.w": rng.standard_normal((4, 8)).astype(np.float32),
        "enc.b": rng.standard_normal((8,)).astype(np.float32),
        "emb": rng.integers(0, 100, (16, 3)).astype(np.int64),
        "half": rng.standard_normal((2, 2)).astype(np.float16),
        "scalarish": np.asarray([3.5], np.float32),
    }
    p = tmp_path / "m.onnx"
    write_onnx_tensors(p, tensors)
    got = load_onnx_weights(p)
    assert set(got) == set(tensors)
    for k in tensors:
        assert got[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(got[k], tensors[k])


def test_torch_pt_ingestion(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {
        "lin.weight": torch.randn(6, 4),
        "lin.bias": torch.randn(6),
        "emb.weight": torch.randn(10, 4),
    }
    p = tmp_path / "llm.pt"
    torch.save(sd, p)
    got = cc.load_torch_tensors(p)
    assert set(got) == set(sd)
    np.testing.assert_allclose(got["lin.weight"], sd["lin.weight"].numpy(),
                               rtol=1e-6)


def test_inventory(tmp_path):
    torch = pytest.importorskip("torch")
    torch.save({"a.weight": torch.randn(2, 3)}, tmp_path / "llm.pt")
    write_onnx_tensors(
        tmp_path / "campplus.onnx",
        {"tdnn.w": np.zeros((5, 2), np.float32)},
    )
    inv = cc.inventory(tmp_path)
    assert inv["llm.pt"] == {"a.weight": [2, 3]}
    assert inv["campplus.onnx"] == {"tdnn.w": [5, 2]}


def test_mapping_engine_fuse_transpose_stack():
    """q/k/v fuse into wqkv (transposed), per-layer tensors stack on [L] —
    the exact transform set hf_convert applies, expressed as rules."""
    rng = np.random.default_rng(1)
    D = 4
    src = {}
    for i in range(3):
        for n in "qkv":
            src[f"llm.layers.{i}.attn.{n}.weight"] = (
                rng.standard_normal((D, D)).astype(np.float32)
            )
        src[f"llm.layers.{i}.norm.weight"] = np.full((D,), i, np.float32)
    src["llm.embed.weight"] = rng.standard_normal((10, D)).astype(np.float32)

    rules = [
        cc.Rule(
            src=r"llm\.layers\.(\d+)\.attn\.q\.weight",
            dst="layers/wqkv", transform="T",
            fuse=(r"llm.layers.{0}.attn.q.weight",
                  r"llm.layers.{0}.attn.k.weight",
                  r"llm.layers.{0}.attn.v.weight"),
        ),
        cc.Rule(src=r"llm\.layers\.(\d+)\.norm\.weight", dst="layers/norm"),
        cc.Rule(src=r"llm\.embed\.weight", dst="embed"),
    ]
    tree, report = cc.apply_rules(src, rules, n_layers=3)
    assert report.complete or not report.unmapped_src
    assert tree["layers"]["wqkv"].shape == (3, D, 3 * D)
    assert tree["layers"]["norm"].shape == (3, D)
    np.testing.assert_array_equal(tree["layers"]["norm"][2], np.full(D, 2))
    # fused block i, q part == transposed source
    np.testing.assert_allclose(
        tree["layers"]["wqkv"][1][:, :D],
        src["llm.layers.1.attn.q.weight"].T,
    )
    assert tree["embed"].shape == (10, D)
    assert report.unmapped_src == []


def test_mapping_report_flags_gaps():
    src = {"known.weight": np.zeros((2, 2), np.float32),
           "mystery.weight": np.ones((3,), np.float32)}
    rules = [cc.Rule(src=r"known\.weight", dst="w")]
    tree, report = cc.apply_rules(
        src, rules, expected_dst=["w", "missing_thing"]
    )
    assert report.unmapped_src == ["mystery.weight"]
    assert report.unfilled_dst == ["missing_thing"]
    assert not report.complete


def test_conv1d_transform():
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)  # torch [out, in, K]
    got = cc._TRANSFORMS["conv1d"](x)
    assert got.shape == (4, 3, 2)                   # ours [K, in, out]
    assert got[1, 2, 0] == x[0, 2, 1]


def test_convert_cli_inventory(tmp_path, capsys):
    write_onnx_tensors(
        tmp_path / "speech_tokenizer_v1.onnx",
        {"enc.w": np.zeros((2, 2), np.float32)},
    )
    from autostyle_tts_tpu.cli.convert_cosyvoice import main

    out = tmp_path / "inv.json"
    main(["--model_dir", str(tmp_path), "--inventory",
          "--report_json", str(out)])
    import json

    inv = json.loads(out.read_text())
    assert inv["speech_tokenizer_v1.onnx"]["enc.w"] == [2, 2]


def test_weight_norm_fuse_matches_torch():
    """fuse_op="weight_norm" must reconstruct exactly what torch's
    weight_norm parameterization computes (dim=0, the HiFT default)."""
    import torch

    conv = torch.nn.Conv1d(3, 5, 7)
    conv = torch.nn.utils.weight_norm(conv)
    v = conv.weight_v.detach().numpy()
    g = conv.weight_g.detach().numpy()
    with torch.no_grad():
        expected = conv.weight.detach().numpy()  # materialized w
    src = {"conv.weight_v": v, "conv.weight_g": g}
    rules = [cc.Rule(
        src=r"conv\.weight_v", dst="conv/w", transform="conv1d",
        fuse=("conv.weight_v", "conv.weight_g"), fuse_op="weight_norm",
    )]
    tree, report = cc.apply_rules(src, rules)
    np.testing.assert_allclose(
        tree["conv"]["w"], np.transpose(expected, (2, 1, 0)), atol=1e-6
    )
    assert report.unmapped_src == []


def test_layer_count_inferred_per_rule():
    """Stacked rules infer depth from max layer index — two encoders of
    different depths convert in one table without an n_layers arg."""
    src = {f"a.{i}.w": np.full((2,), i, np.float32) for i in range(3)}
    src.update({f"b.{i}.w": np.full((2,), 10 + i, np.float32) for i in range(5)})
    rules = [
        cc.Rule(src=r"a\.(\d+)\.w", dst="a/w"),
        cc.Rule(src=r"b\.(\d+)\.w", dst="b/w"),
    ]
    tree, report = cc.apply_rules(src, rules)
    assert tree["a"]["w"].shape == (3, 2)
    assert tree["b"]["w"].shape == (5, 2)
    assert tree["b"]["w"][4, 0] == 14
    assert report.unmapped_src == []


def test_convert_cli_rules_path_runs(tmp_path):
    """Regression: the non---inventory CLI path crashed on a missing
    RULESETS attribute (round-2 ADVICE #1). It must run a user rule table
    end to end."""
    import json

    import torch

    torch.save({"enc.weight": torch.zeros(4, 2)}, tmp_path / "llm.pt")
    rules = {"llm.pt": [{"src": r"enc\.weight", "dst": "enc/w",
                         "transform": "T"}]}
    rp = tmp_path / "rules.json"
    rp.write_text(json.dumps(rules))
    from autostyle_tts_tpu.cli.convert_cosyvoice import main

    report = tmp_path / "report.json"
    main(["--model_dir", str(tmp_path), "--rules", str(rp),
          "--report_json", str(report), "--strict"])
    rep = json.loads(report.read_text())
    assert rep["llm.pt"]["mapped"] == ["enc.weight"]
