"""ONNX graph execution (ops/onnx_exec) + the graph-served campplus compat.

The reference ran campplus.onnx under ONNX Runtime (SURVEY §2.3.1 "Speaker
embedding"); here the graph itself is traced into one jitted XLA program —
no name-keyed conversion — so these tests pin the executor's op semantics
against independent numpy references and run the CAM++-shaped synthetic
export end to end through the convert CLI into CosyEngine."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autostyle_tts_tpu.ops import onnx_exec
from autostyle_tts_tpu.utils.onnx_load import (
    OnnxNode, load_onnx_graph, write_onnx_model,
)


def _graph(tensors, nodes, inputs, outputs):
    """Round-trip through the wire format so the parser is always in play."""
    return load_onnx_graph(write_onnx_model(None, tensors, nodes, inputs,
                                            outputs))


def test_wire_roundtrip_nodes_and_attrs():
    nodes = [
        OnnxNode("Conv", ["x", "w"], ["y"], name="c0",
                 attrs={"kernel_shape": [3], "pads": [1, 1], "strides": [2],
                        "dilations": [1], "group": 1, "alpha": 0.5,
                        "mode": "constant"}),
    ]
    w = np.ones((2, 3, 3), np.float32)
    g = _graph({"w": w}, nodes, ["x"], ["y"])
    assert [n.op_type for n in g.nodes] == ["Conv"]
    n = g.nodes[0]
    assert n.inputs == ["x", "w"] and n.outputs == ["y"] and n.name == "c0"
    assert n.attrs["kernel_shape"] == [3]
    assert n.attrs["pads"] == [1, 1]
    assert abs(n.attrs["alpha"] - 0.5) < 1e-7
    assert n.attrs["mode"] == "constant"
    assert g.inputs == ["x"] and g.outputs == ["y"]
    np.testing.assert_array_equal(g.initializers["w"], w)


def test_exec_mlp_matches_numpy():
    rng = np.random.default_rng(0)
    W1 = rng.standard_normal((6, 10)).astype(np.float32)   # Gemm transB
    b1 = rng.standard_normal(10).astype(np.float32)
    W2 = rng.standard_normal((10, 3)).astype(np.float32)
    nodes = [
        OnnxNode("Gemm", ["x", "W1", "b1"], ["h"],
                 attrs={"alpha": 1.0, "beta": 1.0, "transB": 0}),
        OnnxNode("Relu", ["h"], ["r"]),
        OnnxNode("MatMul", ["r", "W2"], ["m"]),
        OnnxNode("Softmax", ["m"], ["y"], attrs={"axis": -1}),
    ]
    g = _graph({"W1": W1, "b1": b1, "W2": W2}, nodes, ["x"], ["y"])
    assert onnx_exec.unsupported_ops(g) == []
    x = rng.standard_normal((4, 6)).astype(np.float32)
    y = np.asarray(onnx_exec.OnnxRunner(g)({"x": x})[0])
    h = np.maximum(x @ W1 + b1, 0) @ W2
    ref = np.exp(h - h.max(-1, keepdims=True))
    ref /= ref.sum(-1, keepdims=True)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_exec_conv2d_pool_matches_numpy():
    rng = np.random.default_rng(1)
    W = rng.standard_normal((3, 2, 3, 3)).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)
    nodes = [
        OnnxNode("Conv", ["x", "W", "b"], ["c"],
                 attrs={"kernel_shape": [3, 3], "pads": [1, 1, 1, 1],
                        "strides": [1, 1], "dilations": [1, 1], "group": 1}),
        OnnxNode("Relu", ["c"], ["r"]),
        OnnxNode("MaxPool", ["r"], ["p"],
                 attrs={"kernel_shape": [2, 2], "strides": [2, 2],
                        "pads": [0, 0, 0, 0]}),
        OnnxNode("GlobalAveragePool", ["p"], ["gap"]),
    ]
    g = _graph({"W": W, "b": b}, nodes, ["x"], ["gap"])
    x = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    out = np.asarray(onnx_exec.OnnxRunner(g)({"x": x})[0])

    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    c = np.zeros((1, 3, 6, 6), np.float32)
    for o in range(3):
        for i0 in range(6):
            for j0 in range(6):
                c[0, o, i0, j0] = (xp[0, :, i0:i0 + 3, j0:j0 + 3] * W[o]).sum()
    c += b[None, :, None, None]
    r = np.maximum(c, 0)
    p = r.reshape(1, 3, 3, 2, 3, 2).max(axis=(3, 5))
    ref = p.mean(axis=(2, 3), keepdims=True)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_exec_static_shape_plumbing_compiles():
    """Shape -> Gather -> Concat -> Reshape chains must stay compile-time
    static (the torch-export flatten idiom); the whole graph jits."""
    rng = np.random.default_rng(2)
    W = rng.standard_normal((12, 5)).astype(np.float32)
    nodes = [
        OnnxNode("Shape", ["x"], ["shp"]),
        OnnxNode("Gather", ["shp", "zero"], ["b"], attrs={"axis": 0}),
        OnnxNode("Unsqueeze", ["b", "zero_l"], ["b1"]),
        OnnxNode("Concat", ["b1", "minus1"], ["tgt"], attrs={"axis": 0}),
        OnnxNode("Reshape", ["x", "tgt"], ["flat"]),
        OnnxNode("MatMul", ["flat", "W"], ["y"]),
    ]
    tensors = {
        "W": W,
        "zero": np.asarray(0, np.int64),
        "zero_l": np.asarray([0], np.int64),
        "minus1": np.asarray([-1], np.int64),
    }
    g = _graph(tensors, nodes, ["x"], ["y"])
    x = rng.standard_normal((3, 4, 3)).astype(np.float32)
    y = np.asarray(onnx_exec.OnnxRunner(g)({"x": x})[0])
    np.testing.assert_allclose(y, x.reshape(3, 12) @ W, rtol=1e-5, atol=1e-6)


def test_exec_unsupported_op_reported():
    g = _graph({}, [OnnxNode("LSTM", ["x"], ["y"])], ["x"], ["y"])
    assert onnx_exec.unsupported_ops(g) == ["LSTM"]
    with pytest.raises(NotImplementedError, match="LSTM"):
        onnx_exec.OnnxRunner(g)


def test_campplus_fixture_matches_numpy_reference():
    """The CAM++-shaped synthetic graph executes to the same numbers as an
    independent numpy roll-out of its architecture."""
    from autostyle_tts_tpu.utils.synth_release import (
        SynthGeometry, build_campplus_onnx,
    )

    geo = SynthGeometry()
    g = load_onnx_graph(build_campplus_onnx(geo))
    assert onnx_exec.unsupported_ops(g) == []
    t = g.initializers
    rng = np.random.default_rng(3)
    feat = rng.standard_normal((1, 24, 80)).astype(np.float32)
    out = np.asarray(onnx_exec.OnnxRunner(g)({g.inputs[0]: feat})[0])

    def conv1d(x, w, b, pad, dil=1):
        k = w.shape[2]
        xp = np.pad(x, ((0, 0), (0, 0), (pad, pad)))
        span = (k - 1) * dil + 1
        T = xp.shape[2] - span + 1
        y = np.zeros((1, w.shape[0], T), np.float32)
        for o in range(w.shape[0]):
            for tt in range(T):
                y[0, o, tt] = (
                    xp[0, :, tt : tt + span : dil] * w[o]
                ).sum() + b[o]
        return y

    def bn(x, p):
        return ((x - t[f"{p}.mean"][None, :, None])
                * (t[f"{p}.scale"]
                   / np.sqrt(t[f"{p}.var"] + 1e-5))[None, :, None]
                + t[f"{p}.bias"][None, :, None])

    x = np.transpose(feat, (0, 2, 1))
    r1 = np.maximum(bn(conv1d(x, t["tdnn1.weight"], t["tdnn1.bias"], 2),
                       "bn1"), 0)
    r2 = np.maximum(bn(conv1d(r1, t["tdnn2.weight"], t["tdnn2.bias"], 2,
                              dil=2), "bn2"), 0)
    ctx = r2.mean(axis=2, keepdims=True)
    gate = 1.0 / (1.0 + np.exp(-(
        conv1d(ctx, t["gate.weight"], t["gate.bias"], 0))))
    h = r2 * gate
    mu = h.mean(axis=2)
    sd = np.sqrt(((h - mu[:, :, None]) ** 2).mean(axis=2) + 1e-5)
    ref = np.concatenate([mu, sd], axis=1) @ t["fc.weight"] + t["fc.bias"]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_kaldi_fbank_shapes_and_cmn():
    from autostyle_tts_tpu.models.compat.campplus import kaldi_fbank

    wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000)).astype(
        np.float32
    )
    feat = np.asarray(kaldi_fbank(jnp.asarray(wav)))
    assert feat.shape == (1 + (8000 - 400) // 160, 80)
    assert np.isfinite(feat).all()
    # mean-normalized over time (the upstream frontend's CMN)
    np.testing.assert_allclose(feat.mean(axis=0), 0.0, atol=1e-4)


def _kaldi_fbank_cleanroom(wav: np.ndarray) -> np.ndarray:
    """Independent float64 NumPy implementation of the upstream frontend's
    torchaudio.compliance.kaldi.fbank(num_mel_bins=80, dither=0, sr=16000,
    defaults) + CMN, written directly from the kaldi algorithm (feature-
    window.cc ProcessWindow order: dc-offset -> preemphasis -> povey window;
    mel.cc mel-domain triangles over fft bins 0..n_fft/2-1; natural log with
    FLT_EPSILON floor; float wav consumed UNSCALED). Shares no code with
    models/compat/campplus.kaldi_fbank — np.fft here vs the module's GEMM
    DFT — so agreement validates both against the spec (the env has no
    torchaudio to compare with, docs/WEIGHTS.md)."""
    FRAME_LEN, HOP, NFFT, NMEL = 400, 160, 512, 80
    n = 1 + (len(wav) - FRAME_LEN) // HOP
    frames = np.stack(
        [wav[i * HOP: i * HOP + FRAME_LEN] for i in range(n)]
    ).astype(np.float64)
    frames = frames - frames.mean(-1, keepdims=True)            # dc offset
    pre = np.concatenate([frames[:, :1], frames[:, :-1]], -1)   # replicate pad
    frames = frames - 0.97 * pre                                # preemphasis
    win = (0.5 - 0.5 * np.cos(
        2 * np.pi * np.arange(FRAME_LEN) / (FRAME_LEN - 1))) ** 0.85
    frames = frames * win                                       # povey
    padded = np.zeros((n, NFFT))
    padded[:, :FRAME_LEN] = frames                              # left-aligned
    spec = np.abs(np.fft.rfft(padded, axis=-1)) ** 2            # [n, 257]
    num_bins = NFFT // 2                                        # no nyquist
    mel = lambda f: 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)
    mlo, mhi = mel(20.0), mel(8000.0)
    mel_freqs = mel(np.arange(num_bins) * 16000.0 / NFFT)
    fb = np.zeros((NFFT // 2 + 1, NMEL))
    delta = (mhi - mlo) / (NMEL + 1)
    for m in range(NMEL):
        left, center = mlo + m * delta, mlo + (m + 1) * delta
        right = mlo + (m + 2) * delta
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        fb[:num_bins, m] = np.maximum(0.0, np.minimum(up, down))
    feat = np.log(np.maximum(spec @ fb, 1.1921e-07))
    return feat - feat.mean(0, keepdims=True)


def test_kaldi_fbank_matches_cleanroom_reference():
    """The jitted GEMM-DFT fbank must agree with the independent np.fft
    float64 clean-room implementation to float32 tolerance — this is the
    strongest kaldi-parity evidence available in a zero-egress env. Both a
    harmonic voice-like signal and one with silent stretches (exercising
    the log floor, where a wrong wav scaling shifts bins by ~0.2)."""
    from autostyle_tts_tpu.models.compat.campplus import kaldi_fbank

    rng = np.random.default_rng(0)
    t = np.arange(16000 * 2) / 16000.0
    voiced = (
        0.3 * np.sin(2 * np.pi * 220 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
        + 0.05 * rng.standard_normal(t.size)
    ).astype(np.float32)
    gated = voiced.copy()
    gated[4000:12000] = 0.0       # hard silence: floor-bound frames
    gated[20000:24000] *= 1e-5    # near-silence
    for wav in (voiced, gated):
        ref = _kaldi_fbank_cleanroom(wav.astype(np.float64))
        got = np.asarray(kaldi_fbank(jnp.asarray(wav)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-3)


def test_convert_cli_campplus_graph_and_engine_embedding(tmp_path):
    """End to end: synthetic release dir (with campplus.onnx nodes) ->
    convert CLI --strict -> snapshot -> CosyEngine.embed_speaker_wav16."""
    from autostyle_tts_tpu.cli.convert_cosyvoice import main
    from autostyle_tts_tpu.models.compat.engine import CosyEngine
    from autostyle_tts_tpu.utils.synth_release import (
        SynthGeometry, build_release_dir,
    )

    geo = SynthGeometry()
    release = build_release_dir(tmp_path / "rel", geo)
    snap = tmp_path / "engine.npz"
    report = tmp_path / "report.json"
    main(["--model_dir", str(release), "--strict",
          "--report_json", str(report), "--output", str(snap)])
    rep = json.loads(report.read_text())
    assert rep["campplus.onnx"]["mode"] == "graph-executed"
    assert rep["campplus.onnx"]["unsupported_ops"] == []

    eng = CosyEngine.load(snap, n_steps=2)
    wav = (0.3 * np.sin(2 * np.pi * 180 * np.arange(8000) / 16000)).astype(
        np.float32
    )
    emb = eng.embed_speaker_wav16(wav)
    assert emb.shape == (geo.spk_dim,)
    assert np.isfinite(emb).all()
    # bucketed path compiles a padded variant and stays close
    emb_b = eng.embed_speaker_wav16(wav, bucket=True)
    assert emb_b.shape == (geo.spk_dim,)
    assert np.isfinite(emb_b).all()
    # the x-vector feeds the full synthesis contract
    toks = eng.tokenize_wav16(wav)
    out = next(eng.inference_tts_with_st(
        text_ids=np.array([3, 1, 4], np.int32),
        style_tokens=toks[:3] if len(toks) >= 3 else np.array([1], np.int32),
        timbre_tokens=np.array([5, 3], np.int32),
        timbre_mel=np.zeros((4, geo.n_mels), np.float32),
        spk=emb, max_new=8,
    ))
    assert np.isfinite(out["tts_speech"]).all()


def test_avgpool_excludes_pad_by_default():
    """ONNX AveragePool default count_include_pad=0: padded positions must
    not dilute edge averages (review repro: kernel 3, pads [1,1] on
    [3,6,9,12] -> [4.5, 6, 9, 10.5], NOT /3 everywhere)."""
    nodes = [OnnxNode("AveragePool", ["x"], ["y"],
                      attrs={"kernel_shape": [3], "pads": [1, 1],
                             "strides": [1]})]
    g = _graph({}, nodes, ["x"], ["y"])
    x = np.asarray([[[3.0, 6.0, 9.0, 12.0]]], np.float32)
    y = np.asarray(onnx_exec.OnnxRunner(g)({"x": x})[0])
    np.testing.assert_allclose(y[0, 0], [4.5, 6.0, 9.0, 10.5], rtol=1e-6)
    # count_include_pad=1 keeps the full-kernel divisor
    nodes2 = [OnnxNode("AveragePool", ["x"], ["y"],
                       attrs={"kernel_shape": [3], "pads": [1, 1],
                              "strides": [1], "count_include_pad": 1})]
    g2 = _graph({}, nodes2, ["x"], ["y"])
    y2 = np.asarray(onnx_exec.OnnxRunner(g2)({"x": x})[0])
    np.testing.assert_allclose(y2[0, 0], [3.0, 6.0, 9.0, 7.0], rtol=1e-6)
    # unsupported pool modes fail loudly, not silently wrong
    for bad_attrs in ({"kernel_shape": [3], "ceil_mode": 1},
                      {"kernel_shape": [3], "auto_pad": "SAME_UPPER"}):
        gb = _graph({}, [OnnxNode("AveragePool", ["x"], ["y"],
                                  attrs=bad_attrs)], ["x"], ["y"])
        with pytest.raises(ValueError):
            onnx_exec.run(gb, {"x": x})


def test_campplus_short_prompt_rejected():
    from autostyle_tts_tpu.models.compat.campplus import (
        FRAME_LEN, CampPlusCompat,
    )
    from autostyle_tts_tpu.utils.synth_release import (
        SynthGeometry, build_campplus_onnx,
    )

    comp = CampPlusCompat(build_campplus_onnx(SynthGeometry()))
    with pytest.raises(ValueError, match="too short"):
        comp.embed_wav16(np.zeros(FRAME_LEN - 1, np.float32))


def test_exec_vq_argmin_and_pad():
    """The ops a real S3-tokenizer VQ export needs: nearest-codebook lookup
    as Sub/Mul/ReduceSum/ArgMin, plus constant Pad — pinned vs numpy."""
    rng = np.random.default_rng(5)
    cb = rng.standard_normal((7, 4)).astype(np.float32)      # [K, D]
    nodes = [
        # pairwise sq-dists: x [B,T,1,D] - cb [K,D] -> [B,T,K,D]
        OnnxNode("Unsqueeze", ["x", "two"], ["xu"]),
        OnnxNode("Sub", ["xu", "cb"], ["dlt"]),
        OnnxNode("Mul", ["dlt", "dlt"], ["sq"]),
        OnnxNode("ReduceSum", ["sq"], ["d2"],
                 attrs={"axes": [-1], "keepdims": 0}),
        OnnxNode("ArgMin", ["d2"], ["code"],
                 attrs={"axis": -1, "keepdims": 0}),
        OnnxNode("Pad", ["code", "padspec"], ["y"],
                 attrs={"mode": "constant"}),
    ]
    tensors = {
        "cb": cb,
        "two": np.asarray([2], np.int64),
        "padspec": np.asarray([0, 1, 0, 2], np.int64),   # pad T by (1, 2)
    }
    g = _graph(tensors, nodes, ["x"], ["y"])
    assert onnx_exec.unsupported_ops(g) == []
    x = rng.standard_normal((1, 5, 4)).astype(np.float32)
    y = np.asarray(onnx_exec.OnnxRunner(g)({"x": x})[0])
    d2 = ((x[:, :, None, :] - cb[None, None]) ** 2).sum(-1)
    ref = np.pad(d2.argmin(-1), ((0, 0), (1, 2)))
    np.testing.assert_array_equal(y, ref)


def test_exec_comparisons_and_where():
    nodes = [
        OnnxNode("Greater", ["x", "thr"], ["m"]),
        OnnxNode("Where", ["m", "x", "zero"], ["y"]),
    ]
    tensors = {"thr": np.asarray(0.5, np.float32),
               "zero": np.asarray(0.0, np.float32)}
    g = _graph(tensors, nodes, ["x"], ["y"])
    x = np.asarray([[0.2, 0.7, 1.4, -3.0]], np.float32)
    y = np.asarray(onnx_exec.OnnxRunner(g)({"x": x})[0])
    np.testing.assert_allclose(y, [[0.0, 0.7, 1.4, 0.0]])


def test_exec_einsum_trilu_sincos():
    """Transformer-export staples: attention einsum, Trilu causal mask,
    in-graph sinusoid tables."""
    rng = np.random.default_rng(6)
    nodes = [
        OnnxNode("Einsum", ["q", "k"], ["s"],
                 attrs={"equation": "bthd,bshd->bhts"}),
        OnnxNode("Sin", ["s"], ["ss"]),
        OnnxNode("Cos", ["s"], ["cc"]),
        OnnxNode("Mul", ["ss", "cc"], ["m"]),
        OnnxNode("Trilu", ["m"], ["y"], attrs={"upper": 0}),
    ]
    g = _graph({}, nodes, ["q", "k"], ["y"])
    assert onnx_exec.unsupported_ops(g) == []
    q = rng.standard_normal((1, 3, 2, 4)).astype(np.float32)
    k = rng.standard_normal((1, 3, 2, 4)).astype(np.float32)
    y = np.asarray(onnx_exec.OnnxRunner(g)({"q": q, "k": k})[0])
    s = np.einsum("bthd,bshd->bhts", q, k)
    ref = np.tril(np.sin(s) * np.cos(s))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_exec_gather_negative_index_and_prelu_channel_slope():
    """Gather with a negative index must wrap (jnp.take would clamp it to
    0); PRelu's [C] slope broadcasts against the CHANNEL dim of NC*."""
    rng = np.random.default_rng(8)
    slope = np.asarray([0.1, 0.5, 2.0], np.float32)
    nodes = [
        OnnxNode("Shape", ["x"], ["shp"]),
        OnnxNode("Gather", ["shp", "neg1"], ["last_dim"], attrs={"axis": 0}),
        OnnxNode("PRelu", ["x", "slope"], ["p"]),
        OnnxNode("ReduceSum", ["p"], ["s"], attrs={"keepdims": 0}),
    ]
    tensors = {"neg1": np.asarray(-1, np.int64), "slope": slope}
    g = _graph(tensors, nodes, ["x"], ["last_dim", "s"])
    x = rng.standard_normal((1, 3, 5)).astype(np.float32)
    last_dim, s = onnx_exec.OnnxRunner(g)({"x": x})
    assert int(np.asarray(last_dim)) == 5
    ref = np.where(x >= 0, x, slope[None, :, None] * x).sum()
    np.testing.assert_allclose(float(np.asarray(s)), ref, rtol=1e-5)
    # traced-gather negatives too (not just the static fold)
    nodes2 = [OnnxNode("Gather", ["x", "neg1"], ["y"], attrs={"axis": 2})]
    g2 = _graph({"neg1": np.asarray(-1, np.int64)}, nodes2, ["x"], ["y"])
    y = np.asarray(onnx_exec.OnnxRunner(g2)({"x": x})[0])
    np.testing.assert_allclose(y, x[:, :, -1], rtol=1e-6)


def test_s3_tokenizer_graph_vs_rules_cross_validation():
    """Two INDEPENDENT serving paths over the same tokenizer artifact must
    agree: rule-converted native module (models/compat/s3_tokenizer) vs the
    node graph executed by ops/onnx_exec. Same weights (same seed), full
    mask — tokens must match exactly. This is the cross-check that caught
    the native module's stride-2 conv padding mismatch (XLA SAME vs torch
    Conv1d(padding=1))."""
    from autostyle_tts_tpu.models.compat import s3_tokenizer
    from autostyle_tts_tpu.utils import cosyvoice_convert as cc
    from autostyle_tts_tpu.utils.synth_release import (
        SynthGeometry, build_tokenizer_graph_onnx, build_tokenizer_onnx,
    )

    geo = SynthGeometry()
    # rules path
    sd = build_tokenizer_onnx(geo, seed=3)
    tree, report = cc.apply_rules(
        sd, cc.RULESETS["speech_tokenizer_v1.onnx"]
    )
    assert report.unmapped_src == []
    tj = jax.tree.map(jnp.asarray, tree)
    cfg = s3_tokenizer.infer_config(tj, n_heads=2)
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((1, 12, geo.n_mels)).astype(np.float32)
    mask = jnp.ones((1, 12), jnp.float32)
    toks_native, _ = s3_tokenizer.encode(tj, cfg, jnp.asarray(mel), mask)

    # graph path (same seed = identical weights)
    g = load_onnx_graph(build_tokenizer_graph_onnx(geo, seed=3))
    assert onnx_exec.unsupported_ops(g) == []
    toks_graph, hidden = onnx_exec.OnnxRunner(g)({"mel": mel})
    assert np.isfinite(np.asarray(hidden)).all()
    np.testing.assert_array_equal(
        np.asarray(toks_native)[0], np.asarray(toks_graph)[0]
    )


def test_unsupported_ops_reports_attr_gated_configs():
    """Attribute-gated blockers (pool ceil_mode, Pad axes) must surface in
    the pre-screen report, not as trace-time errors on first call."""
    nodes = [
        OnnxNode("AveragePool", ["x"], ["p"],
                 attrs={"kernel_shape": [2], "ceil_mode": 1}),
        OnnxNode("Pad", ["p", "pads", "cval", "axes"], ["y"],
                 attrs={"mode": "constant"}),
    ]
    tensors = {"pads": np.asarray([1, 1], np.int64),
               "cval": np.asarray(0.0, np.float32),
               "axes": np.asarray([1], np.int64)}
    g = _graph(tensors, nodes, ["x"], ["y"])
    bad = onnx_exec.unsupported_ops(g)
    assert "AveragePool(ceil_mode=1)" in bad
    assert "Pad(axes input)" in bad


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
