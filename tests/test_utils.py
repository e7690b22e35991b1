"""Config tree, wav I/O, manifest contracts, checkpoint manager, samplers."""

import json

import numpy as np
import pytest

from autostyle_tts_tpu.utils import audio_io, config, manifest
from autostyle_tts_tpu.utils.checkpoint import CheckpointManager


def test_config_roundtrip(tmp_path):
    cfg = config.Config()
    config.save(cfg, tmp_path / "cfg.json")
    loaded = config.load(tmp_path / "cfg.json")
    assert config.to_dict(loaded) == config.to_dict(cfg)
    assert isinstance(loaded.vocoder.upsample_rates, tuple)


def test_config_overrides():
    cfg = config.Config()
    config.apply_overrides(
        cfg,
        ["train.learning_rate=1e-4", "mesh.data=4", "train.lora.r=16",
         "vocoder.upsample_rates=8,8,4", "train.remat=false"],
    )
    assert cfg.train.learning_rate == 1e-4
    assert cfg.mesh.data == 4
    assert cfg.train.lora.r == 16
    assert cfg.vocoder.upsample_rates == (8, 8, 4)
    assert cfg.train.remat is False


def test_wav_roundtrip(tmp_path):
    sr = 16000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    audio_io.write_wav(tmp_path / "t.wav", x, sr)
    y, sr2 = audio_io.read_wav(tmp_path / "t.wav")
    assert sr2 == sr
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_load_wav_resamples(tmp_path):
    sr = 22050
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    audio_io.write_wav(tmp_path / "t.wav", x, sr)
    y = audio_io.load_wav(tmp_path / "t.wav", 16000)
    assert abs(len(y) - 16000) <= 2


def test_retrieval_jsonl_contract(tmp_path):
    """Round-trip the exact JSONL fields produced by milvus/search_json.py and
    consumed by tts_with_rag.py (SURVEY §1 interfaces)."""
    rows = [
        {"zh_text": "你好", "speaker": "w1", "retrieved_file_id": "/p/denoise_1.wav",
         "retrieved_text": "样式", "distance": 0.87},
        {"zh_text": "hi", "speaker": "m2", "retrieved_file_id": "/p/denoise_2.wav",
         "retrieved_text": "style", "distance": 0.84, "whisper": True},
    ]
    p = tmp_path / "res.jsonl"
    manifest.write_jsonl(p, iter(rows))
    reader = manifest.JsonDataReader(p)
    assert len(reader) == 2
    assert reader[0].speaker == "w1" and not reader[0].whisper
    assert reader[1].whisper
    with pytest.raises(IndexError):
        reader[2]  # reference had an off-by-one here (tts_with_rag.py:39)
    back = [r.to_dict() for r in reader]
    assert back[0]["distance"] == 0.87
    assert "whisper" not in back[0] and back[1]["whisper"] is True


def test_reference_search_results_parse():
    """Parse the actual artifact shipped with the reference repo."""
    import pathlib

    p = pathlib.Path("/root/reference/output_emb/search_results.json")
    if not p.exists():
        pytest.skip("reference artifact not present")
    reader = manifest.JsonDataReader(p)
    assert len(reader) > 0
    speakers = {r.speaker for r in reader}
    assert speakers <= {"w1", "w2", "m1", "m2"}
    assert all(0.5 < r.distance < 1.0 for r in reader)


def test_meta_lst_format(tmp_path):
    rows = [manifest.meta_lst_row("n1", "st", "/t.wav", "hello")]
    manifest.write_meta_lst(tmp_path / "meta.lst", rows)
    text = (tmp_path / "meta.lst").read_text()
    assert text == "n1|st|/t.wav|hello\n"


def test_checkpoint_manager(tmp_path):
    import jax.numpy as jnp

    tree = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "b": jnp.ones(3)}
    mgr = CheckpointManager(tmp_path, save_total_limit=2)
    for step in (50, 100, 150):
        tree = {"w": tree["w"] + 1, "b": tree["b"]}
        mgr.save(step, tree)
    assert mgr.latest_step() == 150
    restored = mgr.restore(tree)
    np.testing.assert_allclose(np.asarray(restored["w"]), np.asarray(tree["w"]))
    # limit enforced
    names = sorted(p.name for p in tmp_path.glob("checkpoint-*"))
    assert names == ["checkpoint-100", "checkpoint-150"]


def test_samplers():
    import jax
    import jax.numpy as jnp

    from autostyle_tts_tpu.ops.sampling import SamplerConfig, sample

    logits = jnp.asarray([[0.0, 5.0, -1.0, 2.0]])
    assert int(sample(jax.random.PRNGKey(0), logits, SamplerConfig.label())[0]) == 1
    # top_p=0.9 with one dominant logit -> always picks it
    peaked = jnp.asarray([[0.0, 20.0, 0.0, 0.0]])
    for s in range(5):
        tok = sample(jax.random.PRNGKey(s), peaked, SamplerConfig.biography())
        assert int(tok[0]) == 1
    # top_k=2 restricts support to the top 2 logits
    cfg = SamplerConfig(temperature=1.0, top_k=2)
    seen = {
        int(sample(jax.random.PRNGKey(s), logits, cfg)[0]) for s in range(50)
    }
    assert seen <= {1, 3}
    # top_p very small -> argmax
    cfg = SamplerConfig(temperature=1.0, top_p=1e-6)
    assert int(sample(jax.random.PRNGKey(7), logits, cfg)[0]) == 1


def test_top_p_cap_matches_full_sort():
    """The top_p candidate cap is exact when the nucleus fits in the cap:
    the masked logits must be IDENTICAL to the full-vocab-sort path on a
    peaked (trained-model-like) distribution over a big vocab."""
    import jax.numpy as jnp
    import numpy as np

    from autostyle_tts_tpu.ops.sampling import _apply_top_p

    rng = np.random.default_rng(0)
    V = 4096
    raw = rng.standard_normal((2, V)) * 6.0      # peaked: nucleus << 64
    logits = jnp.asarray(raw, jnp.float32)
    exact = _apply_top_p(logits, 0.9, cap=0)
    capped = _apply_top_p(logits, 0.9, cap=64)
    np.testing.assert_allclose(np.asarray(capped), np.asarray(exact))
    # near-flat distribution (fat tail, r4 VERDICT #9 — the 128k-vocab
    # embedder at T=0.7/p=0.9 early in training): the nucleus overflows the
    # cap, so the lax.cond fallback must reproduce the EXACT full-vocab law
    # instead of silently truncating support to `cap` candidates
    ramp = jnp.asarray(np.arange(V, dtype=np.float32)[None] * 1e-4)
    out = np.asarray(_apply_top_p(ramp, 0.999, cap=64))
    ref = np.asarray(_apply_top_p(ramp, 0.999, cap=0))
    np.testing.assert_allclose(out, ref)
    assert (out[0] > -1e29).sum() > 64   # support wider than the cap


def test_top_p_cap_fallback_inside_jit():
    """The exact fallback is a lax.cond: it must trace inside jit and pick
    the branch at runtime per batch content."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autostyle_tts_tpu.ops.sampling import _apply_top_p

    f = jax.jit(lambda lg: _apply_top_p(lg, 0.9, cap=32))
    rng = np.random.default_rng(1)
    peaked = jnp.asarray(rng.standard_normal((2, 1024)) * 8.0, jnp.float32)
    flat = jnp.asarray(rng.standard_normal((2, 1024)) * 0.01, jnp.float32)
    for lg in (peaked, flat):
        got = np.asarray(f(lg))
        ref = np.asarray(_apply_top_p(lg, 0.9, cap=0))
        np.testing.assert_allclose(got, ref)


def test_tb_event_writer_roundtrip(tmp_path):
    """Real tensorboard events file: TFRecord framing + Event/Summary protos
    parse back (CRCs validated), crc32c matches the known test vector."""
    from autostyle_tts_tpu.utils.tb_events import (
        EventWriter, crc32c, read_scalars,
    )

    assert crc32c(b"123456789") == 0xE3069283
    w = EventWriter(tmp_path)
    w.scalar("train/loss", 0.75, 10)
    w.scalars({"eval/f1": 0.5, "eval/acc": 0.25}, 20)
    w.close()
    rows = read_scalars(w.path)
    assert (10, "train/loss") == rows[0][:2] and abs(rows[0][2] - 0.75) < 1e-6
    assert {(r[0], r[1]) for r in rows[1:]} == {
        (20, "eval/f1"), (20, "eval/acc")
    }


def test_checkpoint_manager_orbax_backend(tmp_path):
    import numpy as np

    from autostyle_tts_tpu.utils.checkpoint import CheckpointManager

    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "nested": {"b": np.ones((4,), np.int32)}}
    mgr = CheckpointManager(tmp_path, save_total_limit=1, backend="orbax")
    mgr.save(5, tree)
    assert mgr.latest_step() == 5
    like = {"a": np.zeros((2, 3), np.float32),
            "nested": {"b": np.zeros((4,), np.int32)}}
    got = mgr.restore(like)
    np.testing.assert_array_equal(np.asarray(got["a"]), tree["a"])
    np.testing.assert_array_equal(np.asarray(got["nested"]["b"]),
                                  tree["nested"]["b"])
    # npz-backend manager reads the same directory transparently
    mgr2 = CheckpointManager(tmp_path)
    got2 = mgr2.restore(like)
    np.testing.assert_array_equal(np.asarray(got2["a"]), tree["a"])


def test_pack_unpack_len_roundtrip_exact():
    """The single-fetch length packing (pipeline/engine._pack_len) must carry
    per-row sample counts EXACTLY through the fetch dtype — f32 stores the
    int in one slot (exact < 2^24), f16 splits into two 11-bit halves (each
    half <= 2047, exact in f16) covering n < 2^22."""
    import jax.numpy as jnp
    from autostyle_tts_tpu.pipeline.engine import _pack_len, _unpack_len

    # edge counts: zero, f16-half boundaries, and a large value near 2^22
    ns = np.array([0, 1, 2047, 2048, 2049, 4095, 4096, (1 << 22) - 1], np.int32)
    wav = np.linspace(-1, 1, ns.size * 8, dtype=np.float32).reshape(ns.size, 8)
    for dt in ("float16", "float32"):
        packed = np.asarray(_pack_len(jnp.asarray(wav), jnp.asarray(ns), dt))
        got_wav, got_n = _unpack_len(packed)
        assert packed.dtype == np.dtype(dt)
        np.testing.assert_array_equal(got_n, ns)
        assert got_wav.shape == wav.shape
        np.testing.assert_allclose(got_wav, wav, atol=1e-3 if dt == "float16" else 0)


def test_pack_unpack_multi_value_rows():
    """Stream programs pack (n_chunk, gen_len) per row — K=2 roundtrip."""
    import jax.numpy as jnp
    from autostyle_tts_tpu.pipeline.engine import _pack_len, _unpack_vals

    vals = np.array([[0, 2047], [2048, 4095], [7, (1 << 22) - 1]], np.int32)
    wav = np.linspace(-1, 1, vals.shape[0] * 4, dtype=np.float32).reshape(-1, 4)
    for dt in ("float16", "float32"):
        packed = np.asarray(_pack_len(jnp.asarray(wav), jnp.asarray(vals), dt))
        got_wav, got = _unpack_vals(packed, 2)
        np.testing.assert_array_equal(got, vals)
        assert got_wav.shape == wav.shape


def test_pack_len_rejects_bfloat16():
    """bf16's 8-bit mantissa rounds the 11-bit halves (2047 -> 2048), which
    would silently mis-crop every request — _pack_len must reject it."""
    import jax.numpy as jnp
    import pytest
    from autostyle_tts_tpu.pipeline.engine import _pack_len

    wav = jnp.zeros((2, 4), jnp.float32)
    ns = jnp.asarray([2047, 1], jnp.int32)
    with pytest.raises(ValueError, match="fetch_dtype"):
        _pack_len(wav, ns, "bfloat16")
