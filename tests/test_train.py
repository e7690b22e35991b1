"""Training subsystem: reformatter contracts vs the reference dataset,
chat template/loss masking, one SFT step reduces loss, weighted-F1 math,
generation-based eval, and the multichip dry run."""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autostyle_tts_tpu.models import frontend
from autostyle_tts_tpu.models import transformer as core
from autostyle_tts_tpu.train import lora_sft, reformat
from autostyle_tts_tpu.utils.config import TrainConfig, TransformerConfig


def _cfg():
    return TransformerConfig(
        vocab_size=frontend.VOCAB_SIZE, dim=48, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=96, max_seq_len=128, dtype="float32",
    )


# ----------------------------------------------------------------------- reformat


def _fake_conv():
    return {
        "labels": [0, 2, 5],
        "sentences": ["I love this!", "Okay.", "This is hopeless."],
        "genders": ["F", "M", "F"],
    }


def test_reformat_en_messages():
    rows = reformat.conversation_to_messages("Ses01_x", _fake_conv(), window=1)
    assert len(rows) == 3
    m = rows[0]["messages"]
    assert [x["role"] for x in m] == ["system", "user", "assistant"]
    assert m[2]["content"] == "happy"
    assert "MARY" in m[1]["content"]           # Ses01 F -> Mary, uppercased
    assert "conversation as a context" in m[0]["content"]
    assert rows[2]["messages"][2]["content"] == "frustrated"


def test_reformat_zh_labels_and_speakers():
    conv = dict(_fake_conv(), labels=[0, 1, 6])
    rows = reformat.conversation_to_messages(
        "Ses02_y", conv, window=5, language="zh"
    )
    assert rows[0]["messages"][2]["content"] == "快乐"
    assert rows[2]["messages"][2]["content"] == "惊讶"
    assert "李丽" in rows[0]["messages"][1]["content"]
    # explicit speakers override the gender map (ZH contract)
    conv["speakers"] = ["甲", "乙", "甲"]
    rows = reformat.conversation_to_messages("Ses02_y", conv, language="zh")
    assert "甲" in rows[0]["messages"][1]["content"]


def test_reformat_window_bounds():
    conv = _fake_conv()
    rows = reformat.conversation_to_messages("Ses01_x", conv, window=0)
    ctx = rows[1]["messages"][0]["content"].split("context")[-1]
    assert "Okay." in ctx and "I love this!" not in ctx


def test_reformat_spdescv2_bios():
    rows = reformat.conversation_to_messages(
        "Ses01_x", _fake_conv(), mode="spdescV2",
        bios=["<s>a bio\nwith lines</s>junk", "b", "c"],
    )
    sys0 = rows[0]["messages"][0]["content"]
    assert "a bio with lines" in sys0 and "junk" not in sys0


def test_reformat_real_reference_dataset(tmp_path):
    src = pathlib.Path("/root/reference/data/iemocap.valid.json")
    if not src.exists():
        pytest.skip("reference dataset not present")
    out = tmp_path / "valid.jsonl"
    n = reformat.process_dataset(str(src), str(out), window=5, mode="default")
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert n == len(rows) > 100
    labels = {r["messages"][2]["content"] for r in rows}
    assert labels <= set(reformat.label_set("en"))


# ----------------------------------------------------------------------- chat template


def test_render_chat_masks_only_assistant():
    msgs = [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "u"},
        {"role": "assistant", "content": "happy"},
    ]
    ids, mask = lora_sft.render_chat(msgs)
    assert ids[0] == frontend.BOS_ID
    assert mask.sum() == len("happy") + 1  # label bytes + END
    # masked ids decode back to the label
    span = [i for i, m in zip(ids, mask) if m]
    assert lora_sft.decode_assistant(span) == "happy"


def test_generation_prompt_suffix():
    ids, _ = lora_sft.render_chat(
        [{"role": "user", "content": "q"}], add_generation_prompt=True
    )
    assert ids[-1] == lora_sft.ASSIST


# ----------------------------------------------------------------------- training


def _samples(n=8):
    out = []
    for i in range(n):
        out.append(
            {
                "messages": [
                    {"role": "system", "content": "classify"},
                    {"role": "user", "content": f"utterance {i}"},
                    {"role": "assistant", "content": "happy" if i % 2 else "sad"},
                ]
            }
        )
    return out


def test_sft_step_reduces_loss():
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=4, grad_accum=1, max_seq_len=48,
                       learning_rate=5e-3, neftune_alpha=0.0, remat=False)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    lora = core.init_lora(jax.random.PRNGKey(1), cfg, tcfg.lora.r)
    opt = lora_sft.make_optimizer(tcfg, 100)
    opt_state = opt.init(lora)
    step = lora_sft.make_train_step(cfg, tcfg, opt, packed=False)
    batch = next(lora_sft.make_batches(_samples(), 48, 4, shuffle=False))
    args = (jnp.asarray(batch.tokens), jnp.asarray(batch.loss_mask),
            jnp.asarray(batch.length))
    losses = []
    for i in range(8):
        lora, opt_state, loss = step(
            lora, opt_state, params, *args, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_base_params_frozen():
    """Gradients flow only into LoRA leaves; base params never change."""
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=2, grad_accum=1, max_seq_len=32, remat=False)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params)
    lora = core.init_lora(jax.random.PRNGKey(1), cfg, 4)
    opt = lora_sft.make_optimizer(tcfg, 10)
    step = lora_sft.make_train_step(cfg, tcfg, opt, packed=False)
    batch = next(lora_sft.make_batches(_samples(4), 32, 2, shuffle=False))
    step(lora, opt.init(lora), params, jnp.asarray(batch.tokens),
         jnp.asarray(batch.loss_mask), jnp.asarray(batch.length),
         jax.random.PRNGKey(0))
    after = jax.tree_util.tree_map(np.asarray, params)
    for b, a in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(b, a)


def test_weighted_f1():
    labels = ["happy", "sad", "neutral"]
    # perfect
    assert lora_sft.weighted_f1(["happy", "sad"], ["happy", "sad"], labels) == 1.0
    # all wrong
    assert lora_sft.weighted_f1(["happy", "sad"], ["sad", "happy"], labels) == 0.0
    # half right, balanced
    f1 = lora_sft.weighted_f1(
        ["happy", "happy", "sad", "sad"], ["happy", "sad", "sad", "happy"], labels
    )
    assert 0.4 < f1 < 0.6


def test_match_label():
    labels = reformat.label_set("en")
    assert lora_sft.match_label("happy", labels) == "happy"
    assert lora_sft.match_label("  Frustrated!", labels) == "frustrated"
    assert lora_sft.match_label("the label is sad", labels) == "sad"
    assert lora_sft.match_label("nonsense", labels) == ""


def test_evaluate_generation_runs():
    cfg = _cfg()
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    samples = _samples(4)
    f1, preds = lora_sft.evaluate_generation(
        params, cfg, samples, reformat.label_set("en"),
        batch_size=4, max_prompt=48, max_new=6,
    )
    assert 0.0 <= f1 <= 1.0 and len(preds) == 4


def test_train_driver_smoke(tmp_path):
    """Driver default path — PACKED (TRL packing=True, ft_llm.py:302).
    seq 96 fits ~3 of these short samples per row, so the FFD pre-pass
    keeps packing ON (reduction >= 1.1x)."""
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=2, grad_accum=2, epochs=1, max_seq_len=96,
                       eval_every=1000, save_every=2, remat=False)
    assert tcfg.packing  # packing is the production default
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    res = lora_sft.train(
        params, cfg, tcfg, _samples(8), out_dir=str(tmp_path / "ft")
    )
    assert res["packing"]  # pre-pass kept the packed path
    assert res["steps"] >= 1
    assert (tmp_path / "ft" / "history.json").exists()
    ckpts = list((tmp_path / "ft").glob("checkpoint-*"))
    assert len(ckpts) == 1  # save_total_limit


def test_train_packing_auto_disables_on_incompressible_corpus(tmp_path, capsys):
    """VERDICT r4 #7: when even the FFD optimum compresses <1.1x (samples
    nearly fill max_seq_len), train() falls back to the unpacked path and
    logs the measured reduction."""
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=2, grad_accum=1, epochs=1, max_seq_len=48,
                       eval_every=1000, save_every=1000, remat=False)
    assert tcfg.packing
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    res = lora_sft.train(
        params, cfg, tcfg, _samples(6), out_dir=str(tmp_path / "ft")
    )
    assert not res["packing"]  # ~31-token samples, only 1 fits per 48-row
    assert "packing auto-disabled" in capsys.readouterr().out
    assert res["steps"] >= 2   # unpacked path trained normally


def test_ffd_beats_greedy_on_bimodal_lengths():
    """FFD pairs long prompts with short ones; arrival-order greedy packing
    strands the shorts. 8 long (~2/3 cap) + 8 short (~1/3 cap) rows pack
    into 8 FFD rows (one long + one short each)."""
    lens = [64] * 8 + [30] * 8
    rows = lora_sft.ffd_pack(lens, 96)
    assert len(rows) == 8
    assert sorted(i for r in rows for i in r) == list(range(16))
    for r in rows:
        assert sum(lens[i] for i in r) <= 96


def test_train_driver_unpacked(tmp_path):
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=2, grad_accum=2, epochs=1, max_seq_len=48,
                       eval_every=1000, save_every=2, remat=False,
                       packing=False)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    res = lora_sft.train(
        params, cfg, tcfg, _samples(8), out_dir=str(tmp_path / "ft")
    )
    assert res["steps"] >= 2


def test_packing_cuts_steps():
    """Packing compresses short ERC prompts severalfold: the packed epoch
    has strictly fewer micro-batches than the unpacked one at the same
    (batch_size, max_seq_len) — the reason TRL defaults packing on."""
    samples = _samples(16)
    unpacked = list(lora_sft.make_batches(samples, 128, 2, shuffle=False))
    packed = list(lora_sft.make_packed_batches(samples, 128, 2, shuffle=False))
    assert len(packed) < len(unpacked)
    # static shapes on the train path: pad_to_batch fills the ragged tail
    padded = list(lora_sft.make_packed_batches(
        samples, 128, 2, shuffle=False, pad_to_batch=True
    ))
    assert all(b.tokens.shape == (2, 128) for b in padded)
    # pad rows are segment-0 everywhere -> zero loss weight
    assert (padded[-1].loss_mask[padded[-1].segment_ids == 0] == 0).all()


# ----------------------------------------------------------------------- multichip


def test_dryrun_multichip_8dev():
    lora_sft.dryrun_train_step(8)


# ----------------------------------------------------------------------- packing


def test_packed_loss_matches_unpacked():
    """Packing two samples into one row with block-diagonal attention and
    per-segment positions must give the same total NLL as two separate rows."""
    import jax.numpy as jnp

    cfg = _cfg()
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    lora = core.init_lora(jax.random.PRNGKey(1), cfg, 4)
    samples = _samples(2)
    # unpacked reference: per-sample losses weighted by token counts
    ref_num, ref_den = 0.0, 0.0
    for s in samples:
        ids, lm = lora_sft.render_chat(s["messages"])
        toks = jnp.asarray([ids])
        mask = jnp.asarray([lm])
        length = jnp.asarray([len(ids)])
        loss = lora_sft.sft_loss(
            lora, params, cfg, toks, mask, length, jax.random.PRNGKey(0),
            lora_scale=2.0, neftune_alpha=0.0, remat=False,
        )
        n = int((np.asarray(lm)[1:] > 0).sum())
        ref_num += float(loss) * n
        ref_den += n
    ref = ref_num / ref_den

    batch = next(lora_sft.make_packed_batches(samples, 96, 1, shuffle=False))
    assert (batch.segment_ids.max()) == 2  # both samples in one row
    got = lora_sft.packed_sft_loss(
        lora, params, cfg,
        jnp.asarray(batch.tokens), jnp.asarray(batch.loss_mask),
        jnp.asarray(batch.segment_ids), jax.random.PRNGKey(0),
        lora_scale=2.0, neftune_alpha=0.0, remat=False,
    )
    np.testing.assert_allclose(float(got), ref, rtol=2e-4)


def test_packed_batches_shapes():
    samples = _samples(8)
    batches = list(lora_sft.make_packed_batches(samples, 64, 2, shuffle=False))
    total_segments = sum(
        len(np.unique(b.segment_ids[i])) - (1 if (b.segment_ids[i] == 0).any() else 0)
        for b in batches for i in range(b.tokens.shape[0])
    )
    assert total_segments == 8  # every sample packed exactly once
    for b in batches:
        assert b.tokens.shape[1] == 64
        # loss mask only on non-pad segments
        assert ((b.loss_mask > 0) <= (b.segment_ids > 0)).all()


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow


def test_decode_assistant_large_vocab_ids():
    """A 128k-vocab model (the real 3B embedder) can emit any id; ids beyond
    the byte plane must be skipped, not crash bytes() (found by the first
    on-chip 3B eval, r5)."""
    from autostyle_tts_tpu.models import frontend

    B = frontend.BYTE_OFFSET
    assert lora_sft.decode_assistant([B + 104, B + 105, 13]) == "hi"
    assert lora_sft.decode_assistant([90000, B + 111, B + 107, 120000]) == "ok"
    assert lora_sft.decode_assistant([99999, 123456]) == ""
