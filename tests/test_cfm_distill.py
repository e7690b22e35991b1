"""CFM progressive distillation (train/cfm_distill.py).

Verifies the machinery at tiny geometry with a synthetic teacher/corpus:
the distilled few-step guidance-free student must reproduce the teacher's
full sampler (many steps + CFG) much better than the teacher itself run at
the student's budget — i.e. distillation actually transfers the trajectory,
not just runs. Quality-on-real-fixture lives in test_trained_demo.py."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autostyle_tts_tpu.models import cfm as cfm_lib
from autostyle_tts_tpu.train import cfm_distill
from autostyle_tts_tpu.utils.config import CFMConfig

CFG = CFMConfig(
    n_mels=16, dim=64, n_layers=2, n_heads=4, ffn_dim=128,
    token_vocab_size=33, spk_dim=8, n_steps=8, cfg_scale=0.7,
    dtype="float32",
)
B, T_TOK = 4, 16
F = T_TOK * CFG.upsample


def _teacher(key):
    """Random but NON-degenerate field: init_params zero-inits out_proj (the
    v-field starts at 0), which would make any student trivially exact."""
    p = cfm_lib.init_params(key, CFG)
    p["out_proj"] = jax.random.normal(key, p["out_proj"].shape) * 0.15
    return p


def _batch(key):
    k1, k2, k3 = jax.random.split(key, 3)
    tok = jax.random.randint(k1, (B, T_TOK), 0, CFG.token_vocab_size)
    # smooth mel-like target in roughly log-mel range
    base = jax.random.normal(k2, (B, F // 4, CFG.n_mels))
    mel = jnp.repeat(base, 4, axis=1) * 0.5 - 1.0
    spk = jax.random.normal(k3, (B, CFG.spk_dim)) * 0.3
    pmask = (jnp.arange(F)[None, :] < F // 4).astype(jnp.float32)
    pmask = jnp.broadcast_to(pmask, (B, F))
    fmask = jnp.ones((B, F), jnp.float32)
    return {
        "tokens": tok, "mel": mel, "spk": spk,
        "prompt_mask": pmask, "frame_mask": fmask,
    }


def _batches(n, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return [{"cfm": _batch(k)} for k in keys]


def test_guided_field_matches_manual_cfg():
    p = _teacher(jax.random.PRNGKey(0))
    b = _batch(jax.random.PRNGKey(1))
    cond = cfm_lib.upsample_tokens(p, b["tokens"], CFG.upsample)
    pmel = b["mel"] * b["prompt_mask"][..., None]
    x = jax.random.normal(jax.random.PRNGKey(2), b["mel"].shape)
    t = jnp.full((B,), 0.4)
    args = (x, t, cond, b["spk"], pmel, b["prompt_mask"], b["frame_mask"])

    plain = cfm_distill.guided_field(p, CFG, 0.0, *args)
    direct = cfm_lib.vector_field(p, CFG, *args)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(direct),
                               rtol=0, atol=1e-6)

    w = 0.7
    guided = cfm_distill.guided_field(p, CFG, w, *args)
    v_c = cfm_lib.vector_field(p, CFG, x, t, cond, b["spk"], pmel,
                               b["prompt_mask"], b["frame_mask"])
    v_u = cfm_lib.vector_field(p, CFG, x, t, jnp.zeros_like(cond), b["spk"],
                               pmel, b["prompt_mask"], b["frame_mask"])
    np.testing.assert_allclose(
        np.asarray(guided), np.asarray((1 + w) * v_c - w * v_u),
        rtol=0, atol=1e-5,
    )


@pytest.fixture(scope="module")
def distilled():
    teacher = _teacher(jax.random.PRNGKey(0))
    train = _batches(6, seed=10)
    student, history = cfm_distill.distill(
        teacher, CFG, lambda phase: iter(train),
        schedule=(4, 2), steps_per_phase=80, learning_rate=2e-3,
        seed=3, log_every=1000, log=lambda *_: None,
    )
    return teacher, student, history


def test_distill_converges_and_history(distilled):
    _, _, history = distilled
    assert [h["n_steps"] for h in history] == [4, 2]
    assert history[0]["teacher_cfg_scale"] == pytest.approx(CFG.cfg_scale)
    assert history[1]["teacher_cfg_scale"] == 0.0
    assert all(np.isfinite(h["final_loss"]) for h in history)


def test_student_tracks_full_teacher_sampler(distilled):
    """THE distillation claim: student @2 steps, no CFG, reproduces the
    teacher's full sampler (8 steps + CFG) far better than the teacher
    itself evaluated at the student's budget."""
    teacher, student, _ = distilled
    scfg = dataclasses.replace(CFG, n_steps=2, use_cfg=False)
    key = jax.random.PRNGKey(77)
    ev = _batches(3, seed=20)

    m_student = cfm_distill.eval_mel_l1(
        student, scfg, iter(ev), key, use_cfg=False,
        ref_params=teacher, ref_cfg=CFG, ref_use_cfg=True,
    )
    m_teacher_fast = cfm_distill.eval_mel_l1(
        teacher, scfg, iter(ev), key, use_cfg=False,
        ref_params=teacher, ref_cfg=CFG, ref_use_cfg=True,
    )
    assert np.isfinite(m_student["mel_l1_vs_ref"])
    # distillation must close most of the gap to the full sampler
    assert m_student["mel_l1_vs_ref"] < 0.6 * m_teacher_fast["mel_l1_vs_ref"], (
        m_student, m_teacher_fast,
    )


def test_engine_respects_use_cfg_config():
    """cfm.use_cfg=False must change the sampler's output (single conditional
    call per step) while keeping shapes/finiteness — the serving knob the
    distilled snapshot relies on."""
    p = _teacher(jax.random.PRNGKey(5))
    b = _batch(jax.random.PRNGKey(6))
    cond = cfm_lib.upsample_tokens(p, b["tokens"], CFG.upsample)
    pmel = b["mel"] * b["prompt_mask"][..., None]
    key = jax.random.PRNGKey(7)
    on = cfm_lib.sample_mel(p, CFG, key, cond, b["spk"], pmel,
                            b["prompt_mask"], b["frame_mask"], use_cfg=True)
    off = cfm_lib.sample_mel(p, CFG, key, cond, b["spk"], pmel,
                             b["prompt_mask"], b["frame_mask"], use_cfg=False)
    assert on.shape == off.shape == (B, F, CFG.n_mels)
    assert np.isfinite(np.asarray(on)).all() and np.isfinite(np.asarray(off)).all()
    assert float(jnp.abs(on - off).max()) > 1e-4


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
