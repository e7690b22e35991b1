"""Progressive distillation of the CFM mel decoder: fewer steps, no CFG.

The trained OT-CFM field (models/cfm.py) serves mel with an N-step Euler
solve under classifier-free guidance — 2N estimator evaluations per
utterance (the CFG pair is batch-folded into 2B). This module distills that
sampler into a student with the SAME architecture that needs only a few
steps and NO unconditional branch:

  phase 1: teacher = trained field under CFG      -> student at n_1 steps
  phase k: teacher = previous student, plain call -> student at n_k steps

Within a phase the student learns, at each grid time t of its own schedule,
to jump in ONE Euler step of size dt to where the teacher lands after TWO
steps of size dt/2 (progressive distillation, Salimans & Ho 2022, adapted to
the OT-CFM parameterisation: the regression target is the average teacher
field (x''_teacher - x_t)/dt = (v1 + v2)/2, masked exactly like cfm_loss).
Phase 1 queries the teacher THROUGH its guidance combination, so the
student's plain conditional field absorbs the CFG — later phases and serving
run one conditional call per step (`CFMConfig.use_cfg = False`).

x_t is drawn from the OT interpolant marginal the CFM was trained on
(x_t = (1-(1-sigma_min) t) x0 + t x1, x0 ~ N(0,I), x1 = data mel), so the
student trains on the state distribution real solves visit without
simulating full teacher trajectories per example.

Reference capability anchor: the reference serves mel through Matcha-TTS's
multi-step flow ODE (third_party import, /root/reference/tts_with_rag.py:18).
Distillation is the TPU-first latency lever on that stage: 10-step CFG ->
2-step plain is 10x fewer estimator evaluations per utterance.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterator, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import cfm as cfm_lib
from ..utils.config import CFMConfig

Params = Dict


def guided_field(
    params: Params,
    cfg: CFMConfig,
    cfg_scale: float,
    x: jnp.ndarray,
    t: jnp.ndarray,
    token_cond: jnp.ndarray,
    spk: jnp.ndarray,
    prompt_mel: jnp.ndarray,
    prompt_mask: jnp.ndarray,
    frame_mask: jnp.ndarray,
) -> jnp.ndarray:
    """The sampler's effective vector field. `cfg_scale` is STATIC: 0.0 is
    one conditional call; otherwise the cond/uncond pair is folded into one
    2B-batched call exactly like cfm.sample_mel's CFG branch."""
    if cfg_scale == 0.0:
        return cfm_lib.vector_field(
            params, cfg, x, t, token_cond, spk, prompt_mel, prompt_mask,
            frame_mask,
        )
    two = lambda a: jnp.concatenate([a, a], axis=0)
    tc2 = jnp.concatenate([token_cond, jnp.zeros_like(token_cond)], axis=0)
    v2 = cfm_lib.vector_field(
        params, cfg, two(x), two(t), tc2, two(spk), two(prompt_mel),
        two(prompt_mask), two(frame_mask),
    )
    B = x.shape[0]
    return (1 + cfg_scale) * v2[:B] - cfg_scale * v2[B:]


def make_distill_step(
    cfg: CFMConfig, optimizer, n_student_steps: int, teacher_cfg_scale: float
):
    """One jitted distillation update. Batch layout = the "cfm" stage batch
    from train.data.make_acoustic_batches (tokens/mel/spk/prompt_mask/
    frame_mask)."""
    dt = 1.0 / n_student_steps

    @partial(jax.jit, donate_argnames=("student", "opt_state"))
    def step(student, teacher, opt_state, batch, key):
        mel = batch["mel"]
        spk = batch["spk"]
        pmask = batch["prompt_mask"]
        fmask = batch["frame_mask"]
        B, _, M = mel.shape
        k0, k1 = jax.random.split(key)

        i = jax.random.randint(k0, (B,), 0, n_student_steps)
        t = i.astype(jnp.float32) * dt
        x0 = jax.random.normal(k1, mel.shape, mel.dtype)
        s = cfg.sigma_min
        x_t = (1 - (1 - s) * t)[:, None, None] * x0 + t[:, None, None] * mel
        prompt_mel = mel * pmask[..., None]

        # two teacher half-steps -> the student's one-step target field
        cond_t = cfm_lib.upsample_tokens(teacher, batch["tokens"], cfg.upsample)
        v1 = guided_field(teacher, cfg, teacher_cfg_scale, x_t, t,
                          cond_t, spk, prompt_mel, pmask, fmask)
        x_half = x_t + (dt / 2) * v1
        v2 = guided_field(teacher, cfg, teacher_cfg_scale, x_half, t + dt / 2,
                          cond_t, spk, prompt_mel, pmask, fmask)
        target = jax.lax.stop_gradient(v1 + v2) / 2.0

        def loss_fn(p):
            cond_s = cfm_lib.upsample_tokens(p, batch["tokens"], cfg.upsample)
            pred = cfm_lib.vector_field(
                p, cfg, x_t, t, cond_s, spk, prompt_mel, pmask, fmask
            )
            w = (fmask * (1 - pmask))[..., None]
            return jnp.sum(w * (pred - target) ** 2) / jnp.maximum(
                jnp.sum(w) * M, 1.0
            )

        loss, grads = jax.value_and_grad(loss_fn)(student)
        updates, opt_state = optimizer.update(grads, opt_state, student)
        return optax.apply_updates(student, updates), opt_state, loss

    return step


def distill(
    teacher_params: Params,
    cfg: CFMConfig,
    batch_iter_fn,                    # (phase_idx) -> Iterator["cfm" batches]
    schedule: Sequence[int] = (4, 2),
    steps_per_phase: int = 400,
    learning_rate: float = 1e-4,
    seed: int = 0,
    log_every: int = 50,
    log=print,
) -> Tuple[Params, List[Dict]]:
    """Run the halving schedule; returns (student_params, history).

    `batch_iter_fn(phase)` must return a fresh iterator of "cfm"-stage
    batches each time it is called; it is re-invoked when a phase exhausts
    it before `steps_per_phase` updates (epoch wrap).

    The returned student serves with `CFMConfig(n_steps=schedule[-1],
    use_cfg=False)`; phase-1 folds the teacher's CFG (cfg.cfg_scale) into
    the student's conditional field.
    """
    teacher = teacher_params
    # a guidance-free teacher (e.g. re-distilling an already-distilled
    # snapshot, cfg.use_cfg=False) must be queried WITHOUT the CFG
    # combination — its unconditional branch was never trained
    scale = float(cfg.cfg_scale) if cfg.use_cfg else 0.0
    history: List[Dict] = []
    key = jax.random.PRNGKey(seed)
    student = teacher
    for phase, n_steps in enumerate(schedule):
        # fresh student buffers: the step donates them, while the (frozen)
        # teacher tree must survive the whole phase
        student = jax.tree_util.tree_map(jnp.copy, teacher)
        opt = optax.adamw(
            optax.cosine_decay_schedule(learning_rate, max(steps_per_phase, 1))
        )
        opt_state = opt.init(student)
        step_fn = make_distill_step(cfg, opt, n_steps, scale)
        it = iter(batch_iter_fn(phase))
        last = float("nan")
        for u in range(steps_per_phase):
            try:
                batch = next(it)["cfm"]
            except StopIteration:
                it = iter(batch_iter_fn(phase))
                batch = next(it)["cfm"]
            key, sub = jax.random.split(key)
            student, opt_state, loss = step_fn(
                student, teacher, opt_state, batch, sub
            )
            if (u + 1) % log_every == 0 or u == steps_per_phase - 1:
                last = float(loss)
                log(f"phase {phase} (n={n_steps}, teacher_cfg={scale:g}) "
                    f"step {u + 1}/{steps_per_phase}: loss={last:.5f}")
        history.append(
            {"phase": phase, "n_steps": n_steps, "teacher_cfg_scale": scale,
             "final_loss": last}
        )
        teacher, scale = student, 0.0  # next phase: plain-field teacher
    return student, history


def eval_mel_l1(
    params: Params,
    cfg: CFMConfig,
    batches: Iterator[Dict],
    key: jax.Array,
    use_cfg: bool,
    ref_params: Params = None,
    ref_cfg: CFMConfig = None,
    ref_use_cfg: bool = True,
) -> Dict[str, float]:
    """Masked mel-L1 of sampled mel vs ground truth on "cfm" batches; when a
    reference sampler is given, also L1 vs ITS output under the SAME noise
    key (sampler-consistency — the distillation target proper)."""
    tot = n = tot_ref = 0.0
    for b in batches:
        b = b["cfm"]
        cond = cfm_lib.upsample_tokens(params, b["tokens"], cfg.upsample)
        pmel = b["mel"] * b["prompt_mask"][..., None]
        key, sub = jax.random.split(key)
        mel = cfm_lib.sample_mel(
            params, cfg, sub, cond, b["spk"], pmel, b["prompt_mask"],
            b["frame_mask"], use_cfg=use_cfg,
        )
        w = (b["frame_mask"] * (1 - b["prompt_mask"]))[..., None]
        tot += float(jnp.sum(w * jnp.abs(mel - b["mel"])))
        n += float(jnp.sum(w) * cfg.n_mels)
        if ref_params is not None:
            cond_r = cfm_lib.upsample_tokens(
                ref_params, b["tokens"], ref_cfg.upsample
            )
            ref = cfm_lib.sample_mel(
                ref_params, ref_cfg, sub, cond_r, b["spk"], pmel,
                b["prompt_mask"], b["frame_mask"], use_cfg=ref_use_cfg,
            )
            tot_ref += float(jnp.sum(w * jnp.abs(mel - ref)))
    out = {"mel_l1": tot / max(n, 1.0)}
    if ref_params is not None:
        out["mel_l1_vs_ref"] = tot_ref / max(n, 1.0)
    return out
