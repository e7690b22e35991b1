"""LoRA SFT of the style-embedder LLM on ERC chat data.

Replaces the reference's HF/TRL training stack (src/ft_llm.py C14/C15:
QLoRA r=32 alpha=128 all-linear :254-261, bs 4 x grad-accum 4, lr 3e-4
linear, 3 epochs, NEFTune alpha=5 :293-307, grad checkpointing, eval/save
every 50 steps, best-by generation-based weighted-F1 :88-157) with a single
jitted train step:

- loss: next-token CE masked to assistant spans (chat template below)
- NEFTune: uniform noise on input embeddings, alpha/sqrt(T*D) scale
- LoRA-only gradients: optax masks never touch base params (frozen)
- remat (jax.checkpoint) inside the layer scan
- dp x tp: batch sharded on the data axis, params/LoRA by the TP rules —
  the SAME code runs 1-chip or a full v5e slice (XLA inserts collectives)
- eval: greedy 10-token generation -> weighted F1 (ft_llm.py protocol)
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import frontend
from ..models import transformer as core
from ..parallel.mesh import make_mesh
from ..parallel.sharding import batch_sharding, param_shardings, replicated
from ..utils.checkpoint import CheckpointManager, save_pytree
from ..utils.config import TrainConfig, TransformerConfig

# liveness beacon for external watchdogs: train() stamps every micro-step.
# The tunneled device can wedge silently mid-RPC (observed: 40 min of
# nothing on an otherwise healthy run) — a driver thread polling this dict
# is the only way to tell "slow step" from "stuck forever".
HEARTBEAT: Dict = {"t": 0.0, "step": 0, "micro": 0}


# ----------------------------------------------------------------------- chat template


SYS, USER, ASSIST, END = 10, 11, 12, 13  # role tokens (frontend reserves 10-15)


def render_chat(
    messages: List[dict], add_generation_prompt: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """messages -> (ids, loss_mask). Template:
    [BOS] SYS <sys bytes> END USER <user bytes> END ASSIST <label bytes> END
    loss_mask = 1 on assistant content + its END (the trained span)."""
    ids: List[int] = [frontend.BOS_ID]
    mask: List[int] = [0]
    role_tok = {"system": SYS, "user": USER, "assistant": ASSIST}
    for m in messages:
        body = [frontend.BYTE_OFFSET + b for b in
                frontend.normalize(m["content"]).encode("utf-8")]
        is_a = m["role"] == "assistant"
        ids += [role_tok[m["role"]]] + body + [END]
        mask += [0] + [1 if is_a else 0] * len(body) + [1 if is_a else 0]
    if add_generation_prompt:
        ids.append(ASSIST)
        mask.append(0)
    return np.asarray(ids, np.int32), np.asarray(mask, np.int32)


def decode_assistant(ids: Sequence[int]) -> str:
    """Extract the first assistant span from generated ids. Ids beyond the
    byte plane (BYTE_OFFSET+255 — a large-vocab model can emit any id; an
    untrained 128k-vocab 3B mostly does) are skipped as unknown tokens
    rather than crashing bytes()."""
    ids = list(int(i) for i in ids)
    out = []
    for i in ids:
        if i == END or i < frontend.BYTE_OFFSET and i != 0:
            if out:
                break
            continue
        if frontend.BYTE_OFFSET <= i < frontend.BYTE_OFFSET + 256:
            out.append(i - frontend.BYTE_OFFSET)
    return bytes(out).decode("utf-8", errors="replace").strip()


@dataclass
class Batch:
    tokens: np.ndarray      # [B, T]
    loss_mask: np.ndarray   # [B, T]
    length: np.ndarray      # [B]


def render_samples(
    samples: List[dict], max_seq_len: int
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Tokenize every chat sample once (tail-truncated to max_seq_len).
    Rendering dominates batch-building cost; train() hoists it out of the
    per-epoch loop and passes the result to the builders below."""
    out = []
    for s in samples:
        ids, lm = render_chat(s["messages"])
        if len(ids) > max_seq_len:
            ids, lm = ids[-max_seq_len:], lm[-max_seq_len:]
        out.append((ids, lm))
    return out


def ffd_pack(lengths: List[int], max_seq_len: int) -> List[List[int]]:
    """First-fit-decreasing bin packing: sample indices -> rows of indices
    whose lengths sum to <= max_seq_len. FFD is within 11/9 of the optimal
    row count — unlike the arrival-order greedy packer it pairs long
    prompts with short ones, so the packed epoch approaches
    ceil(sum(len)/max_seq_len) rows. O(n^2) worst case; n is corpus size
    (thousands), negligible next to rendering."""
    order = sorted(range(len(lengths)), key=lambda i: -lengths[i])
    rows: List[List[int]] = []
    space: List[int] = []        # remaining capacity per open row
    for i in order:
        li = lengths[i]
        for r, sp in enumerate(space):
            if li <= sp:
                rows[r].append(i)
                space[r] = sp - li
                break
        else:
            rows.append([i])
            space.append(max_seq_len - li)
    return rows


def packed_row_count(
    rendered: List[Tuple[np.ndarray, np.ndarray]], max_seq_len: int
) -> int:
    """Rows the FFD packer will emit — the packing pre-pass (train() uses
    packed vs unpacked row counts to auto-disable packing when the corpus
    doesn't compress, VERDICT r4 #7)."""
    return len(ffd_pack([len(ids) for ids, _ in rendered], max_seq_len))


def make_packed_batches(
    samples: List[dict], max_seq_len: int, batch_size: int,
    seed: int = 0, shuffle: bool = True, pad_to_batch: bool = False,
    rendered: Optional[List[Tuple[np.ndarray, np.ndarray]]] = None,
) -> Iterator["PackedBatch"]:
    """Sequence packing (TRL SFTTrainer packing=True parity, ft_llm.py:295):
    first-fit-decreasing packs whole chat samples into rows up to
    max_seq_len; a segment id per token builds a block-diagonal attention
    mask so packed samples never attend across boundaries. Cuts padding
    waste massively on short ERC prompts. `shuffle` randomizes the ROW
    order per epoch (row composition is the deterministic FFD optimum;
    sample order inside a row never matters — segments are independent).

    pad_to_batch: emit every batch at exactly [batch_size, max_seq_len]
    (trailing all-pad rows carry segment_ids 0 so their loss weight is 0) —
    static shapes, one compile on the train path."""
    if rendered is None:
        rendered = render_samples(samples, max_seq_len)

    idx_rows = ffd_pack([len(ids) for ids, _ in rendered], max_seq_len)
    rows: List[List[Tuple[np.ndarray, np.ndarray]]] = [
        [rendered[i] for i in row] for row in idx_rows
    ]
    if shuffle:
        rng = np.random.default_rng(seed)
        rows = [rows[r] for r in rng.permutation(len(rows))]

    for s in range(0, len(rows), batch_size):
        chunk = rows[s : s + batch_size]
        B = batch_size if pad_to_batch else len(chunk)
        toks = np.zeros((B, max_seq_len), np.int32)
        mask = np.zeros((B, max_seq_len), np.int32)
        seg = np.zeros((B, max_seq_len), np.int32)  # 0 = padding
        for b, row in enumerate(chunk):
            off = 0
            for si, (ids, lm) in enumerate(row, start=1):
                toks[b, off : off + len(ids)] = ids
                mask[b, off : off + len(ids)] = lm
                seg[b, off : off + len(ids)] = si
                off += len(ids)
        yield PackedBatch(toks, mask, seg)


@dataclass
class PackedBatch:
    tokens: np.ndarray      # [B, T]
    loss_mask: np.ndarray   # [B, T]
    segment_ids: np.ndarray  # [B, T], 0 = pad; equal ids attend each other


def packed_sft_loss(
    lora: Dict,
    params: Dict,
    cfg: TransformerConfig,
    tokens: jnp.ndarray,
    loss_mask: jnp.ndarray,
    segment_ids: jnp.ndarray,
    key: jax.Array,
    *,
    lora_scale: float,
    neftune_alpha: float = 0.0,
    remat: bool = True,
) -> jnp.ndarray:
    """sft_loss with block-diagonal (causal AND same-segment) attention, and
    next-token targets masked at segment boundaries."""
    B, T = tokens.shape
    from ..ops.attention import causal_mask

    same_seg = segment_ids[:, None, :, None] == segment_ids[:, None, None, :]
    valid = (segment_ids > 0)[:, None, None, :]
    attn = causal_mask(T, T) & same_seg & valid
    # positions restart per segment so RoPE matches the unpacked layout
    idx = jnp.arange(T)[None, :]
    seg_change = jnp.concatenate(
        [jnp.ones((B, 1), bool), segment_ids[:, 1:] != segment_ids[:, :-1]], axis=1
    )
    seg_start = jnp.where(seg_change, idx, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start, axis=1)
    positions = (idx - seg_start).astype(jnp.int32)

    embeds = params["tok_emb"][tokens].astype(jnp.dtype(cfg.dtype))
    if neftune_alpha > 0:
        scale = neftune_alpha / jnp.sqrt(jnp.float32(T * cfg.dim))
        noise = jax.random.uniform(key, embeds.shape, jnp.float32, -1.0, 1.0) * scale
        embeds = embeds + noise.astype(embeds.dtype)
    out = core.forward(
        params, cfg, inputs_embeds=embeds, positions=positions, mask=attn,
        lora=lora, lora_scale=lora_scale, remat=remat,
    )
    logits = out.logits[:, :-1]
    targets = tokens[:, 1:]
    # only score where target continues the SAME segment
    w = (
        (loss_mask[:, 1:] > 0)
        & (segment_ids[:, 1:] == segment_ids[:, :-1])
    ).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_batches(
    samples: List[dict], max_seq_len: int, batch_size: int,
    seed: int = 0, shuffle: bool = True, drop_last: bool = False,
    rendered: Optional[List[Tuple[np.ndarray, np.ndarray]]] = None,
) -> Iterator[Batch]:
    """Right-padded fixed-width batches (static shapes; one compile)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(samples)) if shuffle else np.arange(len(samples))
    if rendered is None:
        rendered = render_samples(samples, max_seq_len)
    for s in range(0, len(order), batch_size):
        idx = order[s : s + batch_size]
        if drop_last and len(idx) < batch_size:
            break
        toks = np.zeros((len(idx), max_seq_len), np.int32)
        mask = np.zeros((len(idx), max_seq_len), np.int32)
        lens = np.zeros((len(idx),), np.int32)
        for j, i in enumerate(idx):
            # tail-truncated render (assistant span lives at the end)
            ids, lm = rendered[i]
            toks[j, : len(ids)] = ids
            mask[j, : len(ids)] = lm
            lens[j] = len(ids)
        yield Batch(toks, mask, lens)


# ----------------------------------------------------------------------- loss / step


def sft_loss(
    lora: Dict,
    params: Dict,
    cfg: TransformerConfig,
    tokens: jnp.ndarray,
    loss_mask: jnp.ndarray,
    length: jnp.ndarray,
    key: jax.Array,
    *,
    lora_scale: float,
    neftune_alpha: float = 0.0,
    remat: bool = True,
) -> jnp.ndarray:
    B, T = tokens.shape
    from ..ops.attention import causal_mask

    attn = causal_mask(T, T) & (
        jnp.arange(T)[None, None, None, :] < length[:, None, None, None]
    )
    embeds = params["tok_emb"][tokens].astype(jnp.dtype(cfg.dtype))
    if neftune_alpha > 0:
        # NEFTune (ft_llm.py neftune_noise_alpha=5): uniform noise on embeddings
        scale = neftune_alpha / jnp.sqrt(jnp.float32(T * cfg.dim))
        noise = jax.random.uniform(key, embeds.shape, jnp.float32, -1.0, 1.0) * scale
        embeds = embeds + noise.astype(embeds.dtype)
    out = core.forward(
        params, cfg, inputs_embeds=embeds, mask=attn,
        lora=lora, lora_scale=lora_scale, remat=remat,
    )
    logits = out.logits[:, :-1]                      # predict t+1
    targets = tokens[:, 1:]
    w = (loss_mask[:, 1:] > 0).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_optimizer(tcfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    if tcfg.lr_schedule == "linear":
        sched = optax.linear_schedule(tcfg.learning_rate, 0.0, max(total_steps, 1))
    else:
        sched = tcfg.learning_rate
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.999, weight_decay=0.0),
    )


@dataclass
class TrainState:
    lora: Dict
    opt_state: optax.OptState
    step: int


def make_train_step(
    cfg: TransformerConfig, tcfg: TrainConfig,
    optimizer: optax.GradientTransformation, packed: Optional[bool] = None,
):
    """One jitted SFT step. packed=None follows tcfg.packing (the production
    default). The third data argument is `length` [B] unpacked or
    `segment_ids` [B, T] packed."""
    lora_scale = tcfg.lora.alpha / tcfg.lora.r
    loss_fn = packed_sft_loss if (
        tcfg.packing if packed is None else packed
    ) else sft_loss

    @partial(jax.jit, donate_argnames=("lora", "opt_state"))
    def train_step(lora, opt_state, params, tokens, loss_mask, aux, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            lora, params, cfg, tokens, loss_mask, aux, key,
            lora_scale=lora_scale, neftune_alpha=tcfg.neftune_alpha,
            remat=tcfg.remat,
        )
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return train_step


# ----------------------------------------------------------------------- eval (weighted F1)


def weighted_f1(y_true: List[str], y_pred: List[str], labels: List[str]) -> float:
    """Generation-based weighted F1 (reference metric, ft_llm.py:143-148)."""
    f1_sum, n = 0.0, len(y_true)
    for lab in labels:
        tp = sum(1 for t, p in zip(y_true, y_pred) if t == lab and p == lab)
        fp = sum(1 for t, p in zip(y_true, y_pred) if t != lab and p == lab)
        fn = sum(1 for t, p in zip(y_true, y_pred) if t == lab and p != lab)
        support = tp + fn
        if support == 0:
            continue
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / support
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        f1_sum += f1 * support
    return f1_sum / max(n, 1)


def match_label(pred_text: str, labels: List[str]) -> str:
    """Map generated text to a label (reference split-on-'assistant' then
    containment, evaluate_base_model.py:38-44 semantics)."""
    pred_text = pred_text.strip().lower()
    for lab in labels:
        if pred_text.startswith(lab.lower()):
            return lab
    for lab in labels:
        if lab.lower() in pred_text:
            return lab
    return ""


def evaluate_generation(
    params: Dict,
    cfg: TransformerConfig,
    samples: List[dict],
    labels: List[str],
    lora: Optional[Dict] = None,
    lora_scale: float = 0.0,
    batch_size: int = 8,
    max_prompt: int = 768,
    max_new: int = 10,
) -> Tuple[float, List[str]]:
    """Greedy 10-token generation per sample -> weighted F1
    (emotion-label protocol: milvus/RAG.py:219-227, ft_llm.py:88-157)."""
    from ..ops.sampling import SamplerConfig

    y_true = [s["messages"][-1]["content"] for s in samples]
    preds: List[str] = []
    # generate() donates its cache and returns it — reuse ONE buffer across
    # batches instead of allocating+zeroing a fresh one per call (at 3B
    # geometry that's 3.6 GB of remote allocator churn per 8-row batch);
    # stale slots are safe: prefill rewrites 0..P, the decode mask reads
    # only written slots. The ragged tail pads to batch_size so the same
    # compiled program (and cache shape) serves every batch.
    cache = None
    for s0 in range(0, len(samples), batch_size):
        chunk = samples[s0 : s0 + batch_size]
        n_real = len(chunk)
        chunk = chunk + [chunk[-1]] * (batch_size - n_real)
        prompts = []
        for s in chunk:
            ids, _ = render_chat(s["messages"][:-1], add_generation_prompt=True)
            prompts.append(ids[-max_prompt:])
        toks, lens = core.left_pad(prompts, pad_id=frontend.PAD_ID, width=max_prompt)
        if cache is None:
            cache = core.make_cache(cfg, batch_size, max_prompt + max_new + 1)
        res = core.generate(
            params, cfg, jnp.asarray(toks), jnp.asarray(lens), cache,
            jax.random.PRNGKey(0), max_new_tokens=max_new,
            sampler=SamplerConfig.label(), eos_id=END, pad_id=frontend.PAD_ID,
            lora=lora, lora_scale=lora_scale,
        )
        cache = res.cache
        HEARTBEAT.update(t=time.time(), eval_row=s0)
        for row in np.asarray(res.tokens)[:n_real]:
            preds.append(match_label(decode_assistant(row), labels))
    return weighted_f1(y_true, preds, labels), preds


# ----------------------------------------------------------------------- driver


def train(
    params: Dict,
    cfg: TransformerConfig,
    tcfg: TrainConfig,
    train_samples: List[dict],
    eval_samples: Optional[List[dict]] = None,
    labels: Optional[List[str]] = None,
    out_dir: str = "./finetuned_llm",
    log_every: int = 50,
) -> Dict:
    """Full SFT driver: sequence packing (default, ft_llm.py:302), grad-accum,
    linear LR, eval/save every N steps, best-by-F1 selection, resume from
    latest checkpoint (the reference Trainer behaviours, ft_llm.py:263-315)."""
    key = jax.random.PRNGKey(tcfg.seed)
    lora = core.init_lora(key, cfg, tcfg.lora.r)

    # tokenize once; epochs only reshuffle the rendered samples (rendering
    # dominated batch-building and used to rerun every epoch AND once more
    # for the count below)
    rendered = render_samples(train_samples, tcfg.max_seq_len)

    # packing pre-pass (VERDICT r4 #7): packing only pays when the corpus
    # actually compresses. IEMOCAP ±5-window prompts average ~0.9 of
    # seq1024, so even the FFD optimum cuts <1.1x — then the block-diagonal
    # mask path is pure complexity and packing steps aside, logged.
    packing = tcfg.packing
    if packing:
        n_packed = packed_row_count(rendered, tcfg.max_seq_len)
        reduction = len(rendered) / max(n_packed, 1)
        if reduction < 1.1:
            packing = False
            print(f"[lora_sft] packing auto-disabled: FFD step reduction "
                  f"{reduction:.2f}x < 1.1x on this corpus "
                  f"({len(rendered)} samples -> {n_packed} packed rows at "
                  f"seq{tcfg.max_seq_len})")

    def epoch_batches(epoch: int) -> Iterator:
        if packing:
            # packed rows (TRL packing=True, ft_llm.py:302): static
            # [batch_size, max_seq_len] shapes via trailing pad rows
            return make_packed_batches(
                train_samples, tcfg.max_seq_len, tcfg.batch_size,
                seed=tcfg.seed + epoch, pad_to_batch=True, rendered=rendered,
            )
        return make_batches(
            train_samples, tcfg.max_seq_len, tcfg.batch_size,
            seed=tcfg.seed + epoch, drop_last=True, rendered=rendered,
        )

    # packing compresses the epoch: count the real micro-batches (the LR
    # schedule and resume contract run on APPLIED steps, like the reference);
    # batches stream lazily — an epoch is never held in host RAM
    micro_per_epoch = sum(1 for _ in epoch_batches(0))
    steps_per_epoch = max(1, micro_per_epoch // tcfg.grad_accum)
    total_steps = steps_per_epoch * tcfg.epochs
    # TRUE gradient accumulation: MultiSteps averages grads over grad_accum
    # micro-batches and applies ONE update — the inner schedule advances per
    # applied step, matching the reference's effective batch = bs * accum.
    optimizer = optax.MultiSteps(
        make_optimizer(tcfg, total_steps), every_k_schedule=tcfg.grad_accum
    )
    opt_state = optimizer.init(lora)
    step_fn = make_train_step(cfg, tcfg, optimizer, packed=packing)
    mgr = CheckpointManager(out_dir, save_total_limit=1)
    best_path = Path(out_dir) / "best.npz"

    state = {"lora": lora, "opt_state": opt_state}
    start = mgr.latest_step() or 0
    if start:
        state = mgr.restore(state, step=start)  # weights AND optimizer moments
    lora, opt_state = state["lora"], state["opt_state"]

    best_f1, best_step, step = -1.0, start, start
    history = []
    # real tensorboard events (reference: report_to="tensorboard",
    # ft_llm.py:290) alongside history.json
    from ..utils.tb_events import EventWriter

    tb = EventWriter(Path(out_dir) / "tb")
    done = step >= total_steps
    for epoch in range(tcfg.epochs):
        if done:
            break
        micro = 0
        for batch in epoch_batches(epoch):
            key, sub = jax.random.split(key)
            aux = batch.segment_ids if packing else batch.length
            lora, opt_state, loss = step_fn(
                lora, opt_state, params,
                jnp.asarray(batch.tokens), jnp.asarray(batch.loss_mask),
                jnp.asarray(aux), sub,
            )
            micro += 1
            HEARTBEAT.update(t=time.time(), step=step, micro=micro)
            if micro % tcfg.grad_accum:
                continue
            step += 1
            if step % log_every == 0:
                # float(loss) fetches through the tunnel = a real device sync
                # (block_until_ready does NOT sync through axon)
                history.append({"step": step, "loss": float(loss)})
                tb.scalar("train/loss", float(loss), step)
                tb.flush()
                print(f"[lora_sft] step {step}/{total_steps} "
                      f"loss {history[-1]['loss']:.4f}", flush=True)
            if eval_samples and labels and step % tcfg.eval_every == 0:
                f1, _ = evaluate_generation(
                    params, cfg, eval_samples, labels, lora=lora,
                    lora_scale=tcfg.lora.alpha / tcfg.lora.r,
                )
                history.append({"step": step, "eval_weighted_f1": f1})
                tb.scalar("eval/weighted_f1", f1, step)
                if f1 > best_f1:
                    best_f1, best_step = f1, step
                    save_pytree(best_path, lora, metadata={"f1": f1, "step": step})
            if step % tcfg.save_every == 0:
                mgr.save(
                    step, {"lora": lora, "opt_state": opt_state},
                    metadata={"best_f1": best_f1},
                )
            if step >= total_steps:  # resume never overtrains past schedule
                done = True
                break
    mgr.save(
        max(step, 1), {"lora": lora, "opt_state": opt_state},
        metadata={"best_f1": best_f1, "final": True},
    )
    if best_f1 < 0 and not best_path.exists():  # no eval ran: final = best
        save_pytree(best_path, lora, metadata={"step": step})
    tb.close()
    Path(out_dir, "history.json").write_text(json.dumps(history, indent=2))
    return {"lora": lora, "best_f1": best_f1, "best_step": best_step,
            "steps": step, "history": history,
            "best_checkpoint": str(best_path), "packing": packing}


# ----------------------------------------------------------------------- multichip dry run


def dryrun_train_step(n_devices: int) -> None:
    """Jit the FULL train step over a (data x model) mesh with dp+tp
    shardings and run ONE step on tiny shapes (driver contract). Exercises
    the PRODUCTION packed step (tcfg.packing default): segment ids carry
    two packed samples per row so the block-diagonal mask path shards."""
    model = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    mesh = make_mesh(data=n_devices // model, model=model)
    cfg = TransformerConfig(
        vocab_size=frontend.VOCAB_SIZE, dim=64, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=128, max_seq_len=64, dtype="float32",
    )
    tcfg = TrainConfig(batch_size=n_devices, grad_accum=1, max_seq_len=32)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    lora = core.init_lora(jax.random.PRNGKey(1), cfg, tcfg.lora.r)
    optimizer = make_optimizer(tcfg, 10)
    opt_state = optimizer.init(lora)
    step_fn = make_train_step(cfg, tcfg, optimizer)

    rng = np.random.default_rng(0)
    B, T = tcfg.batch_size, tcfg.max_seq_len
    tokens = rng.integers(16, 272, (B, T)).astype(np.int32)
    loss_mask = (rng.random((B, T)) > 0.5).astype(np.int32)
    # two packed segments per row + trailing pad (production batch layout)
    seg = np.zeros((B, T), np.int32)
    seg[:, : T // 2] = 1
    seg[:, T // 2 : T - 4] = 2
    loss_mask[:, T - 4 :] = 0

    with mesh:
        p_sh = jax.device_put(params, param_shardings(mesh, params))
        l_sh = jax.device_put(lora, param_shardings(mesh, lora))
        o_sh = jax.device_put(opt_state, param_shardings(mesh, opt_state))
        bsh = batch_sharding(mesh, 2)
        tok = jax.device_put(jnp.asarray(tokens), bsh)
        lm = jax.device_put(jnp.asarray(loss_mask), bsh)
        sg = jax.device_put(jnp.asarray(seg), bsh)
        lora2, opt2, loss = step_fn(
            l_sh, o_sh, p_sh, tok, lm, sg, jax.random.PRNGKey(2)
        )
        loss.block_until_ready()
    assert np.isfinite(float(loss)), "dry-run loss not finite"
    print(f"dryrun_multichip ok: mesh=({mesh.shape}), loss={float(loss):.4f}")
