"""RAG layer: style-embedder LLM service + style-DB build + dialog search.

Covers reference components C7-C13 (SURVEY §2.1) with ONE implementation of
each function the reference repeated verbatim across 7 files (dup-code note):

- ``EmbedderService.embed``          — mean-pooled last-hidden-layer text
  embedding, 512-token truncation (milvus/RAG.py get_embedding :114-147)
- ``EmbedderService.biography``      — sampled generation T=0.7 top_p=0.9,
  250 new tokens (RAG.py generate_biography :150-188)
- ``EmbedderService.emotion_label``  — greedy 10-token generation against the
  6-label set (RAG.py generate_emotion_label :191-235)
- ``combined_embedding``             — concat(emb(emotion_label), emb(bio)),
  3072||3072 = 6144 (RAG.py create_combined_embedding :238-266)
- ``build_style_db``                 — C7/C8 insert pipeline (per-speaker bio
  once, per-utterance emotion, insert, self-verify)
- ``search_dialog``                  — C10 batch query path + C11/C12
  ablations (emotion-only / bio-only with zeroed halves,
  search_json_ab_text.py:406-420, search_json_ab_bio.py:407-412)

TPU notes: embeds/generations run batched & bucketed; the combined query
matrix goes straight into the in-HBM StyleStore (one matmul+top_k); zero
Python-per-item device sync in the embed path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import frontend
from ..models import transformer as core
from ..ops.sampling import SamplerConfig
from ..retrieval import StyleStore
from ..utils.config import TransformerConfig
from ..utils.manifest import RetrievalRow, StyleSample, group_by_speaker

# Prompt templates carried over as DATA (reference behaviour, not code).
BIOGRAPHY_PROMPT = """
Given this conversation between speakers:
"
{conversation}
"
In overall of above conversation, what do you think about the characteristics of speaker {speaker}? (Note: provide an answer within 250 words)
"""

EMOTION_PROMPT = """\n=======
Context: Given predefined emotional label set [{labels}], and below conversation:
"
{conversation}
"

Question: What is the emotion of the speaker at the utterance "{text}"?
Answer:"""

EMOTION_LABELS_EN = ["happy", "sad", "neutral", "angry", "excited", "frustrated"]
# ZH retrieval label set (7 labels incl. fear/surprise) — same inventory the
# ZH trainer uses (reformat_data_ft_llm_cn.py:59-67); selected via the CLIs'
# --language flag so the ZH flow doesn't classify against English labels.
EMOTION_LABELS_ZH = ["快乐", "中性", "悲伤", "厌恶", "愤怒", "恐惧", "惊讶"]


def labels_for_language(language: str) -> List[str]:
    return list(EMOTION_LABELS_EN if language == "en" else EMOTION_LABELS_ZH)

EMBED_MAX_TOKENS = 512       # RAG.py:129 truncation contract
BIO_MAX_NEW = 250            # RAG.py:176-184
EMOTION_MAX_NEW = 10         # RAG.py:219-227
# Per-device-call activation/KV budget. Caller-sized batches at 3B geometry
# can outgrow the HBM left next to the int8 base (+LoRA): a bucket-of-32 bio
# batch allocates a 4.7 GB KV cache, a 256-row embed forward 1.3+ GB of
# activation temps — both observed as compile-time OOMs on one 16 GB chip.
# embed() and _generate() chunk their batches to stay under this budget;
# demo/tiny geometries are unaffected (cap saturates).
GEN_KV_BUDGET_BYTES = 1_250_000_000
PLACEHOLDER_BIO = "This is a placeholder biography."  # search_json.py fallback


class EmbedderService:
    """Batched embedding + generation on the shared transformer core."""

    def __init__(
        self,
        cfg: TransformerConfig,
        params: Dict,
        lora: Optional[Dict] = None,
        lora_scale: float = 0.0,
        labels: Sequence[str] = tuple(EMOTION_LABELS_EN),
        tokenizer=None,
        erc_chat="auto",
        language: str = "en",
    ):
        """`tokenizer`: optional tokenizer. Three modes:
        - None: self-contained byte frontend (models/frontend.py)
        - models.bpe.BPETokenizer: trained framework vocab (shares the
          frontend's special ids; truncation counts TOKENS, matching the
          reference's 512-BPE-token contract, RAG.py:129)
        - HF tokenizer: REQUIRED when `params` come from a real checkpoint
          (utils/hf_convert.py), whose embedding table is indexed by its own
          BPE ids.

        `erc_chat`: serve emotion labels through the ERC fine-tune's CHAT
        format (train/reformat.py messages + render_chat role tokens) instead
        of the plain EMOTION_PROMPT string. An adapter trained by
        train/lora_sft.py never saw EMOTION_PROMPT — served through it, its
        predictions degenerate to the base model's (measured: identical
        retrieval precision to 4 decimals). "auto" = chat iff a LoRA adapter
        is loaded and the byte frontend is active (render_chat is a byte-
        plane format; BPE/HF-tokenized services keep the plain prompt)."""
        self.cfg = cfg
        self.params = params
        self.lora = lora
        self.lora_scale = lora_scale
        self.labels = list(labels)
        self.language = language
        self.erc_chat = (
            (lora is not None and tokenizer is None)
            if erc_chat == "auto" else bool(erc_chat)
        )
        self.key = jax.random.PRNGKey(0)
        self._frontend_bpe = hasattr(tokenizer, "encode_segment")
        self.tokenizer = tokenizer
        if self._frontend_bpe:
            assert cfg.vocab_size >= tokenizer.vocab_size, (
                f"embedder vocab_size={cfg.vocab_size} < BPE vocab "
                f"{tokenizer.vocab_size}"
            )
        if tokenizer is None or self._frontend_bpe:
            self.pad_id = frontend.PAD_ID
            self.eos_id = frontend.EOS_ID
        else:
            pad = tokenizer.pad_token_id  # 0 is a legitimate pad id
            self.pad_id = pad if pad is not None else (tokenizer.eos_token_id or 0)
            self.eos_id = tokenizer.eos_token_id

        @partial(jax.jit, static_argnames=())
        def _embed(params, lora, tokens, attn_mask):
            return core.embed_text(
                params, cfg, tokens, attn_mask, lora=lora, lora_scale=lora_scale
            )

        self._embed_fn = _embed

    # ------------------------------------------------------------------ tokenization

    def _encode(self, text: str, max_len: int) -> np.ndarray:
        if self.tokenizer is None or self._frontend_bpe:
            return frontend.encode(
                text, add_eos=False, tokenizer=self.tokenizer
            )[:max_len]
        ids = self.tokenizer.encode(text)
        return np.asarray(ids[:max_len], np.int32)

    def _decode(self, ids) -> str:
        if self.tokenizer is None or self._frontend_bpe:
            return frontend.decode(ids, tokenizer=self.tokenizer)
        return self.tokenizer.decode([int(i) for i in ids], skip_special_tokens=True)

    # ------------------------------------------------------------------ embeddings

    @staticmethod
    def _batch_bucket(n: int) -> int:
        """Pad batch sizes to powers of two so the final partial chunk of an
        insert/search loop reuses a compiled program instead of recompiling."""
        b = 1
        while b < n:
            b *= 2
        return b

    def embed(self, texts: List[str], width: int = EMBED_MAX_TOKENS) -> np.ndarray:
        """[B] texts -> [B, dim] f32 mean-pooled last-hidden embeddings
        (512-token truncation per the reference contract, RAG.py:129)."""
        # chunk so forward-activation temps stay under the device budget
        # (~8 live bf16 [B, T, D] copies through the layer stack)
        row_bytes = width * self.cfg.dim * 2 * 8
        cap = 1
        while cap < 256 and cap * 2 * row_bytes <= GEN_KV_BUDGET_BYTES:
            cap *= 2
        if len(texts) > cap:
            return np.concatenate([
                self.embed(texts[s0 : s0 + cap], width=width)
                for s0 in range(0, len(texts), cap)
            ], axis=0)
        B = len(texts)
        Bp = self._batch_bucket(B)
        seqs = [self._encode(t, width) for t in texts]
        lens = np.zeros((Bp,), np.int32)
        lens[:B] = [len(s) for s in seqs]
        ids = np.full((Bp, width), self.pad_id, np.int32)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
        mask = (np.arange(width)[None, :] < lens[:, None]).astype(np.int32)
        out = self._embed_fn(
            self.params, self.lora, jnp.asarray(ids), jnp.asarray(mask)
        )
        return np.asarray(out, np.float32)[:B]

    def combined_embedding(
        self, emotion_texts: List[str], biography_texts: List[str]
    ) -> np.ndarray:
        """concat(emb(emotion), emb(bio)) -> [B, 2*dim] (= 6144 at 3B)."""
        emo = self.embed(emotion_texts)
        bio = self.embed(biography_texts)
        return np.concatenate([emo, bio], axis=-1)

    # ------------------------------------------------------------------ generation

    def _generate(
        self, prompts: List[str], max_new: int, sampler: SamplerConfig,
        prompt_width: int = 1024,
    ) -> List[str]:
        seqs = [self._encode(p, 10**9)[-prompt_width:] for p in prompts]
        return self._generate_ids(seqs, max_new, sampler, prompt_width)

    def _generate_ids(
        self, seqs, max_new: int, sampler: SamplerConfig, prompt_width: int,
        eos_id=None, decode_fn=None,
    ) -> List[str]:
        # chunk so the per-call KV cache stays under GEN_KV_BUDGET_BYTES
        row_bytes = (
            self.cfg.n_layers * (prompt_width + max_new + 1)
            * self.cfg.n_kv_heads * self.cfg.head_dim * 2 * 2  # bf16, k+v
        )
        cap = 1
        while cap < 64 and cap * 2 * row_bytes <= GEN_KV_BUDGET_BYTES:
            cap *= 2
        if len(seqs) > cap:
            out: List[str] = []
            for s0 in range(0, len(seqs), cap):
                out.extend(self._generate_ids(
                    seqs[s0 : s0 + cap], max_new, sampler, prompt_width,
                    eos_id=eos_id, decode_fn=decode_fn,
                ))
            return out
        B = len(seqs)
        Bp = self._batch_bucket(B)
        seqs = list(seqs) + [seqs[-1]] * (Bp - B)  # pad rows reuse a real prompt
        toks, lens = core.left_pad(seqs, pad_id=self.pad_id, width=prompt_width)
        cache = core.make_cache(self.cfg, Bp, prompt_width + max_new + 1)
        self.key, sub = jax.random.split(self.key)
        res = core.generate(
            self.params, self.cfg, jnp.asarray(toks), jnp.asarray(lens), cache,
            sub, max_new_tokens=max_new, sampler=sampler,
            eos_id=self.eos_id if eos_id is None else eos_id,
            pad_id=self.pad_id,
            lora=self.lora, lora_scale=self.lora_scale,
        )
        out = []
        for row, n in zip(np.asarray(res.tokens)[:B], np.asarray(res.lengths)[:B]):
            row = row[: int(n)]
            out.append(
                (decode_fn(row) if decode_fn else self._decode(row)).strip()
            )
        return out

    def biography(self, conversation: str, speaker: str) -> str:
        return self.biographies([(conversation, speaker)])[0]

    def biographies(self, items: List[Tuple[str, str]]) -> List[str]:
        prompts = [
            BIOGRAPHY_PROMPT.format(conversation=c, speaker=s) for c, s in items
        ]
        return self._generate(prompts, BIO_MAX_NEW, SamplerConfig.biography())

    def emotion_label(self, text: str) -> str:
        return self.emotion_labels([text])[0]

    def _erc_chat_labels_raw(
        self, texts: List[str], contexts=None, names=None,
    ) -> List[str]:
        """Emotion labels through the fine-tune's own chat format: the same
        reformat.py system/user messages and render_chat byte-plane template
        the adapter trained on (serve == train distribution; mirrors the
        reference loading its PEFT model for retrieval, milvus/RAG.py:96-101
        after ft_llm.py's setup_chat_format training)."""
        from ..train.lora_sft import END, decode_assistant, render_chat
        from ..train.reformat import _PROMPTS

        P = _PROMPTS[self.language]
        width = 768 if contexts else 512  # eval protocol's max_prompt=768
        seqs = []
        for i, t in enumerate(texts):
            name = names[i] if names else "A"
            ctx = (contexts[i] if contexts and contexts[i]
                   else f" {name}: {t}")
            system = P["system"] + P["context"].format(ctx=ctx)
            q = P["question_default"].format(name=name, sent=t)
            ids, _ = render_chat(
                [{"role": "system", "content": system},
                 {"role": "user", "content": q}],
                add_generation_prompt=True,
            )
            seqs.append(ids[-width:])
        return self._generate_ids(
            seqs, EMOTION_MAX_NEW, SamplerConfig.label(), width,
            eos_id=END, decode_fn=decode_assistant,
        )

    def emotion_labels(
        self, texts: List[str], contexts=None, names=None,
    ) -> List[str]:
        """Per-utterance emotion labels. `contexts`/`names`: optional
        surrounding-dialog windows + speaker names per text — the training
        distribution (reformat.py ±window context); dialog callers
        (search_dialog with context_window>0) pass them so a fine-tuned
        adapter sees serve-time prompts shaped like its training prompts."""
        if self.erc_chat:
            raw = self._erc_chat_labels_raw(texts, contexts, names)
        else:
            prompts = [
                EMOTION_PROMPT.format(
                    labels=", ".join(self.labels),
                    conversation=(contexts[i] if contexts and contexts[i]
                                  else t),
                    text=t,
                )
                for i, t in enumerate(texts)
            ]
            raw = self._generate(
                prompts, EMOTION_MAX_NEW, SamplerConfig.label(), prompt_width=512
            )
        out = []
        for r in raw:
            r = r.strip().lower()
            match = next((l for l in self.labels if r.startswith(l.lower())), None)
            match = match or next(
                (l for l in self.labels if l.lower() in r), None
            )
            out.append(match or "neutral")  # reference default on failure
        return out


# ----------------------------------------------------------------------- DB build (C7/C8)


def build_style_db(
    embedder: EmbedderService,
    samples: List[StyleSample],
    capacity: int = 4096,
    batch: int = 16,
    engine=None,
    wav_dir: str = "",
) -> StyleStore:
    """Insert pipeline: group by speaker -> one biography per speaker from the
    speaker's concatenated utterances -> per-utterance emotion label ->
    combined 2*dim embedding -> insert -> self-verify
    (reference main loop insert_embeddings.py:443-519, verify :544-584).

    With `engine`, each sample's style wav (wav_dir/file_id[.wav]) is
    featurized at insert time and the speech tokens / prompt mel / speaker
    embedding land in the DB as artifacts — serving then indexes these
    device-ready caches instead of reloading wavs per query (deliberate
    divergence from the reference's load-wav-per-query design,
    tts_with_rag.py:180; SURVEY §7 hard part 5)."""
    by_speaker = group_by_speaker(samples)
    bios: Dict[str, str] = {}
    spk_items = [
        ("\n".join(s.zh_text for s in group), spk)
        for spk, group in by_speaker.items()
    ]
    bio_texts = embedder.biographies(spk_items)
    for (_, spk), bio in zip(spk_items, bio_texts):
        bios[spk] = bio

    store = StyleStore(dim=2 * embedder.cfg.dim, capacity=capacity)
    for s0 in range(0, len(samples), batch):
        chunk = samples[s0 : s0 + batch]
        emotions = embedder.emotion_labels([s.zh_text for s in chunk])
        vecs = embedder.combined_embedding(
            emotions, [bios[s.speaker] for s in chunk]
        )
        store.insert(
            vecs,
            [
                {
                    "file_id": s.file_id,
                    "text": s.zh_text,
                    "speaker": s.speaker,
                    "emotion": e,
                }
                for s, e in zip(chunk, emotions)
            ],
        )
        # verify the batch we just wrote (reference verified after insert,
        # insert_embeddings.py:544-584) — catches corruption at the write
        if not store.self_verify(sample=len(chunk)):
            raise RuntimeError(
                f"style DB self-verification failed for insert batch at {s0}"
            )
    # final sweep over EVERY row, exactly like the reference
    if not store.self_verify():
        raise RuntimeError("style DB self-verification failed (top-1 != self)")

    if engine is not None:
        from pathlib import Path

        from ..utils.native_audio import load_wav_fast

        sr = engine.cfg.audio.prompt_sample_rate
        feats = []
        # featurize in the same chunked batches as the embedding loop — one
        # [N, 30s] device batch for a 1k+ corpus would blow HBM
        for s0 in range(0, len(samples), batch):
            wavs = []
            for s in samples[s0 : s0 + batch]:
                fid = s.file_id
                p = Path(wav_dir) / (fid if fid.endswith(".wav") else fid + ".wav")
                wavs.append(load_wav_fast(str(p), sr))
            feats.extend(engine.prompt_features(wavs))
        T_tok = max(len(f.tokens) for f in feats)
        F_mel = max(f.mel24.shape[0] for f in feats)
        M = feats[0].mel24.shape[1]
        n = len(feats)
        tokens = np.zeros((n, T_tok), np.int32)
        tok_lens = np.zeros((n,), np.int32)
        mels = np.zeros((n, F_mel, M), np.float32)
        mel_lens = np.zeros((n,), np.int32)
        spks = np.zeros((n, feats[0].spk.shape[0]), np.float32)
        for i, f in enumerate(feats):
            tokens[i, : len(f.tokens)] = f.tokens
            tok_lens[i] = len(f.tokens)
            mels[i, : f.mel24.shape[0]] = f.mel24
            mel_lens[i] = f.mel24.shape[0]
            spks[i] = f.spk
        store.artifacts = {
            "speech_tokens": tokens, "speech_token_lens": tok_lens,
            "prompt_mel": mels, "prompt_mel_lens": mel_lens, "spk": spks,
        }
    return store


# ----------------------------------------------------------------------- query (C10-C12)


@dataclass
class DialogTurn:
    zh_text: str
    speaker: str


def search_dialog(
    embedder: EmbedderService,
    store: StyleStore,
    turns: List[DialogTurn],
    conversations_by_speaker: Optional[Dict[str, str]] = None,
    top_k: int = 1,
    file_prefix_path: str = "",
    ablation: Optional[str] = None,    # None | "emotion_only" | "bio_only"
    batch: int = 16,
    context_window: int = 0,
) -> List[RetrievalRow]:
    """The production query path (search_json.py:313-465): one biography per
    speaker, per-turn emotion label, combined query, top-k search, JSONL rows.

    Ablations zero one half of the query and L2-normalize, matching
    search_json_ab_text.py:406-420 / search_json_ab_bio.py:407-412.

    `context_window`: label each turn with ±N surrounding turns as context
    (the input IS an ordered dialog, search_json.py's contract). 0 =
    reference-exact single-utterance labeling (search_json.py:391); >0
    matches the ERC fine-tune's training distribution (reformat.py ±window)
    — measured to carry the trained adapter's accuracy into retrieval.
    """
    speakers = sorted({t.speaker for t in turns})
    convs = conversations_by_speaker or {
        spk: "\n".join(t.zh_text for t in turns if t.speaker == spk)
        for spk in speakers
    }
    bio_texts = embedder.biographies([(convs[s], s) for s in speakers])
    bios = dict(zip(speakers, bio_texts))

    ctxs_all = None
    if context_window:
        lines = [f" {t.speaker}: {t.zh_text}" for t in turns]
        ctxs_all = [
            "\n".join(lines[max(0, i - context_window)
                            : i + context_window + 1])
            for i in range(len(turns))
        ]

    rows: List[RetrievalRow] = []
    for s0 in range(0, len(turns), batch):
        chunk = turns[s0 : s0 + batch]
        emotions = embedder.emotion_labels(
            [t.zh_text for t in chunk],
            contexts=ctxs_all[s0 : s0 + batch] if ctxs_all else None,
            names=[t.speaker for t in chunk] if ctxs_all else None,
        )
        biogs = [bios.get(t.speaker, PLACEHOLDER_BIO) for t in chunk]
        q = embedder.combined_embedding(emotions, biogs)
        half = q.shape[1] // 2
        if ablation == "emotion_only":
            q[:, half:] = 0.0
            q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        elif ablation == "bio_only":
            q[:, :half] = 0.0
            q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        hits = store.search(q, k=top_k)
        for t, hl in zip(chunk, hits):
            if not hl:
                rows.append(
                    RetrievalRow(t.zh_text, t.speaker, "N/A", "N/A", 0.0)
                )
                continue
            h = hl[0]
            fid = h.file_id
            if file_prefix_path:
                fid = file_prefix_path.rstrip("/") + "/" + fid.lstrip("/")
            rows.append(
                RetrievalRow(
                    zh_text=t.zh_text,
                    speaker=t.speaker,
                    retrieved_file_id=fid,
                    retrieved_text=h.text,
                    distance=h.distance,
                    retrieved_index=h.index,
                )
            )
    return rows
