"""Extract the reference's Chinese text as a BPE training corpus.

The reference repo ships NO ZH corpus files — `zh_text` fields in
output_emb/*.json are English (grep-verified: zero CJK chars). Its only real
Chinese is the CN prompt templates / few-shot examples / label sets inside
src/*_cn.py and the query prompts in milvus/*.py (~3.9k CJK chars) — which
is exactly the ZH that flows through the embedder tokenizer at serving time
(prompt text dominates the 512-token truncation window, milvus/RAG.py:129).
This script pulls those spans out AS DATA (the same footing as the label
maps in train/reformat.py) into one utterance-per-line txt for
cli/train_bpe --zh_merges.

  python scripts/extract_zh_corpus.py [--ref /root/reference] \
      [--output vocab/zh_corpus_ref.txt]
"""

import argparse
import re
from pathlib import Path

# CJK + CJK punctuation + kana, in contiguous spans
_SPAN = re.compile(r"[぀-ヿ一-鿿、。！，：；？「」‘’]+")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ref", default="/root/reference")
    p.add_argument("--output", default="vocab/zh_corpus_ref.txt")
    args = p.parse_args()
    spans = []
    seen = set()
    for f in sorted(Path(args.ref).rglob("*")):
        if f.suffix not in (".py", ".sh", ".json", ".jsonl", ".md"):
            continue
        try:
            text = f.read_text(encoding="utf-8", errors="ignore")
        except OSError:
            continue
        for m in _SPAN.finditer(text):
            s = m.group(0)
            if len(s) >= 2 and s not in seen:
                seen.add(s)
                spans.append(s)
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(spans) + "\n", encoding="utf-8")
    n_chars = sum(len(s) for s in spans)
    print(f"{len(spans)} spans, {n_chars} chars -> {out}")


if __name__ == "__main__":
    main()
