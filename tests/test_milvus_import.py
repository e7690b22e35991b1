"""Import the reference's ACTUAL production Milvus Lite DB and verify
retrieval semantics on its real vectors (SURVEY §4 implication: 'retrieval
recall@k against the bundled milvus_demo.db contents')."""

import pathlib

import numpy as np
import pytest

REF_DB = "/root/reference/milvus/milvus_demo.db"

pytestmark = pytest.mark.skipif(
    not pathlib.Path(REF_DB).exists(), reason="reference DB not present"
)


def test_import_reference_db_and_recall():
    from autostyle_tts_tpu.retrieval.milvus_import import (
        import_milvus_db, list_collections, read_collection,
    )

    cols = list_collections(REF_DB)
    assert "embeddings_biographies_collection" in cols

    vectors, meta = read_collection(REF_DB, "embeddings_biographies_collection")
    assert vectors.shape == (130, 6144)   # the reference's production corpus
    assert all("file_id" in m for m in meta)
    assert meta[0]["file_id"].startswith("tonight")

    store = import_milvus_db(REF_DB)
    assert len(store) == 130 and store.dim == 6144
    # exact self-search on the real data: top-1 cosine == 1 for every row
    assert store.self_verify(sample=130)

    # recall@5 vs numpy exact search on the REAL vectors
    q = vectors[:16]
    scores, idx = store.search_arrays(q, k=5)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    dbn = vectors / np.linalg.norm(vectors, axis=-1, keepdims=True)
    ref_idx = np.argsort(-(qn @ dbn.T), axis=-1)[:, :5]
    # recall@5 must be perfect (exact search)
    for r in range(16):
        assert set(idx[r]) == set(ref_idx[r])

    # neighbour similarities on real data land in the regime the reference
    # observed on its 64-query run (~0.83-0.88, output_emb/search_results.json)
    second_best = scores[:, 1]  # top-1 is self (cos=1)
    assert 0.5 < float(np.median(second_best)) <= 1.0


def test_import_cli(tmp_path, capsys):
    from autostyle_tts_tpu.cli import import_milvus

    out = tmp_path / "imported"
    import_milvus.main(["--milvus_db", REF_DB, "--out", str(out)])
    captured = capsys.readouterr().out
    assert "imported 130 vectors (dim 6144)" in captured
    assert "self-verify ok" in captured
    from autostyle_tts_tpu.retrieval import StyleStore

    loaded = StyleStore.load(out)
    assert len(loaded) == 130
    hits = loaded.search(np.asarray(loaded.db[3]), k=1)
    assert hits[0][0].distance > 0.999
