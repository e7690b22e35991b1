"""StyleStore vs numpy exact search (SURVEY §4: 'top-k retrieval vs numpy
argsort'); insert/search/filter/persistence/self-verify contracts."""

import numpy as np
import pytest

from autostyle_tts_tpu.retrieval import StyleStore


def _vectors(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


def _numpy_cosine_topk(q, db, k):
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    dbn = db / np.linalg.norm(db, axis=-1, keepdims=True)
    sims = qn @ dbn.T
    idx = np.argsort(-sims, axis=-1)[:, :k]
    return np.take_along_axis(sims, idx, axis=-1), idx


def test_matches_numpy_exact():
    db = _vectors(100, 64)
    q = _vectors(5, 64, seed=1)
    store = StyleStore(dim=64, capacity=128)
    store.insert(db, [{"file_id": f"f{i}", "text": f"t{i}"} for i in range(100)])
    scores, idx = store.search_arrays(q, k=5)
    ref_scores, ref_idx = _numpy_cosine_topk(q, db, 5)
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-5, atol=1e-5)


def test_self_verify_top1_identity():
    db = _vectors(50, 32)
    store = StyleStore(dim=32, capacity=64)
    store.insert(db, [{"file_id": str(i), "text": ""} for i in range(50)])
    assert store.self_verify(sample=50)


def test_incremental_insert_and_growth():
    store = StyleStore(dim=16, capacity=8)
    v1 = _vectors(6, 16)
    v2 = _vectors(10, 16, seed=2)
    store.insert(v1, [{"file_id": f"a{i}", "text": ""} for i in range(6)])
    store.insert(v2, [{"file_id": f"b{i}", "text": ""} for i in range(10)])
    assert len(store) == 16
    assert store.capacity >= 16
    hits = store.search(v2[3], k=1)
    assert hits[0][0].file_id == "b3"


def test_speaker_filter():
    db = _vectors(20, 16)
    store = StyleStore(dim=16, capacity=32)
    meta = [
        {"file_id": str(i), "text": "", "speaker": "w1" if i % 2 else "m1"}
        for i in range(20)
    ]
    store.insert(db, meta)
    hits = store.search(db[0], k=3, speaker="w1")
    assert all(h.extras["speaker"] == "w1" for hl in hits for h in hl)
    # unfiltered top-1 of row 0 is itself (even index -> m1), filtered is not row 0
    assert all(h.index % 2 == 1 for h in hits[0])


def test_persistence_roundtrip(tmp_path):
    db = _vectors(12, 24)
    store = StyleStore(dim=24, capacity=16)
    store.insert(db, [{"file_id": str(i), "text": f"txt{i}"} for i in range(12)])
    store.save(tmp_path / "snap")
    loaded = StyleStore.load(tmp_path / "snap")
    assert len(loaded) == 12
    s1, i1 = store.search_arrays(db[:3], k=2)
    s2, i2 = loaded.search_arrays(db[:3], k=2)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_empty_store_returns_no_hits():
    store = StyleStore(dim=8, capacity=8)
    hits = store.search(np.ones(8, np.float32), k=3)
    assert hits == [[]]


def test_drop():
    store = StyleStore(dim=8, capacity=8)
    store.insert(_vectors(4, 8), [{"file_id": str(i), "text": ""} for i in range(4)])
    store.drop()
    assert len(store) == 0
    assert store.search(np.ones(8, np.float32), k=1) == [[]]


def test_observed_similarity_range_contract():
    """The reference's 64-query run scored cosine ~0.83-0.88
    (output_emb/search_results.json). Verify near-duplicate queries score in
    that regime here too: perturbed copies of stored vectors."""
    rng = np.random.default_rng(3)
    db = _vectors(64, 6144)
    store = StyleStore(dim=6144, capacity=128)
    store.insert(db, [{"file_id": str(i), "text": ""} for i in range(64)])
    noisy = db[:8] + 0.55 * rng.standard_normal((8, 6144)).astype(np.float32)
    scores, idx = store.search_arrays(noisy, k=1)
    assert (idx[:, 0] == np.arange(8)).all()
    assert 0.7 < scores.mean() < 0.95


def test_self_verify_covers_all_rows():
    """Round-2 contract: default self_verify sweeps EVERY row (the reference
    verified each inserted vector, insert_embeddings.py:544-584). A corrupted
    row far beyond the first chunk boundary must be caught."""
    import jax.numpy as jnp

    db = _vectors(40, 24, seed=3)
    store = StyleStore(dim=24, capacity=64)
    store.insert(db, [{"file_id": str(i), "text": ""} for i in range(40)])
    assert store.self_verify()  # full sweep, small chunks exercise the loop
    assert store.self_verify(chunk=7)
    # corrupt insert bookkeeping: row 33 lost its valid bit while meta still
    # counts it — searching it can only hit OTHER rows (score < 1)
    valid = np.asarray(store.valid).copy()
    valid[33] = False
    store.valid = jnp.asarray(valid)
    assert not store.self_verify()
    assert not store.self_verify(chunk=7)
    # but a last-batch check that doesn't reach row 33 stays green
    assert store.self_verify(sample=5)
