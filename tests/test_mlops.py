"""Training-data operator tests: dedup family, ANN, text analysis,
multimodal stubs."""

import numpy as np
import pandas as pd

from osm_jigsaw_ray.pipelines import mlops
import pyarrow as pa
import pytest

from osm_jigsaw_ray.pipelines.mlops import (
    _ngram_jaccard,
    ann_cosine_topk,
    embedding_near_dup,
    exact_dedup,
    fingerprint_md5,
    language_id,
    lsh_bucketed_ann,
    minhash_lsh_dedup,
    simhash_signatures,
    text_stats,
    winnowing_fingerprints,
)

SF = "/root/testdata/sf0.001"


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


DUPS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact
    (3, "the quick brown fox jumps over the lazy dog near the river delta"),  # near
    (4, "completely different text about ray data pipelines and arrow batches"),
    (5, "another unrelated document mentioning harbours and lighthouses only"),
]


def test_exact_dedup(ray_session):
    out = exact_dedup(_docs_ds(DUPS)).to_pandas()
    assert len(out) == 4  # 5 docs, one exact pair
    assert 1 in out["doc_id"].tolist() and 2 not in out["doc_id"].tolist()


def test_ngram_jaccard():
    assert _ngram_jaccard(DUPS[0][1], DUPS[1][1]) == 1.0
    assert 0.5 < _ngram_jaccard(DUPS[0][1], DUPS[2][1]) < 1.0
    assert _ngram_jaccard(DUPS[0][1], DUPS[3][1]) < 0.1


def test_minhasher_matches_rowwise_reference():
    """Vectorized dictionary-encode MinHasher must be bit-identical to
    the per-doc scalar path (same shingle strings → same blake2b → same
    permuted mins), including short/empty docs that hit the pad path."""
    texts = [r[1] for r in DUPS] + [
        "",  # zero tokens: one all-pad shingle
        "one",  # m < k: padded shingle
        "two words",  # m < k
        "exactly three tokens",  # m == k
        "Repeated repeated REPEATED tokens tokens 42 42 42",
        "punctuation, splits; tokens!  and   42x9 mixes",
    ]
    mh = mlops.MinHasher()
    got = mh._doc_minhash_matrix(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        want = mlops._minhash(mh._shingle_hashes(t), mh.a, mh.b)
        assert (got[i] == want).all(), (i, t)


def test_attach_doc_columns_paths_agree(ray_session):
    """Broadcast fast path, shuffle path (bytes cap exceeded), and
    no-prefilter shuffle path (key cap exceeded) must return identical
    rows — the caps only trade shuffle volume, never results."""
    import ray.data as rd

    docs = _docs_ds(DUPS)
    pairs = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 3, 99], pa.int64()),  # 99: missing key
                "b": pa.array([2, 4, 5], pa.int64()),
            }
        )
    )

    def run(**kw):
        return (
            mlops.attach_doc_columns(
                pairs, docs, key_cols=["a", "b"], out_cols=["ta", "tb"], **kw
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)[["a", "b", "ta", "tb"]]
        )

    fast = run()
    shuffled = run(max_broadcast_bytes=0)
    no_prefilter = run(max_prefilter_keys=1)
    pd.testing.assert_frame_equal(fast, shuffled)
    pd.testing.assert_frame_equal(fast, no_prefilter)
    texts = dict((r[0], r[1]) for r in DUPS)
    assert fast["ta"].tolist() == [texts[1], texts[3], ""]
    assert fast["tb"].tolist() == [texts[2], texts[4], texts[5]]


def test_tfidf_vocab_cap_bounds_idf_table(ray_session):
    """max_vocab hard-bounds the broadcast idf structure: only the top-N
    document-frequency terms may appear in any output row."""
    rows = [
        (i, f"common shared tokens plus unique{i}a unique{i}b unique{i}c")
        for i in range(40)
    ]
    out = mlops.tfidf_top_terms(_docs_ds(rows), k=3, max_vocab=4).to_pandas()
    # vocabulary capped at the 4 highest-df terms (the shared ones)
    assert set(out["term"]) <= {"common", "shared", "tokens", "plus"}
    # uncapped: unique terms dominate scores
    full = mlops.tfidf_top_terms(_docs_ds(rows), k=3, max_vocab=None).to_pandas()
    assert any(t.startswith("unique") for t in full["term"])


def test_minhash_lsh_dedup(ray_session):
    out = minhash_lsh_dedup(_docs_ds(DUPS), threshold=0.6).to_pandas()
    m = dict(zip(out["doc_id"], out["dup_of"]))
    # 1,2,3 cluster together under representative 1; 4,5 not near-dups
    assert m.get(2) == 1 and m.get(3) == 1
    assert 4 not in m or m[4] == 4
    assert 5 not in m or m[5] == 5


def test_simhash(ray_session):
    out = simhash_signatures(_docs_ds(DUPS)).to_pandas()
    s = dict(zip(out["doc_id"], out["simhash"]))
    assert s[1] == s[2]  # identical docs, identical signature

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(s[1], s[3]) < ham(s[1], s[4])  # near-dup closer than unrelated


def test_ann_cosine_topk(ray_session):
    import ray.data as rd

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    out = ann_cosine_topk(emb, query_ids=[0, 1], k=5).to_pandas()
    assert set(out["query_id"]) == {0, 1}
    assert (out.groupby("query_id").size() == 5).all()
    # results exclude self and are sorted desc within query
    for q, g in out.groupby("query_id"):
        assert q not in g["vec_id"].tolist()
        sims = g["cosine"].tolist()
        assert sims == sorted(sims, reverse=True)


def test_lsh_ann_subset_of_bruteforce_universe(ray_session):
    import ray.data as rd

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    approx = lsh_bucketed_ann(emb, query_ids=[0], k=5).to_pandas()
    assert len(approx) <= 5
    # approximate sims can't exceed the exact top-1
    exact = ann_cosine_topk(emb, query_ids=[0], k=1).to_pandas()
    if len(approx):
        assert approx["cosine"].max() <= exact["cosine"].max() + 1e-9


def test_embedding_near_dup(ray_session):
    import ray.data as rd

    # construct: vec 100 and 101 identical, 102 orthogonal
    base = np.zeros(8, dtype=np.float32)
    base[0] = 1.0
    other = np.zeros(8, dtype=np.float32)
    other[1] = 1.0
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([100, 101, 102], pa.int64()),
                "embedding": pa.array(
                    [base.tolist(), base.tolist(), other.tolist()],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    out = embedding_near_dup(emb, threshold=0.95).to_pandas()
    m = dict(zip(out["vec_id"], out["dup_of"]))
    assert m.get(101) == 100
    assert m.get(102, 102) == 102


def test_semantic_dedup(ray_session):
    """SemDeDup: seed-centroid clusters partition the pairwise verify;
    within a cluster the smallest vec_id survives and later near-dups
    drop; cross-cluster near-identity never compares (by design)."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import semantic_dedup

    ex = np.eye(8, dtype=np.float32)
    near = ex[0].copy()
    near[1] = 0.05  # cosine ~0.999 with ex[0] -> same cluster, dropped
    vecs = [ex[0], ex[1], near, ex[0], ex[2]]
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 5, 9, 12], pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
    )
    out = (
        semantic_dedup(emb, n_clusters=2, threshold=0.95)
        .to_pandas()
        .set_index("vec_id")
    )
    # centroids = vecs of ids 0 and 1; ex[0]-family -> cluster 0
    assert out.loc[0, "cluster"] == 0 and out.loc[5, "cluster"] == 0
    assert out.loc[9, "cluster"] == 0 and out.loc[1, "cluster"] == 1
    assert bool(out.loc[0, "kept"])  # smallest id in its dup set
    assert not bool(out.loc[5, "kept"])  # near-dup of 0
    assert not bool(out.loc[9, "kept"])  # exact dup of 0
    assert bool(out.loc[1, "kept"])  # alone in cluster 1
    # ex[2] is orthogonal to everything: kept wherever it landed
    assert bool(out.loc[12, "kept"])
    # Lloyd drop-in: a kmeans_fit partition gives the same dedup here
    from osm_jigsaw_ray.pipelines.mlops import kmeans_fit

    cents = kmeans_fit(emb, k=2, iters=2)
    out2 = (
        semantic_dedup(emb, threshold=0.95, centroids=cents)
        .to_pandas()
        .set_index("vec_id")
    )
    assert out2["kept"].equals(out["kept"])


def test_pack_sequences(ray_session):
    """Greedy fold semantics: budget overflow starts a new sequence; an
    oversized doc gets its own; packing is partition-scoped."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import pack_sequences

    docs = rd.from_items(
        [
            {"doc_id": 0, "text": "a b c"},          # 3 tokens
            {"doc_id": 1, "text": "d e f g"},        # 4 -> acc 7
            {"doc_id": 2, "text": " ".join("x" * 1 for _ in range(9))},  # 9 > 10-7
            {"doc_id": 3, "text": "h i"},            # 2 -> fits after 9? 9+2>10 -> new
            {"doc_id": 100, "text": "z"},            # next partition
        ]
    )
    out = (
        pack_sequences(docs, max_tokens=10, partition_size=100)
        .to_pandas()
        .set_index("doc_id")
    )
    assert list(out.loc[[0, 1], "seq"]) == [0, 0]  # 3+4=7 <= 10
    assert out.loc[2, "seq"] == 1  # 7+9 > 10 -> new seq
    assert out.loc[3, "seq"] == 2  # 9+2 > 10 -> new seq
    assert out.loc[100, "part"] == 1 and out.loc[100, "seq"] == 0
    assert out.loc[2, "n_tokens"] == 9
    # oversized docs: first-in-partition keeps seq 0 even over budget;
    # mid-stream it forces a new seq AND pushes the next doc out too
    big = " ".join("w" for _ in range(15))
    docs2 = rd.from_items(
        [
            {"doc_id": 0, "text": big},         # 15 > 10: own seq 0
            {"doc_id": 1, "text": "a b"},       # 15+2 > 10 -> seq 1
            {"doc_id": 2, "text": big},         # 2+15 > 10 -> seq 2
            {"doc_id": 3, "text": "c"},         # 15+1 > 10 -> seq 3
        ]
    )
    out2 = (
        pack_sequences(docs2, max_tokens=10, partition_size=100)
        .to_pandas()
        .set_index("doc_id")
    )
    assert list(out2["seq"]) == [0, 1, 2, 3]


def test_dsir_scores(ray_session):
    """DSIR: documents gram-similar to the target corpus score higher
    than off-domain documents; scores are int64 (order-free sums)."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import dsir_scores

    target = rd.from_items(
        [
            {"doc_id": 100, "text": "the quick brown fox jumps again"},
            {"doc_id": 101, "text": "quick brown foxes jump over dogs"},
        ]
    )
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "the quick brown fox"},
            {"doc_id": 2, "text": "zzz qqq www eee rrr"},
        ]
    )
    out = dsir_scores(docs, target, buckets=4096).to_pandas().set_index(
        "doc_id"
    )
    assert out["dsir_score"].dtype == np.int64
    assert out.loc[1, "dsir_score"] > out.loc[2, "dsir_score"]


def test_gopher_repetition(ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import gopher_repetition

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "spam spam spam spam spam spam spam spam"},
            {"doc_id": 2, "text": "eight completely distinct words appear in this text"},
        ]
    )
    out = gopher_repetition(docs).to_pandas().set_index("doc_id")
    # doc 1: 6 trigram occurrences, 1 distinct -> frac 5/6
    assert abs(out.loc[1, "dup_ngram_frac"] - (1 - 1 / 6)) < 1e-6
    assert bool(out.loc[1, "flagged"])
    assert out.loc[2, "dup_ngram_frac"] == 0.0
    assert not bool(out.loc[2, "flagged"])


def test_pii_scrub(ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import pii_scrub

    docs = rd.from_items(
        [
            {
                "doc_id": 1,
                "text": "mail me at jo.doe+x@sub.example.org or 555-123-4567 ok",
            },
            {"doc_id": 2, "text": "no pii here"},
        ]
    )
    out = pii_scrub(docs).to_pandas().set_index("doc_id")
    assert out.loc[1, "text"] == "mail me at <EMAIL> or <PHONE> ok"
    assert out.loc[1, "n_redactions"] == 2
    assert out.loc[2, "text"] == "no pii here"
    assert out.loc[2, "n_redactions"] == 0


def test_embedding_matrix_fixed_size_list(ray_session):
    """fixed_size_list<float, d> (the natural parquet embedding layout,
    no offsets buffer) must decode identically to list<float> —
    exercised at 500k scale in the round-4 rehearsal, pinned here."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import kmeans_assign

    vecs = np.eye(4, dtype=np.float32)[[0, 1, 0, 1]]
    cents = np.eye(4)[:2]
    ids = pa.array([0, 1, 2, 3], pa.int64())
    as_list = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    as_fixed = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array(list(vecs), pa.list_(pa.float32(), 4)),
        }
    )
    a = kmeans_assign(rd.from_arrow(as_list), cents).to_pandas()
    b = kmeans_assign(rd.from_arrow(as_fixed), cents).to_pandas()
    assert a.sort_values("vec_id").reset_index(drop=True).equals(
        b.sort_values("vec_id").reset_index(drop=True)
    )
    assert list(a.sort_values("vec_id")["cluster"]) == [0, 1, 0, 1]


def test_cluster_balanced_sample(ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import cluster_balanced_sample

    # two fixed centroids; 6 vectors near c0, 2 near c1
    cents = np.zeros((2, 4))
    cents[0, 0] = 1.0
    cents[1, 1] = 1.0
    rows = []
    for i in range(6):
        v = [1.0, 0.01 * i, 0.0, 0.0]
        rows.append({"vec_id": i, "embedding": v})
    for i in (10, 11):
        rows.append({"vec_id": i, "embedding": [0.0, 1.0, 0.01 * i, 0.0]})
    out = cluster_balanced_sample(
        rd.from_items(rows), cents, per_cluster=3
    ).to_pandas()
    by = out.groupby("cluster")["vec_id"].apply(list).to_dict()
    assert by[0] == [0, 1, 2]  # 3 smallest ids of the 6
    assert by[1] == [10, 11]  # under the cap: all kept


def test_decontaminate_paths_agree(ray_session):
    """Decontamination: exact shingle-overlap semantics, and the
    broadcast fast path and the distributed semi-join (broadcast_cap=0)
    return identical flags."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import decontaminate

    train = rd.from_items(
        [
            {"doc_id": 1, "text": "the quick brown fox jumps over dogs"},
            {"doc_id": 2, "text": "completely novel training content here"},
            {"doc_id": 3, "text": "short doc"},
        ]
    )
    test = rd.from_items(
        [
            {"doc_id": 100, "text": "we saw the quick brown fox yesterday"},
            {"doc_id": 101, "text": "short doc"},
        ]
    )
    fast = (
        decontaminate(train, test, shingle_k=3)
        .to_pandas()
        .set_index("doc_id")["contaminated"]
    )
    assert bool(fast[1])  # shares "the quick brown" (and more)
    assert not bool(fast[2])
    assert bool(fast[3])  # identical padded short doc in test set
    slow = (
        decontaminate(train, test, shingle_k=3, broadcast_cap=0)
        .to_pandas()
        .set_index("doc_id")["contaminated"]
    )
    assert fast.sort_index().equals(slow.sort_index())


def test_kmeans_fit_assign(ray_session):
    """Lloyd k-means: separates two obvious blobs, and the trunc6'd fit
    is bit-identical regardless of how the input is split into blocks
    (the property that makes the iterative fit oracle-exact)."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import kmeans_assign, kmeans_fit

    rng = np.random.RandomState(3)
    blob_a = np.zeros(8) + rng.randn(20, 8) * 0.05
    blob_a[:, 0] += 5.0
    blob_b = np.zeros(8) + rng.randn(20, 8) * 0.05
    blob_b[:, 1] += 5.0
    # interleave so seed 0 is in blob A and seed 1 in blob B
    vecs = np.empty((40, 8))
    vecs[0::2] = blob_a
    vecs[1::2] = blob_b
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs.astype(np.float32)],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    cents = kmeans_fit(emb, k=2, iters=3)
    assert cents.shape == (2, 8)
    assert abs(cents[0, 0] - 5.0) < 0.1 and abs(cents[1, 1] - 5.0) < 0.1
    out = kmeans_assign(emb, cents).to_pandas().set_index("vec_id")
    assert (out.loc[0::2, "cluster"] == 0).all()
    assert (out.loc[1::2, "cluster"] == 1).all()
    # block-structure determinism: same fit from a different split
    cents_split = kmeans_fit(emb.repartition(7), k=2, iters=3)
    assert (cents == cents_split).all()


def test_embedding_near_dup_banded_subidentical(ray_session):
    """Banded OR-of-AND hyperplane LSH recalls NEAR (not identical)
    duplicates: a cosine-0.99 pair survives the band stage at these
    fixed seeds and verifies above threshold 0.95."""
    import ray.data as rd

    theta = np.arccos(0.99)
    base = np.zeros(8, dtype=np.float32)
    base[0] = 1.0
    near = np.zeros(8, dtype=np.float32)
    near[0], near[1] = np.cos(theta), np.sin(theta)
    other = np.zeros(8, dtype=np.float32)
    other[2] = 1.0
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([200, 201, 202], pa.int64()),
                "embedding": pa.array(
                    [base.tolist(), near.tolist(), other.tolist()],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    out = embedding_near_dup(
        emb, threshold=0.95, num_bands=16, planes_per_band=16
    ).to_pandas()
    m = dict(zip(out["vec_id"], out["dup_of"]))
    assert m.get(201) == 200
    assert m.get(202, 202) == 202


def test_text_stats(ray_session):
    out = text_stats(_docs_ds(DUPS)).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 13
    assert out.loc[1, "stopword_ratio"] == pytest.approx(3 / 13, abs=1e-6)
    assert (out["alpha_ratio"] <= 1.0).all()


def test_language_id(ray_session):
    docs = _docs_ds(
        [
            (1, "the cat and the dog is in the house"),
            (2, "der hund und die katze ist gut"),
            (3, "le chat et la maison est grande"),
            (4, "xyzzy plugh qwop"),
        ]
    )
    out = language_id(docs).to_pandas().set_index("doc_id")
    assert out.loc[1, "lang_pred"] == "en"
    assert out.loc[2, "lang_pred"] == "de"
    assert out.loc[3, "lang_pred"] == "fr"
    assert out.loc[4, "lang_pred"] == "und"


def test_fingerprints(ray_session):
    import hashlib

    out = fingerprint_md5(_docs_ds(DUPS)).to_pandas().set_index("doc_id")
    assert out.loc[1, "fingerprint"] == hashlib.md5(DUPS[0][1].encode()).hexdigest()
    wf = winnowing_fingerprints(_docs_ds(DUPS)).to_pandas().set_index("doc_id")
    assert list(wf.loc[1, "fingerprints"]) == list(wf.loc[2, "fingerprints"])
    # near-dup shares most fingerprints
    f1 = set(wf.loc[1, "fingerprints"])
    f3 = set(wf.loc[3, "fingerprints"])
    assert len(f1 & f3) / len(f1 | f3) > 0.5


def test_multimodal_stub_pipeline(ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.stages.multimodal import (
        DecodeBackend,
        decode_images,
        encode_fake_image,
        featurize_images,
    )

    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([1, 2, 3], pa.int64()),
                "payload": pa.array(
                    [encode_fake_image(i, 64 + i, 48) for i in (1, 2, 3)], pa.binary()
                ),
                "media_type": pa.array(["image/fake"] * 3, pa.string()),
            }
        )
    )
    decoded = decode_images(media).to_pandas().sort_values("media_id")
    assert decoded["width"].tolist() == [65, 66, 67]
    assert decoded["height"].tolist() == [48, 48, 48]
    assert "payload" not in decoded.columns

    feats = featurize_images(media).to_pandas().sort_values("media_id")
    assert all(len(f) == 8 for f in feats["features"])
    # determinism
    feats2 = featurize_images(media).to_pandas().sort_values("media_id")
    assert [list(f) for f in feats["features"]] == [list(f) for f in feats2["features"]]

    # real-codec path is stubbed
    with pytest.raises(NotImplementedError):
        DecodeBackend().decode_image(b"\x89PNG\r\n....")


def test_min_label_components_paths_agree(ray_session):
    """The distributed min-label propagation must produce exactly the
    single-task union-find's components, chains included."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import min_label_components

    # chain 1-2-3-4, star 10-(11,12), singleton pair 20-21
    edges = pa.table(
        {
            "a": pa.array([2, 3, 4, 10, 10, 21], pa.int64()),
            "b": pa.array([1, 2, 3, 11, 12, 20], pa.int64()),
        }
    )
    fast = (
        min_label_components(rd.from_arrow(edges))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    slow = (
        min_label_components(rd.from_arrow(edges), single_task_threshold=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert fast.values.tolist() == slow.values.tolist()
    m = dict(zip(fast["node"], fast["label"]))
    assert m == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_simhash_near_dup_matches_bruteforce(ray_session):
    """Pigeonhole-banded simhash near-dup must find EXACTLY the pairs a
    brute-force all-pairs popcount finds at hamming <= 3."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import (
        simhash_near_dup,
        simhash_signatures,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    got = simhash_near_dup(docs, max_hamming=3).to_pandas()
    sigs = simhash_signatures(docs).to_pandas()
    s = sigs["simhash"].to_numpy().astype(np.uint64)
    ids = sigs["doc_id"].to_numpy()
    want = set()
    x = s[:, None] ^ s[None, :]
    for i in range(len(s)):
        for j in range(i + 1, len(s)):
            if bin(int(x[i, j])).count("1") <= 3:
                want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert set(zip(got["a"], got["b"])) == want
    assert len(got) == len(want)


def test_multimodal_resize_framesample_audio(ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.stages.multimodal import (
        audio_features,
        encode_fake_audio,
        encode_fake_image,
        encode_fake_video,
        resize_images,
        sample_video_frames,
    )

    imgs = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array(
                    [encode_fake_image(1, 640, 480), encode_fake_image(2, 16, 8)],
                    pa.binary(),
                ),
                "media_type": pa.array(["image/fake"] * 2, pa.string()),
            }
        )
    )
    r = resize_images(imgs, max_side=32).to_pandas().sort_values("media_id")
    # aspect preserved, capped at 32; already-small image untouched
    assert r["width"].tolist() == [32, 16]
    assert r["height"].tolist() == [24, 8]
    # resized payloads re-decode through the same backend
    from osm_jigsaw_ray.stages.multimodal import DecodeBackend

    assert DecodeBackend().decode_image(r["payload"].iloc[0]) == (32, 24)

    vids = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([7], pa.int64()),
                "payload": pa.array([encode_fake_video(7, 35, 320, 240)], pa.binary()),
            }
        )
    )
    f = sample_video_frames(vids, stride=10).to_pandas()
    assert f["frame_index"].tolist() == [0, 10, 20, 30]
    assert (f["width"] == 320).all()

    auds = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([3], pa.int64()),
                "payload": pa.array([encode_fake_audio(3, 16000)], pa.binary()),
            }
        )
    )
    a = audio_features(auds).to_pandas()
    assert a["duration_s"].iloc[0] == pytest.approx(1.0)
    assert a["rms"].iloc[0] > 0
    assert a["zero_crossings"].iloc[0] > 0

    # real-codec paths stay honestly stubbed
    from osm_jigsaw_ray.stages.multimodal import VideoFrameSampler

    with pytest.raises(NotImplementedError):
        VideoFrameSampler()(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "payload": pa.array([b"\x00\x00\x00 ftypmp42...."], pa.binary()),
                }
            )
        )


def test_ivf_ann_recall_vs_bruteforce(ray_session):
    """IVF with nprobe=2 of 16 lists is approximate; its results must be
    a subset of the vector universe with cosines never exceeding the
    exact top-1, and recall vs brute force should be substantial on
    this corpus."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import ann_cosine_topk, ivf_ann

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    approx = ivf_ann(emb, query_ids=[0, 1], k=5).to_pandas()
    exact = ann_cosine_topk(emb, query_ids=[0, 1], k=5).to_pandas()
    for q in (0, 1):
        a = set(approx[approx["query_id"] == q]["vec_id"])
        e = set(exact[exact["query_id"] == q]["vec_id"])
        assert len(a) <= 5
        assert approx[approx["query_id"] == q]["cosine"].max() <= (
            exact[exact["query_id"] == q]["cosine"].max() + 1e-9
        )


def test_tfidf_top_terms_semantics(ray_session):
    import ray.data as rd

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "apple apple banana",
                    "banana cherry",
                    "cherry cherry cherry dates",
                ],
            }
        )
    )
    out = mlops.tfidf_top_terms(docs, k=2).to_pandas()
    # df: apple 1, banana 2, cherry 2, dates 1; N=3
    idf_rare = np.log(4.0 / 2.0) + 1.0   # df=1
    idf_mid = np.log(4.0 / 3.0) + 1.0    # df=2
    d0 = out[out["doc_id"] == 0].set_index("term")["tfidf"]
    assert abs(d0["apple"] - np.floor(2 * idf_rare * 1e6) / 1e6) < 1e-12
    assert abs(d0["banana"] - np.floor(1 * idf_mid * 1e6) / 1e6) < 1e-12
    # doc 1: banana and cherry tie exactly (tf=1, same df) -> both kept,
    # and with k=1 the lexicographically smaller term wins
    top1 = mlops.tfidf_top_terms(docs, k=1).to_pandas()
    assert top1[top1["doc_id"] == 1]["term"].iloc[0] == "banana"
    # min_df prunes singletons entirely
    pruned = mlops.tfidf_top_terms(docs, k=5, min_df=2).to_pandas()
    assert set(pruned["term"]) == {"banana", "cherry"}


def test_tfidf_kernels_match_rowwise(ray_session):
    """The dictionary-encode df/scoring kernels must reproduce the
    per-row findall definition exactly (same tokens, same floats, same
    DESC-score/ASC-term top-k) — including empty docs, punctuation runs,
    unicode delimiters, and ties."""
    rows = [
        (0, "Apple apple banana!  banana?"),
        (1, ""),
        (2, "çğü non-ascii härte 42x9 mixes"),
        (3, "tie tie tee tee"),
        (4, "  leading and trailing  "),
        (5, "apple banana cherry dates eggs figs grapes"),
        # NOTE no U+0130 'İ' here: utf8_lower's simple mapping ('İ'→'i',
        # matching DuckDB lower()) intentionally diverges from Python
        # str.lower ('i'+combining dot) — see stages/enrich.py docstring
        (6, "naïve café fjörd"),
    ]
    docs = _docs_ds(rows)
    k = 3

    # per-row reference (the pre-vectorization definition)
    import re as _re

    tok = _re.compile(r"[a-z0-9]+")
    ref_df: dict[str, int] = {}
    for _, text in rows:
        for t in set(tok.findall(text.lower())):
            ref_df[t] = ref_df.get(t, 0) + 1
    got_df = mlops.document_frequencies(docs).to_pandas()
    assert dict(zip(got_df["term"], got_df["df"])) == ref_df

    n = len(rows)
    idf = {
        t: np.log((1.0 + n) / (1.0 + d)) + 1.0 for t, d in ref_df.items()
    }
    ref_rows = []
    for doc_id, text in rows:
        counts: dict[str, int] = {}
        for t in tok.findall(text.lower()):
            counts[t] = counts.get(t, 0) + 1
        scored = [(tf * idf[t], t) for t, tf in counts.items()]
        scored.sort(key=lambda p: (-p[0], p[1]))
        for s, t in scored[:k]:
            ref_rows.append((doc_id, t, np.floor(s * 1e6) / 1e6))
    got = (
        mlops.tfidf_top_terms(docs, k=k)
        .to_pandas()
        .sort_values(["doc_id", "tfidf", "term"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame(ref_rows, columns=["doc_id", "term", "tfidf"])
        .sort_values(["doc_id", "tfidf", "term"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_corpus_split_deterministic_and_stratified(ray_session):
    import ray.data as rd

    n = 20_000
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n), "lang": np.arange(n) % 3})
    )
    out = mlops.corpus_split(docs).to_pandas()
    assert len(out) == n and set(out["split"]) == {"train", "val", "test"}
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.9) < 0.01
    assert abs(frac["val"] - 0.05) < 0.005
    # deterministic: re-run is identical
    again = mlops.corpus_split(docs).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )
    # stratified in expectation: per-lang proportions hold
    m = out.merge(pd.DataFrame({"doc_id": np.arange(n), "lang": np.arange(n) % 3}))
    for _, g in m.groupby("lang"):
        assert abs((g["split"] == "train").mean() - 0.9) < 0.02


def test_curate_corpus_gate_dedup_split(ray_session):
    import ray.data as rd

    good = "the cat and the dog are in the house with the bird on a mat"
    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": [
                    good,              # passes gate
                    "short text",      # < min_tokens -> dropped
                    good,              # exact dup of 0 -> dropped (keep 0)
                    "zzz qqq xxx yyy www vvv uuu ttt sss rrr nnn",  # no stopwords -> dropped
                    good + " extra words here today",               # passes
                ],
            }
        )
    )
    out = mlops.curate_corpus(docs).to_pandas()
    assert sorted(out["doc_id"]) == [0, 4]
    # split labels agree with corpus_split on the same ids
    ref = mlops.corpus_split(
        rd.from_pandas(pd.DataFrame({"doc_id": [0, 4]}))
    ).to_pandas()
    merged = out.merge(ref, on="doc_id", suffixes=("", "_ref"))
    assert (merged["split"] == merged["split_ref"]).all()


def test_top_bigrams_counts_and_ties(ray_session):
    import ray.data as rd

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["a b a b c", "b c a b"],
            }
        )
    )
    out = mlops.top_bigrams(docs, k=3).to_pandas()
    # bigrams: doc0: (a b),(b a),(a b),(b c); doc1: (b c),(c a),(a b)
    # counts: "a b" 3, "b c" 2, "b a" 1, "c a" 1 — tie at 1 -> "b a" first
    assert out["bigram"].tolist() == ["a b", "b c", "b a"]
    assert out["n"].tolist() == [3, 2, 1]


def test_length_quantiles_exact_rule(ray_session):
    import ray.data as rd

    lengths = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": range(10), "text": ["x" * n for n in lengths]})
    )
    out = mlops.length_quantiles(docs, qs=(0.5, 0.9, 1.0)).set_index("q")["n_chars"]
    # smallest value with cum count >= ceil(q*10): 0.5 -> rank 5 -> 5;
    # 0.9 -> rank 9 -> 9; 1.0 -> rank 10 -> 10
    assert out[0.5] == 5 and out[0.9] == 9 and out[1.0] == 10


# ---------------------------------------------------------------------------
# vectorized text kernels vs their row-wise definitions (round-5: the
# last per-row Python loops in corpus-scale scans)
# ---------------------------------------------------------------------------

_KERNEL_TEXTS = [
    "The cat AND the dog; le chat est ici und der Hund!",
    "",
    None,
    "a",
    "àéîõü ññ — ünïcødé grams ünïcødé grams",
    "der die und ist " * 30,          # >64 tokens: window cap matters
    "the la le el les der " * 20,     # multi-lang tie material
    "x" * 3,                          # shorter than k=5
    "shared prefix shared prefix shared suffix tail",
    "tab\tand\nnewline  runs   of spaces",
]


def _kernel_docs():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(_KERNEL_TEXTS)), pa.int64()),
                "text": pa.array(_KERNEL_TEXTS, pa.string()),
            }
        )
    )


def test_langid_matches_rowwise(ray_session):
    """Vectorized language_id == the round-1 per-row definition."""
    import re

    from osm_jigsaw_ray.pipelines.mlops import _LANG_MARKERS, language_id

    token_re = re.compile(r"[a-z0-9]+")
    want = []
    for i, text in enumerate(_KERNEL_TEXTS):
        toks = token_re.findall((text or "").lower())[:64]
        best_lang, best = "und", 0
        for lang in sorted(_LANG_MARKERS):
            hits = sum(t in _LANG_MARKERS[lang] for t in toks)
            if hits > best:
                best, best_lang = hits, lang
        want.append((i, best_lang, best))
    got = language_id(_kernel_docs()).to_pandas().sort_values("doc_id")
    assert list(map(tuple, got.to_records(index=False))) == want


def test_winnowing_matches_rowwise(ray_session):
    """Vectorized winnowing == the per-character-position definition."""
    import numpy as np

    from osm_jigsaw_ray.pipelines.mlops import (
        _md5_u64,
        winnowing_fingerprints,
    )

    k, window = 5, 4
    want = {}
    for i, text in enumerate(_KERNEL_TEXTS):
        s = (text or "").lower()
        if len(s) < k:
            want[i] = []
            continue
        arr = np.array(
            [_md5_u64(s[j : j + k]) >> 1 for j in range(len(s) - k + 1)],
            dtype=np.uint64,
        )
        if arr.size <= window:
            want[i] = [int(arr.min())]
        else:
            want[i] = sorted(
                {
                    int(arr[j : j + window].min())
                    for j in range(arr.size - window + 1)
                }
            )
    got = (
        winnowing_fingerprints(_kernel_docs(), k=k, window=window)
        .to_pandas()
        .set_index("doc_id")["fingerprints"]
    )
    for i in want:
        assert list(got.loc[i]) == want[i], i


def test_gram_buckets_match_rowwise():
    """Vectorized _gram_buckets (Arrow-joined gram strings) == the
    per-tuple join+md5 definition."""
    import hashlib

    import numpy as np

    from osm_jigsaw_ray.pipelines.mlops import _gram_buckets

    tokens = ["der", "hund", "katze", "", "a1", "\x00"]
    uniq_sh = np.array(
        [[0, 1], [1, 2], [4, 5], [5, 5], [2, 0], [3, 4]], dtype=np.int64
    )
    buckets = 97
    want = [
        int.from_bytes(
            hashlib.md5(
                " ".join(tokens[t] for t in row).encode("utf-8")
            ).digest()[:8],
            "big",
        )
        % buckets
        for row in uniq_sh
    ]
    got = _gram_buckets(uniq_sh, tokens, buckets)
    assert got.tolist() == want


def test_fingerprint_buffer_kernel_matches(ray_session):
    """Buffer-slice md5 == the row-wise utf-8 definition (incl. null,
    empty, multi-byte, and a sliced/offset Arrow column)."""
    import hashlib

    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import fingerprint_md5

    texts = ["plain", "", None, "ünïcødé …", "a" * 5000, "tab\tnl\n"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    ).slice(1)  # nonzero offset exercises the arr.offset arithmetic
    got = (
        fingerprint_md5(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")["fingerprint"]
        .tolist()
    )
    want = [
        hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts[1:]
    ]
    assert got == want


def test_top_bigrams_kernel_matches_rowwise(ray_session):
    """The dictionary-encode bigram kernel counts exactly what the
    row-wise findall loop counts, including unicode/punct boundaries,
    NULL texts, and single-token docs."""
    import re

    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import top_bigrams

    texts = [
        "The quick brown fox jumps over the lazy dog the quick brown",
        "hello,WORLD; hello world — hello  world",
        None,
        "",
        "one",
        "a b a b a b a b",
        "Ünïcode stays out but ascii42 pairs ascii42 pairs",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(3)
    got = top_bigrams(ds, k=1000, num_partitions=4).to_pandas()

    tok_re = re.compile(r"[a-z0-9]+")
    want: dict[str, int] = {}
    for t in texts:
        toks = tok_re.findall((t or "").lower())
        for a, b in zip(toks, toks[1:]):
            want[a + " " + b] = want.get(a + " " + b, 0) + 1
    got_map = dict(zip(got["bigram"], got["n"]))
    assert got_map == want


def test_simhash_kernel_matches_rowwise(ray_session):
    """The vectorized simhash kernel reproduces the row-wise md5
    bit-voting definition exactly (duplicate tokens vote per occurrence;
    empty/None docs sign to 0)."""
    import hashlib
    import re

    import ray.data as rd

    from osm_jigsaw_ray.pipelines.mlops import simhash_signatures

    texts = [
        "the quick brown fox the quick",
        "hello WORLD hello world hello",
        None,
        "",
        "solo",
        "Ünïcode bits ascii42 ascii42 bits",
        "a " * 3000,  # one doc big enough to matter in chunking paths
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (
        simhash_signatures(rd.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("doc_id")["simhash"]
        .to_numpy()
    )

    tok_re = re.compile(r"[a-z0-9]+")
    bitcols = np.arange(64, dtype=np.uint64)
    want = []
    for t in texts:
        votes = np.zeros(64, dtype=np.int64)
        for tok in tok_re.findall((t or "").lower()):
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
            )
            bits = (np.uint64(h) >> bitcols) & np.uint64(1)
            votes += np.where(bits.astype(bool), 1, -1)
        want.append(int(((votes > 0).astype(np.uint64) << bitcols).sum()) >> 1)
    assert list(got) == want
