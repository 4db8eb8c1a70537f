"""Large-scale training-data operators over the ``documents`` /
``embeddings`` tables: deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard verify, embedding near-dup), similarity search
(brute-force + LSH-bucketed ANN), text analysis (token counts, quality
scores, language id, fingerprints).

These are first-class engine components (not ports of the reference —
osm-jigsaw has no text ops): each follows the same Ray-Data shape as the
spatial pipelines — vectorized ``map_batches`` partials, small
``groupby`` finals, broadcast small sides via ``ray.put``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_MERSENNE = (1 << 61) - 1


def trunc6(x):
    """Deterministic 6-decimal truncation (``floor(x*1e6)/1e6``) used for
    every float column an SQL oracle re-computes: ``floor`` has no
    tie-breaking mode, unlike round-half (numpy half-even vs SQL
    half-away) which diverges on exact .5 ties."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6) / 1e6


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: rd.Dataset) -> rd.Dataset:
    """Exact text dedup: group by content, keep the smallest doc_id.
    Partial-friendly: the groupby key is the text hash (fixed width), not
    the text itself, so the shuffle moves 16 bytes + id per row."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.blake2b(t.encode("utf-8"), digest_size=16).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "content_hash": pa.array(hashes, pa.string())}
        )

    hashed = docs.select_columns(["doc_id", "text"]).map_batches(
        add_hash, batch_format="pyarrow"
    )
    from ray.data.aggregate import Min

    return hashed.groupby("content_hash").aggregate(Min("doc_id", alias_name="doc_id"))


# ---------------------------------------------------------------------------
# shingles / minhash machinery
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _token_shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-token shingles → 61-bit polynomial hashes (deterministic)."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        toks = toks + ["\x00"] * (k - len(toks))
    out = np.empty(len(toks) - k + 1, dtype=np.uint64)
    for i in range(len(toks) - k + 1):
        h = 0
        for t in toks[i : i + k]:
            th = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
            )
            h = (h * 1_000_003 + th) % _MERSENNE
        out[i] = h
    return np.unique(out)


def _minhash_params(num_perm: int, seed: int = 1234):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _minhash(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if shingles.size == 0:
        return np.full(a.size, _MERSENNE, dtype=np.uint64)
    # (num_perm, n_shingles) — python ints avoid uint64 overflow pitfalls
    vals = (
        a[:, None].astype(object) * shingles[None, :].astype(object)
        + b[:, None].astype(object)
    ) % _MERSENNE
    return np.min(vals.astype(np.uint64), axis=1)


class MinHasher:
    """Actor stage: documents → (band_id, band_hash, doc_id) LSH rows.
    Permutation params build once per actor."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        self.a, self.b = _minhash_params(num_perm)
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_ids: list[int] = []
        band_hashes: list[int] = []
        doc_ids: list[int] = []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = _token_shingle_hashes(text or "", self.shingle_k)
            mh = _minhash(sh, self.a, self.b)
            for bnd in range(self.bands):
                seg = mh[bnd * self.rows : (bnd + 1) * self.rows]
                bh = int.from_bytes(
                    hashlib.blake2b(seg.tobytes(), digest_size=8).digest(), "big"
                ) >> 1
                band_ids.append(bnd)
                band_hashes.append(bh)
                doc_ids.append(did)
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
            }
        )


def _ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(_token_shingle_hashes(a, k).tolist())
    sb = set(_token_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_dedup(
    docs: rd.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    concurrency: int | tuple = 2,
) -> rd.Dataset:
    """MinHash+LSH near-dup: shingle→minhash→band rows →
    ``groupby(band)`` buckets → candidate pairs → exact n-gram Jaccard
    verify → min-label clusters. Returns (doc_id, dup_of) for docs in a
    near-dup cluster (dup_of = smallest doc_id in cluster, including the
    representative row itself).

    The verify step fetches texts from a broadcast {doc_id: text} dict —
    right-sized while candidates ≪ corpus; at larger scale the pair list
    joins back to the corpus instead (same contract)."""
    slim = docs.select_columns(["doc_id", "text"])
    band_rows = slim.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
        a_out, b_out = [], []
        rep = ids[0]  # star expansion keeps candidate count linear per bucket
        for other in ids[1:]:
            a_out.append(rep)
            b_out.append(other)
        return pd.DataFrame({"a": pd.Series(a_out, dtype=np.int64), "b": pd.Series(b_out, dtype=np.int64)})

    candidates = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    cand_df = candidates.to_pandas().drop_duplicates()

    # broadcast texts for verification (see docstring for the scale path)
    texts: dict[int, str] = {}
    for b in slim.iter_batches(batch_format="pyarrow"):
        texts.update(zip(b["doc_id"].to_pylist(), b["text"].to_pylist()))
    texts_ref = ray.put(texts)

    if cand_df.empty:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "dup_of": pa.array([], pa.int64())})
        )

    def verify(batch: pa.Table) -> pa.Table:
        t = ray.get(texts_ref)
        keep_a, keep_b = [], []
        for a_id, b_id in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            if _ngram_jaccard(t.get(a_id, ""), t.get(b_id, "")) >= threshold:
                keep_a.append(a_id)
                keep_b.append(b_id)
        return pa.table(
            {"a": pa.array(keep_a, pa.int64()), "b": pa.array(keep_b, pa.int64())}
        )

    verified = rd.from_pandas(cand_df).map_batches(verify, batch_format="pyarrow")
    edges = verified.to_pandas()

    # union-find on the (small) verified edge list
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a_id, b_id in zip(edges["a"], edges["b"]):
        ra, rb = find(int(a_id)), find(int(b_id))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((d, find(d)) for d in parent)
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "dup_of": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


def ngram_jaccard_pairs(
    docs: rd.Dataset, pairs: list[tuple[int, int]], *, shingle_k: int = 3
) -> rd.Dataset:
    """Exact token-n-gram Jaccard for explicit document pairs (the verify
    primitive of the near-dup family, exposed standalone). Texts ride a
    broadcast dict; the pair list maps in parallel."""
    texts: dict[int, str] = {}
    for b in docs.select_columns(["doc_id", "text"]).iter_batches(
        batch_format="pyarrow"
    ):
        texts.update(zip(b["doc_id"].to_pylist(), b["text"].to_pylist()))
    texts_ref = ray.put(texts)

    pair_ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.int64()),
                "b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        t = ray.get(texts_ref)
        sims = [
            float(
                trunc6(
                    _ngram_jaccard(t.get(a, ""), t.get(b, ""), shingle_k)
                )
            )
            for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist())
        ]
        return batch.append_column("jaccard", pa.array(sims, pa.float64()))

    return pair_ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_signatures(docs: rd.Dataset) -> rd.Dataset:
    """64-bit SimHash per document (token-hash bit voting)."""

    def fn(batch: pa.Table) -> pa.Table:
        sigs = []
        for text in batch["text"].to_pylist():
            toks = _TOKEN_RE.findall((text or "").lower())
            votes = np.zeros(64, dtype=np.int64)
            for t in toks:
                h = int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
                )
                bits = (h >> np.arange(64, dtype=np.uint64)) & 1
                votes += np.where(bits.astype(bool), 1, -1)
            sig = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            sigs.append(sig >> 1)  # keep in int64
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(sigs, pa.int64())}
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# embedding similarity: brute-force + LSH-bucketed ANN, embedding near-dup
# ---------------------------------------------------------------------------

def _embedding_matrix(batch: pa.Table, dtype=np.float32) -> np.ndarray:
    col = batch["embedding"].combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(dtype)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    dim = offsets[1] - offsets[0]
    return flat[offsets[0] : offsets[-1]].reshape(len(batch), dim)


def ann_cosine_topk(
    embeddings: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    *,
    round_to: int = 6,
) -> rd.Dataset:
    """Brute-force cosine top-k per query — the exactness baseline.
    Queries broadcast once (``ray.put``); each batch does one matmul and
    emits its local top-k partial; a tiny groupby takes the global top-k.
    Self-matches excluded. Similarity rounded for oracle comparability."""
    qset = set(query_ids)

    qrows = embeddings.filter(lambda r: r["vec_id"] in qset).take_all()
    qid = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    # float64 throughout: keeps cosine bit-comparable with a double-math
    # SQL oracle after rounding
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    q_ref = ray.put((qid, qmat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qid_, qmat_ = ray.get(q_ref)
        m = _embedding_matrix(batch, np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = m @ qmat_.T  # (batch, nq)
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        for j in range(qid_.size):
            s = sims[:, j]
            mask = vec_ids != qid_[j]
            idx = np.nonzero(mask)[0]
            # local truncation must agree with the global (cosine DESC,
            # vec_id ASC) tie-break or duplicate embeddings straddling the
            # local-k boundary drop the globally-preferred smaller vec_id
            order = idx[np.lexsort((vec_ids[idx], -s[idx]))][:k]
            out_q.extend([int(qid_[j])] * order.size)
            out_v.extend(vec_ids[order].tolist())
            out_s.extend(s[order].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = embeddings.map_batches(partial_topk, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["cosine"] = trunc6(g["cosine"].to_numpy())
        return g

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def lsh_bucketed_ann(
    embeddings: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    *,
    num_planes: int = 8,
    seed: int = 99,
) -> rd.Dataset:
    """LSH-bucketed ANN — the scale path: random-hyperplane bucket per
    vector, search only buckets the query lands in. Approximate by
    construction; same output schema as :func:`ann_cosine_topk`."""
    first = embeddings.take(1)[0]
    dim = len(first["embedding"])
    rng = np.random.RandomState(seed)
    planes = rng.randn(num_planes, dim).astype(np.float32)
    planes_ref = ray.put(planes)

    qset = set(query_ids)
    qrows = embeddings.filter(lambda r: r["vec_id"] in qset).take_all()
    qid = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in qrows])
    qsig = (qmat @ planes.T > 0).astype(np.uint8)
    qbucket = (qsig << np.arange(num_planes, dtype=np.uint8)).sum(axis=1)
    q_by_bucket: dict[int, list[int]] = {}
    for i, bkt in enumerate(qbucket):
        q_by_bucket.setdefault(int(bkt), []).append(i)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    q_ref = ray.put((qid, qn, q_by_bucket))

    def bucket_topk(batch: pa.Table) -> pa.Table:
        planes_ = ray.get(planes_ref)
        qid_, qn_, q_by_bucket_ = ray.get(q_ref)
        m = _embedding_matrix(batch)
        sig = (m @ planes_.T > 0).astype(np.uint8)
        buckets = (sig << np.arange(planes_.shape[0], dtype=np.uint8)).sum(axis=1)
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        out_q, out_v, out_s = [], [], []
        for bkt, q_idx in q_by_bucket_.items():
            mask = buckets == bkt
            if not mask.any():
                continue
            sub = mn[mask]
            sub_ids = vec_ids[mask]
            sims = sub @ qn_[q_idx].T
            for jj, qi in enumerate(q_idx):
                s = sims[:, jj]
                keep = sub_ids != qid_[qi]
                idx = np.nonzero(keep)[0]
                order = idx[np.lexsort((sub_ids[idx], -s[idx]))][:k]
                out_q.extend([int(qid_[qi])] * order.size)
                out_v.extend(sub_ids[order].tolist())
                out_s.extend(s[order].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = embeddings.map_batches(bucket_topk, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["cosine"] = g["cosine"].round(6)
        return g

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def embedding_near_dup(
    embeddings: rd.Dataset, *, threshold: float = 0.95, num_planes: int = 8
) -> rd.Dataset:
    """Embedding-cosine near-dup: LSH-bucket vectors, verify pairwise
    cosine within buckets, emit (vec_id, dup_of = min cluster id)."""
    first = embeddings.take(1)[0]
    dim = len(first["embedding"])
    rng = np.random.RandomState(7)
    planes = rng.randn(num_planes, dim).astype(np.float32)
    planes_ref = ray.put(planes)

    def assign_bucket(batch: pa.Table) -> pa.Table:
        planes_ = ray.get(planes_ref)
        m = _embedding_matrix(batch)
        sig = (m @ planes_.T > 0).astype(np.uint8)
        buckets = (sig << np.arange(planes_.shape[0], dtype=np.uint8)).sum(axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "bucket": pa.array(buckets.astype(np.int32)),
                "embedding": batch["embedding"],
            }
        )

    bucketed = embeddings.map_batches(assign_bucket, batch_format="pyarrow")

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy(dtype=np.int64)
        if ids.size < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
        m = np.stack([np.asarray(e, dtype=np.float32) for e in group["embedding"]])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = m @ m.T
        iu, ju = np.triu_indices(ids.size, 1)
        hit = sims[iu, ju] >= threshold
        return pd.DataFrame(
            {"a": pd.Series(ids[iu[hit]], dtype=np.int64), "b": pd.Series(ids[ju[hit]], dtype=np.int64)}
        )

    edges = bucketed.groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pandas"
    ).to_pandas()
    if edges.empty or "a" not in edges.columns:
        # all-empty groups can lose the schema entirely
        edges = pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a_id, b_id in zip(edges["a"], edges["b"]):
        ra, rb = find(int(a_id)), find(int(b_id))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((v, find(v)) for v in parent)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "dup_of": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# text analysis: token counts, quality, language id, fingerprints
# ---------------------------------------------------------------------------

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been on at by for with".split()
)

# tiny per-language marker sets for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "in"},
    "de": {"der", "die", "das", "und", "ist"},
    "fr": {"le", "la", "les", "et", "est"},
    "es": {"el", "la", "los", "y", "es"},
}


def text_stats(docs: rd.Dataset, *, round_to: int = 6) -> rd.Dataset:
    """Token count (whitespace + BPE-ish word regex), char stats, quality
    ratios (punct/stopword/alpha), all vectorized per batch."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        toks = text.str.lower().str.findall(_TOKEN_RE)
        n_tokens = toks.map(len)
        n_chars = text.str.len()
        n_alpha = text.str.count(r"[A-Za-z]")
        # explicit ASCII classes so an RE2-based SQL oracle matches exactly
        n_punct = text.str.count(r"[^A-Za-z0-9_\s]")
        n_stop = toks.map(lambda ws: sum(w in STOPWORDS for w in ws))
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tokens.astype("int64"),
                "n_chars": n_chars.astype("int64"),
                "alpha_ratio": trunc6(n_alpha / n_chars.clip(lower=1)),
                "punct_ratio": trunc6(n_punct / n_chars.clip(lower=1)),
                "stopword_ratio": trunc6(n_stop / n_tokens.clip(lower=1)),
            }
        )
        return out

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def language_id(docs: rd.Dataset) -> rd.Dataset:
    """Marker-word language heuristic → (doc_id, lang_pred, lang_score)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        preds, scores = [], []
        for text in batch["text"].fillna(""):
            toks = _TOKEN_RE.findall(text.lower())
            tokset = toks if len(toks) < 64 else toks[:64]
            best_lang, best = "und", 0
            for lang in sorted(_LANG_MARKERS):
                hits = sum(t in _LANG_MARKERS[lang] for t in tokset)
                if hits > best:
                    best, best_lang = hits, lang
            preds.append(best_lang)
            scores.append(best)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "lang_pred": preds, "lang_score": scores}
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def fingerprint_md5(docs: rd.Dataset) -> rd.Dataset:
    """MD5 content fingerprint (oracle-friendly: DuckDB ``md5()``)."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps)})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def winnowing_fingerprints(
    docs: rd.Dataset, *, k: int = 5, window: int = 4
) -> rd.Dataset:
    """Winnowing document fingerprints (rolling k-gram hash, min per
    window) → (doc_id, fingerprints list) for plagiarism-style matching."""

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch["text"].to_pylist():
            s = (text or "").lower()
            if len(s) < k:
                out.append([])
                continue
            # polynomial rolling hash over chars
            base, mod = 257, _MERSENNE
            h = 0
            pw = pow(base, k - 1, mod)
            hashes = []
            for i, ch in enumerate(s):
                h = (h * base + ord(ch)) % mod
                if i >= k - 1:
                    hashes.append(h)
                    h = (h - ord(s[i - k + 1]) * pw) % mod
            arr = np.array(hashes, dtype=np.uint64)
            if arr.size <= window:
                out.append([int(arr.min())])
                continue
            mins = [
                int(arr[i : i + window].min())
                for i in range(arr.size - window + 1)
            ]
            dedup = sorted(set(mins))
            out.append(dedup)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprints": pa.array(out, pa.list_(pa.int64())),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )
