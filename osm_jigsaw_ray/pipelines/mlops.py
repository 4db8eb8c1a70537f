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

from .shuffle import grouped_map

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
            hashlib.blake2b((t or "").encode("utf-8"), digest_size=16).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        # partition on the hash itself: a content group lives wholly in
        # one partition, so per-partition min is exact — and the shuffle
        # cost is independent of distinct-text cardinality (which equals
        # the corpus size; Ray's sort-merge groupby pays ~2.4 ms/group)
        parts = [int(h[:8], 16) % _AGG_PARTS for h in hashes]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "content_hash": pa.array(hashes, pa.string()),
                "__part": pa.array(parts, pa.int32()),
            }
        )

    hashed = docs.select_columns(["doc_id", "text"]).map_batches(
        add_hash, batch_format="pyarrow"
    )

    def min_per_hash(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.groupby("content_hash", sort=False)["doc_id"]
            .min()
            .reset_index()[["content_hash", "doc_id"]]
        )

    return grouped_map(
        hashed,
        "__part",
        min_per_hash,
        num_partitions=_AGG_PARTS,
        batch_format="pandas",
        whole_partition=True,  # sub-groups by content_hash itself
    )


# ---------------------------------------------------------------------------
# shingles / minhash machinery
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _tokenize_batch(texts) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Batch tokenizer for the corpus-scale kernels: one Arrow
    ``utf8_lower`` + the byte-level ``[a-z0-9]+`` split
    (:func:`..stages.enrich.split_alnum_tokens` — exactly the old RE2
    ``split_pattern_regex`` minus its boundary EMPTY tokens, at ~10x
    the kernel cost), dictionary-encoded. Returns ``(doc, idx, denc)``
    where ``doc[i]`` is the row index and ``idx[i]`` the dictionary
    index of flat token i. Only REAL tokens appear (callers' legacy
    empty-token drops are now no-ops, kept for robustness). Token-
    equivalent to ``_TOKEN_RE.findall(text.lower())`` (pinned by
    ``test_tfidf_kernels_match_rowwise``)."""
    from ..stages.enrich import split_alnum_tokens

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(pc.fill_null(texts, ""))
    flat, off = split_alnum_tokens(low)
    denc = pc.dictionary_encode(flat)
    idx = np.asarray(denc.indices, dtype=np.int64)
    doc = np.repeat(np.arange(len(off) - 1, dtype=np.int64), np.diff(off))
    return doc, idx, denc


def _token_shingles(text: str, k: int = 3) -> set[str]:
    """Distinct k-token shingles as space-joined STRINGS. String shingles
    (not hashes) are the Jaccard domain so a SQL oracle can recompute the
    exact same sets with ``regexp_extract_all`` + list comprehensions."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        toks = toks + ["\x00"] * (k - len(toks))
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _token_shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-token shingles → sorted distinct 61-bit hashes (one blake2b per
    shingle string) — the numeric domain MinHash permutes over."""
    sh = _token_shingles(text, k)
    out = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
            )
            % _MERSENNE
            for s in sh
        ),
        dtype=np.uint64,
        count=len(sh),
    )
    return np.unique(out)


def _minhash_params(num_perm: int, seed: int = 1234):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_M61 = np.uint64(_MERSENNE)
_LO31 = np.uint64((1 << 31) - 1)
_LO30 = np.uint64((1 << 30) - 1)


def _mod61(x: np.ndarray) -> np.ndarray:
    """x mod (2^61-1) for x < 2^62 (one fold suffices)."""
    x = (x & _M61) + (x >> np.uint64(61))
    return np.where(x >= _M61, x - _M61, x)


def _modmul61(a: np.ndarray, s: np.ndarray) -> np.ndarray:
    """(a * s) mod (2^61-1), fully in uint64: split both operands into
    31-bit halves so every partial product stays below 2^62, and use
    2^62 ≡ 2, x·2^31 ≡ (x>>30) + (x & (2^30-1))·2^31 (mod 2^61-1)."""
    ah, al = a >> np.uint64(31), a & _LO31
    sh, sl = s >> np.uint64(31), s & _LO31
    top = _mod61(np.uint64(2) * _mod61(ah * sh))
    mid = _mod61(ah * sl + al * sh)
    mid = _mod61((mid >> np.uint64(30)) + ((mid & _LO30) << np.uint64(31)))
    return _mod61(top + mid + _mod61(al * sl))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (wrap-around uint64)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _minhash(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if shingles.size == 0:
        return np.full(a.size, _MERSENNE, dtype=np.uint64)
    # (num_perm, n_shingles) vectorized modmul — the object-dtype bignum
    # version cost ~4.5 s per 5k docs; this runs at numpy speed
    vals = _mod61(_modmul61(a[:, None], shingles[None, :]) + b[:, None])
    return np.min(vals, axis=1)


def _batch_shingle_pairs(
    texts: pa.ChunkedArray | pa.Array, k: int
) -> tuple[
    int, np.ndarray, np.ndarray, np.ndarray, list, np.ndarray, np.ndarray
]:
    """Whole-batch dictionary-encoded shingling (the ``stages/enrich.py``
    pattern shared by :class:`MinHasher` and :func:`decontaminate`):
    ONE byte-level ``[a-z0-9]+`` split (``split_alnum_tokens``),
    dictionary-encode the token stream, enumerate k-gram shingles as integer index tuples,
    ``np.unique`` them batch-wide, and distinct them per doc. Shingle
    semantics are exactly :func:`_token_shingles` (lowercase
    ``[a-z0-9]+`` tokens, short docs NUL-pad to one shingle).

    Returns ``(n_docs, pair_doc, pair_uid, uniq_sh, tokens, n_sh,
    pair_counts)`` where the per-doc distinct (doc, shingle) pairs are
    ``(pair_doc[i], uniq_sh[pair_uid[i]])`` occurring ``pair_counts[i]``
    times in the doc, sorted by doc, ``uniq_sh`` rows are dictionary
    indices into ``tokens``, and ``n_sh[d]`` is doc d's TOTAL
    (with-repeats) shingle count."""
    from ..stages.enrich import split_alnum_tokens

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(pc.fill_null(texts, ""))
    # byte-level split: identical to the old regex split minus its
    # boundary empty tokens, so the artifact-drop below is a no-op
    # (kept — it also guards a future tokenizer swap)
    flat_tokens, flat_off = split_alnum_tokens(low)
    denc = pc.dictionary_encode(flat_tokens)
    idx_all = np.asarray(denc.indices, dtype=np.int64)
    tokens: list[str] = denc.dictionary.to_pylist()
    n = len(flat_off) - 1

    # drop split artifacts (empty boundary tokens) and re-segment
    tok_is_real = np.array([len(t) > 0 for t in tokens], dtype=bool)
    keep = tok_is_real[idx_all] if idx_all.size else np.zeros(0, bool)
    tok_idx = idx_all[keep]
    kept = keep.astype(np.int64)
    csum = np.zeros(kept.size + 1, dtype=np.int64)
    np.cumsum(kept, out=csum[1:])
    m = csum[flat_off[1:]] - csum[flat_off[:-1]]  # real tokens per doc
    starts = csum[flat_off[:-1]]

    pad_idx = len(tokens)  # "\x00" pad token (never a real token)
    tokens.append("\x00")

    # shingle enumeration: doc i emits max(m_i - k + 1, 1) shingles
    # (short docs pad to one shingle, matching _token_shingles)
    n_sh = np.maximum(m - k + 1, 1)
    total = int(n_sh.sum())
    rows = np.repeat(np.arange(n, dtype=np.int64), n_sh)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(n_sh) - n_sh, n_sh
    )
    base = starts[rows] + within
    cols = np.empty((total, k), dtype=np.int64)
    m_rows = m[rows]
    hi = max(tok_idx.size - 1, 0)
    for j in range(k):
        pos = np.clip(base + j, 0, hi)
        got = tok_idx[pos] if tok_idx.size else np.zeros(total, np.int64)
        cols[:, j] = np.where(within + j < m_rows, got, pad_idx)

    # batch-unique shingles: pack the k dictionary indices into one
    # int64 when they fit (they essentially always do), else fall
    # back to row-wise unique
    bits = max(int(pad_idx + 1).bit_length(), 1)
    if bits * k <= 63:
        packed = np.zeros(total, dtype=np.int64)
        for j in range(k):
            packed = (packed << bits) | cols[:, j]
        uniq_keys, inv = np.unique(packed, return_inverse=True)
        mask = (1 << bits) - 1
        uniq_sh = np.empty((uniq_keys.size, k), dtype=np.int64)
        for j in range(k - 1, -1, -1):
            uniq_sh[:, j] = uniq_keys & mask
            uniq_keys = uniq_keys >> bits
    else:
        uniq_sh, inv = np.unique(cols, axis=0, return_inverse=True)
        # numpy 2.0.x returns the axis-unique inverse shaped (total, 1)
        # (numpy gh-26738); flatten so the OR below can't broadcast to
        # a (total, total) matrix
        inv = np.asarray(inv).reshape(-1)

    # per-doc distinct shingles: unique (doc, shingle) pairs, sorted
    # by doc (np.unique sorts), so reduceat segments are contiguous
    pair, pair_counts = np.unique(
        (rows << 32) | inv.astype(np.int64), return_counts=True
    )
    pair_doc = pair >> 32
    pair_uid = (pair & 0xFFFFFFFF).astype(np.int64)
    return n, pair_doc, pair_uid, uniq_sh, tokens, n_sh, pair_counts


class MinHasher:
    """Actor stage: documents → (band_id, band_hash, doc_id) LSH rows.

    Dictionary-at-the-core vectorization (the ``stages/enrich.py``
    pattern): tokenize the whole batch with the
    byte-level ``[a-z0-9]+`` split, dictionary-encode the token stream, form
    k-gram shingles as packed integer tuples of dictionary indices, and
    ``np.unique`` them batch-wide — blake2b runs once per NEW unique
    shingle string (cached across batches), never per occurrence. The
    (perm × shingle) modmul and the per-doc mins run as chunked numpy
    matrices with one ``minimum.reduceat`` per chunk. Hash values are
    bit-identical to the original per-doc path (same shingle strings,
    same blake2b, same permutations) — pinned by
    ``test_mlops.py::test_minhasher_matches_rowwise_reference``."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_k = shingle_k
        self._sh_cache: dict[str, int] = {}

    def _shingle_hashes(self, text: str) -> np.ndarray:
        """Per-doc scalar path (kept for the rowwise-reference test)."""
        sh = _token_shingles(text or "", self.shingle_k)
        cache = self._sh_cache
        out = np.empty(len(sh), dtype=np.uint64)
        for i, s in enumerate(sh):
            h = cache.get(s)
            if h is None:
                h = (
                    int.from_bytes(
                        hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
                    )
                    % _MERSENNE
                )
                if len(cache) < 2_000_000:
                    cache[s] = h
            out[i] = h
        return np.unique(out)

    def _hash_unique_shingles(
        self, uniq_sh: np.ndarray, tokens: list[str]
    ) -> np.ndarray:
        """blake2b % mersenne per unique shingle tuple (batch-deduped;
        string-keyed cache carries across batches)."""
        cache = self._sh_cache
        out = np.empty(len(uniq_sh), dtype=np.uint64)
        for i, tup in enumerate(uniq_sh):
            s = " ".join(tokens[t] for t in tup)
            h = cache.get(s)
            if h is None:
                h = (
                    int.from_bytes(
                        hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
                    )
                    % _MERSENNE
                )
                if len(cache) < 2_000_000:
                    cache[s] = h
            out[i] = h
        return out

    def _doc_minhash_matrix(self, texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
        """texts → (n_docs, num_perm) minhash signature matrix."""
        n, pair_doc, pair_uid, uniq_sh, tokens, _, _ = _batch_shingle_pairs(
            texts, self.shingle_k
        )
        h_u = self._hash_unique_shingles(uniq_sh, tokens)
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        h_pairs = h_u[pair_uid]
        seg_starts = np.searchsorted(pair_doc, np.arange(n, dtype=np.int64))

        mh = np.empty((n, self.num_perm), dtype=np.uint64)
        chunk = 8  # bounds the (perm_chunk × pairs) temporaries
        for p0 in range(0, self.num_perm, chunk):
            p1 = min(p0 + chunk, self.num_perm)
            vals = _mod61(
                _modmul61(self.a[p0:p1, None], h_pairs[None, :])
                + self.b[p0:p1, None]
            )
            mh[:, p0:p1] = np.minimum.reduceat(vals, seg_starts, axis=1).T
        return mh

    def __call__(self, batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mh = self._doc_minhash_matrix(batch["text"])
        n = dids.size
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n)
        doc_ids = np.repeat(dids, self.bands)
        # vectorized band fold over the (n, bands, rows) signature view —
        # splitmix64 absorb per row value (was a per-(doc,band) blake2b
        # loop, the last per-row Python on this path). Band hashes are
        # internal bucket keys: candidates pass an EXACT verify stage
        # downstream, so the only requirement is determinism + good
        # mixing, not any particular digest.
        segs = mh.reshape(n, self.bands, self.rows)
        h = np.full((n, self.bands), np.uint64(0x9E3779B97F4A7C15))
        with np.errstate(over="ignore"):
            for j in range(self.rows):  # rows per band is tiny (e.g. 4)
                h = _mix64(h ^ segs[:, :, j])
        band_hashes = (h >> np.uint64(1)).astype(np.int64).reshape(-1)
        return pa.table(
            {
                "band_id": pa.array(band_ids),
                "band_hash": pa.array(band_hashes),
                "doc_id": pa.array(doc_ids),
            }
        )


# partition-column trick used throughout this module: Ray's sort-merge
# groupby spends ~2.4 ms of Python PER GROUP, so high-cardinality
# groupbys route the shuffle through `key % _AGG_PARTS` (a handful of
# groups) and run the real per-key work vectorized inside each group
_AGG_PARTS = 64


def _star_expand_partitioned(band_rows: rd.Dataset) -> rd.Dataset:
    """(band_id, band_hash, doc_id) rows → candidate (a, b) star pairs
    per bucket, shuffling on band_hash % _AGG_PARTS with a vectorized
    within-partition expansion (no per-bucket Python groups)."""

    def tag(batch: pa.Table) -> pa.Table:
        part = (
            batch["band_hash"].to_numpy(zero_copy_only=False) % _AGG_PARTS
        ).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def expand(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["band_id", "band_hash", "doc_id"], kind="stable")
        bh = g[["band_id", "band_hash"]].to_numpy()
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = np.any(bh[1:] != bh[:-1], axis=1)
        grp_id = np.cumsum(new) - 1
        doc = g["doc_id"].to_numpy(dtype=np.int64)
        reps = doc[np.flatnonzero(new)][grp_id]
        mask = ~new  # non-first rows pair with their bucket's min doc
        return pd.DataFrame(
            {
                "a": pd.Series(reps[mask], dtype=np.int64),
                "b": pd.Series(doc[mask], dtype=np.int64),
            }
        )

    return grouped_map(
        band_rows.map_batches(tag, batch_format="pyarrow"),
        "__part",
        expand,
        num_partitions=_AGG_PARTS,
        batch_format="pandas",
        whole_partition=True,  # re-sorts by (band_id, band_hash) itself
    )


def _dedup_pairs_partitioned(pairs: rd.Dataset) -> rd.Dataset:
    """DISTINCT over (a, b) rows with cardinality-independent shuffle
    cost: a pair's identity hashes wholly into one of ``_AGG_PARTS``
    partitions, so per-partition ``drop_duplicates`` is exact — unlike
    ``groupby(["a","b"])``, whose sort-merge pays ~2.4 ms of Python per
    distinct PAIR (candidate pairs scale with the corpus)."""

    def tag(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (
            (a * np.uint64(0x9E3779B97F4A7C15) + b) % np.uint64(_AGG_PARTS)
        ).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def distinct(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["a", "b"])[["a", "b"]]

    return grouped_map(
        pairs.map_batches(tag, batch_format="pyarrow"),
        "__part",
        distinct,
        num_partitions=_AGG_PARTS,
        batch_format="pandas",
        whole_partition=True,  # drop_duplicates is set-semantics in-block
    )


def _ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = _token_shingles(a, k)
    sb = _token_shingles(b, k)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def _neutral(n: int, typ: pa.DataType) -> pa.Array:
    """Unused-slot filler that is NOT null: pandas converts an Arrow
    int64-with-nulls column to float64, which silently corrupts
    values beyond 2^53 (simhash signatures are ~2^62)."""
    if pa.types.is_integer(typ) or pa.types.is_floating(typ):
        return pa.array(np.zeros(n, dtype=typ.to_pandas_dtype()), typ)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.array([""] * n, typ)
    return pa.nulls(n, typ)


def attach_doc_columns(
    items: rd.Dataset,
    docs: rd.Dataset,
    *,
    key_cols: list[str],
    doc_key: str = "doc_id",
    doc_val: str = "text",
    out_cols: list[str],
    max_prefilter_keys: int = 20_000_000,
    max_broadcast_bytes: int = 64 << 20,
) -> rd.Dataset:
    """Distributed lookup join: ``items[out_cols[i]] = docs[doc_val]``
    where ``items[key_cols[i]] == docs[doc_key]`` (missing keys get "").

    Scale shape: the corpus is pre-filtered map-side against the item
    key set held as ONE sorted int64 numpy array (8 B/key, vectorized
    ``np.isin``) — shared across every key column, so the corpus is
    scanned ONCE however many columns attach. Past
    ``max_prefilter_keys`` (default 20M keys = 160 MB) the prefilter is
    skipped entirely — the union+groupby co-partition below is
    key-set-free and stays exact, the corpus just shuffles unfiltered —
    so no driver- or worker-held structure ever exceeds the cap. Values
    co-partition with items through one union+groupby hash shuffle per
    key column; no driver-side text materialization, and no
    ``Dataset.join`` (its empty hash partitions lose the schema on
    small inputs)."""
    # normalize to Arrow blocks (upstream pandas-block ops like
    # map_groups leave a PandasBlockSchema with no Arrow field types);
    # materialize items — executed for the key pass AND the union pass,
    # and items are small by contract
    items = items.map_batches(lambda b: b, batch_format="pyarrow").materialize()
    docs = docs.map_batches(lambda b: b, batch_format="pyarrow")

    key_parts: list[np.ndarray] = []
    n_keys = 0
    for blk in items.select_columns(list(key_cols)).iter_batches(
        batch_format="pyarrow"
    ):
        for c in key_cols:
            key_parts.append(
                blk[c].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            n_keys += len(blk)
        if n_keys > max_prefilter_keys:
            break
    keys_ref = None
    if n_keys <= max_prefilter_keys:
        keys = (
            np.unique(np.concatenate(key_parts))
            if key_parts
            else np.empty(0, np.int64)
        )
        if keys.size <= max_prefilter_keys:
            keys_ref = ray.put(keys)
    if keys_ref is None:
        import warnings

        warnings.warn(
            f"attach_doc_columns: > {max_prefilter_keys} item keys — "
            "skipping the map-side corpus prefilter (exact, but the full "
            "doc column shuffles)",
            RuntimeWarning,
            stacklevel=2,
        )

    val_field = docs.schema().base_schema.field(doc_val)

    def doc_filter(batch: pa.Table) -> pa.Table:
        sub = batch
        if keys_ref is not None:
            ids = batch[doc_key].to_numpy(zero_copy_only=False).astype(np.int64)
            sub = batch.filter(pa.array(np.isin(ids, ray.get(keys_ref))))
        return pa.table(
            {
                "__key": pc.cast(sub[doc_key], pa.int64()),
                "__val": sub[doc_val],
                "__is_doc": pa.array([True] * len(sub), pa.bool_()),
            }
        )

    # ONE corpus scan shared by every key column's shuffle
    needed = (
        docs.select_columns([doc_key, doc_val])
        .map_batches(doc_filter, batch_format="pyarrow")
        .materialize()
    )

    empty_val = (
        ""
        if pa.types.is_string(val_field.type)
        or pa.types.is_large_string(val_field.type)
        else None
    )

    # bounded broadcast fast path: when the FILTERED doc values fit the
    # cap (candidate-sized by construction when the prefilter ran), one
    # shared lookup object + one map pass attaches every column — no
    # shuffle at all. Past the cap the exact union+groupby co-partition
    # below takes over, so nothing unbounded is ever broadcast.
    if keys_ref is not None and (needed.size_bytes() or 0) <= max_broadcast_bytes:
        lk = pa.concat_tables(
            ray.get(needed.to_arrow_refs()), promote_options="default"
        )
        k_arr = lk["__key"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k_arr, kind="stable")
        lookup_ref = ray.put(
            (k_arr[order], lk["__val"].combine_chunks().take(pa.array(order)))
        )

        def map_attach(batch: pa.Table) -> pa.Table:
            ks, vals = ray.get(lookup_ref)
            out = batch
            for key_col, out_col in zip(key_cols, out_cols):
                ids = (
                    pc.cast(batch[key_col], pa.int64())
                    .to_numpy(zero_copy_only=False)
                )
                pos = np.searchsorted(ks, ids)
                safe = np.minimum(pos, max(ks.size - 1, 0))
                found = (pos < ks.size) & (ks[safe] == ids) if ks.size else np.zeros(len(batch), bool)
                idx = pa.array(
                    np.where(found, safe, -1), pa.int64(), mask=~found
                )
                col = vals.take(idx)
                if empty_val is not None:
                    col = pc.fill_null(col, empty_val)
                out = out.append_column(out_col, col)
            return out

        return items.map_batches(map_attach, batch_format="pyarrow")

    cur = items
    for key_col, out_col in zip(key_cols, out_cols):
        item_fields = [
            (n, cur.schema().base_schema.field(n).type)
            for n in cur.schema().names
        ]

        def item_side(batch: pa.Table, _key_col=key_col) -> pa.Table:
            key = pc.cast(batch[_key_col], pa.int64())
            part = (key.to_numpy(zero_copy_only=False) % _AGG_PARTS).astype(
                np.int32
            )
            out = pa.table(
                {
                    "__key": key,
                    "__part": pa.array(part),
                    "__val": _neutral(len(batch), val_field.type),
                    "__is_doc": pa.array([False] * len(batch), pa.bool_()),
                }
            )
            for name in batch.column_names:
                out = out.append_column("i_" + name, batch[name])
            return out

        def doc_side_pad(batch: pa.Table, _fields=item_fields) -> pa.Table:
            part = (
                batch["__key"].to_numpy(zero_copy_only=False) % _AGG_PARTS
            ).astype(np.int32)
            out = batch.append_column("__part", pa.array(part))
            for name, typ in _fields:
                out = out.append_column("i_" + name, _neutral(len(batch), typ))
            return out

        unioned = cur.map_batches(item_side, batch_format="pyarrow").union(
            needed.map_batches(doc_side_pad, batch_format="pyarrow")
        )

        def resolve(
            group: pd.DataFrame, _fields=item_fields, _out_col=out_col
        ) -> pd.DataFrame:
            # vectorized within the hash partition: one pandas merge
            # joins every item row in the partition to its doc value
            doc_rows = group[group["__is_doc"]][["__key", "__val"]]
            it = group[~group["__is_doc"]]
            out = pd.DataFrame(
                {name: it["i_" + name].to_numpy() for name, _ in _fields}
            )
            out["__key"] = it["__key"].to_numpy(dtype=np.int64)
            merged = out.merge(doc_rows, on="__key", how="left")
            merged[_out_col] = merged["__val"]
            if empty_val is not None:
                merged[_out_col] = merged[_out_col].fillna(empty_val)
            return merged.drop(columns=["__key", "__val"])

        cur = grouped_map(
            unioned,
            "__part",
            resolve,
            num_partitions=_AGG_PARTS,
            batch_format="pandas",
            whole_partition=True,  # resolve merges on __key in-block
        )
        if out_col != out_cols[-1]:
            cur = cur.map_batches(
                lambda b: b, batch_format="pyarrow"
            ).materialize()

    return cur


def attach_doc_column(
    items: rd.Dataset,
    docs: rd.Dataset,
    *,
    key_col: str,
    doc_key: str = "doc_id",
    doc_val: str = "text",
    out_col: str,
) -> rd.Dataset:
    """Single-column convenience wrapper over :func:`attach_doc_columns`."""
    return attach_doc_columns(
        items,
        docs,
        key_cols=[key_col],
        doc_key=doc_key,
        doc_val=doc_val,
        out_cols=[out_col],
    )


def min_label_components(
    edges: rd.Dataset, *, node_col: str = "node", label_col: str = "label",
    max_rounds: int = 25, single_task_threshold: int = 5_000_000,
) -> rd.Dataset:
    """Connected components of an (a, b) edge list.

    Size-aware: a verified near-dup edge list is normally orders of
    magnitude smaller than the corpus, so below
    ``single_task_threshold`` edges the components run as ONE Ray task
    (exact union-find over a single coalesced block — worker-side, not
    driver-side). Past the threshold, distributed min-label propagation
    takes over: per round every node's label flows across its edges and
    each node keeps the minimum seen (partition-hashed union +
    vectorized groupby-Min; convergence via a strictly-decreasing
    label-sum aggregate). Returns (node_col, label_col) for every node
    appearing in an edge; label = smallest node id of its component."""
    from ray.data.aggregate import Sum

    n_edges = edges.count()
    if n_edges <= single_task_threshold:

        def components_block(batch: pa.Table) -> pa.Table:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a_id, b_id in zip(
                batch["a"].to_pylist(), batch["b"].to_pylist()
            ):
                ra, rb = find(int(a_id)), find(int(b_id))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            rows = sorted((v, find(v)) for v in parent)
            return pa.table(
                {
                    node_col: pa.array([r[0] for r in rows], pa.int64()),
                    label_col: pa.array([r[1] for r in rows], pa.int64()),
                }
            )

        return edges.repartition(1).map_batches(
            components_block, batch_format="pyarrow", batch_size=None
        )

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch["a"], pa.int64())
        b = pc.cast(batch["b"], pa.int64())
        return pa.table(
            {
                "u": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "v": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def _tag(col):
        def fn(batch: pa.Table) -> pa.Table:
            part = (
                batch[col].to_numpy(zero_copy_only=False) % _AGG_PARTS
            ).astype(np.int32)
            return batch.append_column("__part", pa.array(part))

        return fn

    # seed label = min(u, min neighbor) — partition-hashed, not
    # groupby("u") (node cardinality scales with the corpus)
    def seed_min(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("u", sort=False)["v"].min().reset_index()
        u = g["u"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"u": u, "label": np.minimum(u, g["v"].to_numpy(dtype=np.int64))}
        )

    lab = grouped_map(
        sym.map_batches(_tag("u"), batch_format="pyarrow"),
        "__part",
        seed_min,
        num_partitions=_AGG_PARTS,
        batch_format="pandas",
        whole_partition=True,  # sub-groups by u itself
    ).materialize()

    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        # round = two partition-hashed shuffles, both vectorized inside
        # their groups: (1) labels merge onto edges by u and flow to v,
        # (2) every node keeps its minimum incoming label
        lab_rows = lab.map_batches(
            lambda b: pa.table(
                {
                    "u": b["u"],
                    "v": pa.nulls(len(b), pa.int64()),
                    "label": b["label"],
                    "is_lab": pa.array([True] * len(b), pa.bool_()),
                }
            ),
            batch_format="pyarrow",
        )
        edge_rows = sym.map_batches(
            lambda b: pa.table(
                {
                    "u": b["u"],
                    "v": b["v"],
                    "label": pa.nulls(len(b), pa.int64()),
                    "is_lab": pa.array([False] * len(b), pa.bool_()),
                }
            ),
            batch_format="pyarrow",
        )

        def flow(group: pd.DataFrame) -> pd.DataFrame:
            labs = group[group["is_lab"]][["u", "label"]]
            er = group[~group["is_lab"]][["u", "v"]]
            flowed = er.merge(labs, on="u", how="left")
            miss = flowed["label"].isna()
            if miss.any():
                flowed.loc[miss, "label"] = flowed.loc[miss, "u"]
            return pd.DataFrame(
                {
                    "u": pd.concat(
                        [flowed["v"], labs["u"]], ignore_index=True
                    ).astype(np.int64),
                    "label": pd.concat(
                        [flowed["label"], labs["label"]], ignore_index=True
                    ).astype(np.int64),
                }
            )

        def min_label(group: pd.DataFrame) -> pd.DataFrame:
            g = (
                group.groupby("u", sort=False)["label"].min().reset_index()
            )
            return g

        flowed = grouped_map(
            lab_rows.union(edge_rows).map_batches(
                _tag("u"), batch_format="pyarrow"
            ),
            "__part",
            flow,
            num_partitions=_AGG_PARTS,
            batch_format="pandas",
            whole_partition=True,  # flow merges labs/edges on u in-block
        )
        lab = grouped_map(
            flowed.map_batches(_tag("u"), batch_format="pyarrow"),
            "__part",
            min_label,
            num_partitions=_AGG_PARTS,
            batch_format="pandas",
            whole_partition=True,  # sub-groups by u itself
        ).materialize()
        s_rows = lab.aggregate(Sum("label"))
        s = s_rows["sum(label)"]
        if prev_sum is not None and s == prev_sum:
            converged = True
            break
        prev_sum = s

    if not converged:
        # a component chain longer than max_rounds hops would be split
        # silently into several components — warn loudly instead
        import warnings

        warnings.warn(
            f"min_label_components: labels did not converge within "
            f"{max_rounds} rounds; components with diameter > {max_rounds} "
            f"are split — raise max_rounds",
            RuntimeWarning,
            stacklevel=2,
        )

    return lab.map_batches(
        lambda b: pa.table(
            {node_col: pc.cast(b["u"], pa.int64()), label_col: pc.cast(b["label"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


_EMPTY_CLUSTERS = pa.table(
    {"doc_id": pa.array([], pa.int64()), "dup_of": pa.array([], pa.int64())}
)


def minhash_lsh_dedup(
    docs: rd.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    concurrency: int | tuple | None = None,
) -> rd.Dataset:
    """MinHash+LSH near-dup: shingle→minhash→band rows →
    ``groupby(band)`` buckets → candidate pairs → exact n-gram Jaccard
    verify → min-label clusters. Returns (doc_id, dup_of) for docs in a
    near-dup cluster (dup_of = smallest doc_id in cluster, including the
    representative row itself), sorted by doc_id.

    Every stage is distributed: candidate pairs join BACK to the corpus
    for their texts (:func:`attach_doc_column` — only the candidate id
    set broadcasts), verification runs in ``map_batches``, and
    clustering is groupby-Min label propagation
    (:func:`min_label_components`). Nothing corpus-sized touches the
    driver."""
    slim = docs.select_columns(["doc_id", "text"])
    band_rows = slim.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands},
        # autoscaling pool: the dictionary-vectorized hasher is cheap per
        # batch, so let the stage grab idle CPUs instead of pinning 2
        concurrency=concurrency if concurrency is not None else (1, 16),
        batch_format="pyarrow",
    )

    candidates = _star_expand_partitioned(band_rows)
    # distributed pair dedup (bands repeat pairs): partition-hashed
    # distinct — per-pair-group Python would scale with the corpus
    candidates = _dedup_pairs_partitioned(candidates).materialize()
    if candidates.count() == 0:
        return rd.from_arrow(_EMPTY_CLUSTERS)

    with_ab = attach_doc_columns(
        candidates, slim, key_cols=["a", "b"], out_cols=["text_a", "text_b"]
    )

    def verify(batch: pa.Table) -> pa.Table:
        keep_a, keep_b = [], []
        for a_id, b_id, ta, tb in zip(
            batch["a"].to_pylist(),
            batch["b"].to_pylist(),
            batch["text_a"].to_pylist(),
            batch["text_b"].to_pylist(),
        ):
            if _ngram_jaccard(ta or "", tb or "") >= threshold:
                keep_a.append(a_id)
                keep_b.append(b_id)
        return pa.table(
            {"a": pa.array(keep_a, pa.int64()), "b": pa.array(keep_b, pa.int64())}
        )

    verified = with_ab.map_batches(verify, batch_format="pyarrow").materialize()
    if verified.count() == 0:
        return rd.from_arrow(_EMPTY_CLUSTERS)
    return min_label_components(
        verified, node_col="doc_id", label_col="dup_of"
    ).sort("doc_id")


def minhash_signature_dedup(
    docs: rd.Dataset, *, num_perm: int = 64, concurrency: int | tuple = (1, 16)
) -> rd.Dataset:
    """LSH-accelerated shingle-set dedup — the fully-oracle-checkable
    member of the MinHash family: docs bucket by their FULL minhash
    signature (``bands=1``; identical shingle sets always share it),
    candidate buckets join back to the corpus for texts, and an exact
    per-bucket verify groups members by their literal shingle set.
    Returns (doc_id, dup_of = smallest doc_id with the same k-token
    shingle set), representative included, sorted — exactly what a SQL
    oracle computes by grouping on the sorted-distinct shingle list.

    Unlike the banded near-dup path (:func:`minhash_lsh_dedup`), no
    cluster edge ever crosses a bucket (equal sets ⇒ equal signature),
    so correctness needs no connectivity argument."""
    slim = docs.select_columns(["doc_id", "text"])
    band_rows = slim.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": 1},
        concurrency=concurrency,
        batch_format="pyarrow",
    )

    def tag(batch: pa.Table) -> pa.Table:
        part = (
            batch["band_hash"].to_numpy(zero_copy_only=False) % _AGG_PARTS
        ).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def bucket_members(group: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the hash partition: keep rows whose full
        # signature (band_hash, bands=1) repeats
        g = group.sort_values(["band_hash", "doc_id"], kind="stable")
        bh = g["band_hash"].to_numpy(dtype=np.int64)
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = bh[1:] != bh[:-1]
        grp_id = np.cumsum(new) - 1
        sizes = np.bincount(grp_id)
        keep = sizes[grp_id] >= 2
        return pd.DataFrame(
            {
                "bucket": pd.Series(bh[keep], dtype=np.int64),
                "doc_id": pd.Series(
                    g["doc_id"].to_numpy(dtype=np.int64)[keep], dtype=np.int64
                ),
            }
        )

    members = grouped_map(
        band_rows.map_batches(tag, batch_format="pyarrow"),
        "__part",
        bucket_members,
        num_partitions=_AGG_PARTS,
        batch_format="pandas",
        whole_partition=True,  # re-sorts by band_hash itself
    ).materialize()
    if members.count() == 0:
        return rd.from_arrow(_EMPTY_CLUSTERS)

    with_text = attach_doc_column(
        members, slim, key_col="doc_id", out_col="text"
    )

    def part_tag(batch: pa.Table) -> pa.Table:
        part = (
            batch["bucket"].to_numpy(zero_copy_only=False) % _AGG_PARTS
        ).astype(np.int32)
        return batch.append_column("__vpart", pa.array(part))

    def verify_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # a hash partition may hold several buckets; grouping by literal
        # shingle set is still per-bucket-exact (equal sets ⇒ equal
        # signature ⇒ same bucket)
        by_set: dict[frozenset, list[int]] = {}
        for did, text in zip(group["doc_id"], group["text"]):
            by_set.setdefault(frozenset(_token_shingles(text or "")), []).append(
                int(did)
            )
        out_d, out_r = [], []
        for ids in by_set.values():
            if len(ids) < 2:
                continue
            rep = min(ids)
            for d in sorted(ids):
                out_d.append(d)
                out_r.append(rep)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_d, dtype=np.int64),
                "dup_of": pd.Series(out_r, dtype=np.int64),
            }
        )

    return grouped_map(
        with_text.map_batches(part_tag, batch_format="pyarrow"),
        "__vpart",
        verify_bucket,
        num_partitions=_AGG_PARTS,
        batch_format="pandas",
        whole_partition=True,  # groups by literal shingle set itself
    ).sort("doc_id")


def ngram_jaccard_pairs(
    docs: rd.Dataset, pairs: list[tuple[int, int]], *, shingle_k: int = 3
) -> rd.Dataset:
    """Exact token-n-gram Jaccard for explicit document pairs (the verify
    primitive of the near-dup family, exposed standalone). Pair texts
    come from a distributed join-back to the corpus
    (:func:`attach_doc_column`), scored in parallel batches."""
    pair_ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.int64()),
                "b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )
    slim = docs.select_columns(["doc_id", "text"])
    with_ab = attach_doc_columns(
        pair_ds, slim, key_cols=["a", "b"], out_cols=["text_a", "text_b"]
    )

    def score(batch: pa.Table) -> pa.Table:
        sims = [
            float(trunc6(_ngram_jaccard(ta or "", tb or "", shingle_k)))
            for ta, tb in zip(
                batch["text_a"].to_pylist(), batch["text_b"].to_pylist()
            )
        ]
        return pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "jaccard": pa.array(sims, pa.float64()),
            }
        )

    return with_ab.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def _md5_u64(s: str) -> int:
    """First 8 bytes of md5 as a big-endian uint64 — chosen over blake2b
    because a DuckDB oracle can recompute it exactly:
    ``CAST(concat('0x', substr(md5(x), 1, 16)) AS UBIGINT)``."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def simhash_signatures(docs: rd.Dataset) -> rd.Dataset:
    """64-bit SimHash per document (md5 token-hash bit voting; duplicate
    tokens vote once per occurrence). Output keeps bits 1..63 of the
    signature (``>> 1``) so it stays in int64 — mirrored by the SQL
    oracle bit-for-bit.

    Vectorized: the shared dictionary-encode tokenizer
    (:func:`_tokenize_batch`) yields per-doc dictionary-index sequences,
    md5 runs once per batch-UNIQUE token (the dictionary), the ±1 bit
    votes expand to an int8 (tokens × 64) matrix, and per-doc vote sums
    come from one prefix-sum + two ``searchsorted`` bound lookups — no
    per-token Python. Inner chunking bounds the vote matrix; row-wise
    equivalence pinned by ``test_simhash_kernel_matches_rowwise``."""
    bitcols = np.arange(64, dtype=np.uint64)
    _CHUNK_TOKENS = 1 << 19  # ~32 MB int8 votes + ~256 MB int64 prefix cap

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        doc, idx, denc = _tokenize_batch(batch["text"])
        dict_arr = denc.dictionary
        tok_len = pc.binary_length(dict_arr).to_numpy(zero_copy_only=False)
        keep = tok_len[idx] > 0  # drop split-artifact empty tokens
        doc, idx = doc[keep], idx[keep]
        # md5 once per unique dictionary token (not per occurrence)
        h = np.fromiter(
            (_md5_u64(t) for t in dict_arr.to_pylist()),
            dtype=np.uint64,
            count=len(dict_arr),
        )
        tokvotes = (
            2 * ((h[:, None] >> bitcols[None, :]) & np.uint64(1)).astype(np.int8)
            - 1
        )  # unique-tokens × 64, ±1
        sigs = np.zeros(n, dtype=np.uint64)
        # chunk on doc boundaries so the per-occurrence matrices stay
        # bounded regardless of batch/doc size
        starts = np.searchsorted(doc, np.arange(n))
        bounds = np.append(starts, doc.size)
        row = 0
        while row < n:
            end = row + 1
            while end < n and bounds[end + 1] - bounds[row] <= _CHUNK_TOKENS:
                end += 1
            a, b = bounds[row], bounds[end]
            tv = tokvotes[idx[a:b]]  # occurrences × 64
            cs = np.zeros((tv.shape[0] + 1, 64), dtype=np.int64)
            np.cumsum(tv, axis=0, out=cs[1:])
            lo = bounds[row : end + 1][:-1] - a
            hi = bounds[row : end + 1][1:] - a
            votes = cs[hi] - cs[lo]  # docs-in-chunk × 64
            sigs[row:end] = (
                ((votes > 0).astype(np.uint64)) << bitcols[None, :]
            ).sum(axis=1, dtype=np.uint64) >> np.uint64(1)
            row = end
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(sigs.astype(np.int64)),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (numpy<2 has no bit_count)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


# 63-bit stored signature split into 4 bands (16/16/16/15 bits): any
# pair within hamming distance 3 shares at least one untouched band
# (pigeonhole), so candidate recall is EXACT for max_hamming <= bands-1
_SIMHASH_BANDS = ((0, 16), (16, 16), (32, 16), (48, 15))


def simhash_near_dup(
    docs: rd.Dataset, *, max_hamming: int = 3, max_bucket: int = 10_000
) -> rd.Dataset:
    """SimHash near-dup pairs: (a, b, hamming) for every pair of docs
    whose 64-bit SimHash signatures differ in at most ``max_hamming``
    bits, sorted by (a, b).

    Pigeonhole-banded LSH: each signature emits one row per 16-bit band;
    equal-band buckets generate all within-bucket candidate pairs, and a
    vectorized popcount verify keeps true pairs. With 4 bands, recall is
    PROVABLY 1.0 for ``max_hamming <= 3`` — which is what makes this the
    oracle-checkable member of the near-dup family on natural (unplanted)
    data: a SQL all-pairs ``bit_count(xor(...))`` recomputes the exact
    same pair set. Degenerate buckets larger than ``max_bucket`` are
    dropped with a log (a bucket that big means the signature ceased to
    discriminate, e.g. empty documents)."""
    import logging

    sigs = simhash_signatures(docs)

    def band_rows(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_band, out_val, out_doc = [], [], []
        for j, (shift, width) in enumerate(_SIMHASH_BANDS):
            val = (sig >> np.uint64(shift)) & np.uint64((1 << width) - 1)
            out_band.append(np.full(ids.size, j, dtype=np.int32))
            out_val.append(val.astype(np.int64))
            out_doc.append(ids)
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(out_band)),
                "band_hash": pa.array(np.concatenate(out_val)),
                "doc_id": pa.array(np.concatenate(out_doc)),
            }
        )

    rows = sigs.map_batches(band_rows, batch_format="pyarrow")

    def tag(batch: pa.Table) -> pa.Table:
        part = (
            batch["band_hash"].to_numpy(zero_copy_only=False) % _AGG_PARTS
        ).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def all_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["band_id", "band_hash", "doc_id"], kind="stable")
        bh = g[["band_id", "band_hash"]].to_numpy()
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = np.any(bh[1:] != bh[:-1], axis=1)
        grp_id = np.cumsum(new) - 1
        doc = g["doc_id"].to_numpy(dtype=np.int64)
        a_out, b_out = [], []
        for s in np.split(np.arange(len(g)), np.flatnonzero(new)[1:]):
            if len(s) < 2:
                continue
            if len(s) > max_bucket:
                logging.getLogger(__name__).warning(
                    "simhash_near_dup: dropping degenerate bucket of %d docs",
                    len(s),
                )
                continue
            iu, ju = np.triu_indices(len(s), 1)
            a_out.append(doc[s][iu])
            b_out.append(doc[s][ju])
        if not a_out:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=np.int64),
                    "b": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "a": pd.Series(np.concatenate(a_out), dtype=np.int64),
                "b": pd.Series(np.concatenate(b_out), dtype=np.int64),
            }
        )

    candidates = _dedup_pairs_partitioned(
        grouped_map(
            rows.map_batches(tag, batch_format="pyarrow"),
            "__part",
            all_pairs,
            num_partitions=_AGG_PARTS,
            batch_format="pandas",
            whole_partition=True,  # sub-groups by bucket itself
        )
    ).materialize()
    if candidates.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        )

    with_ab = attach_doc_columns(
        candidates,
        sigs,
        key_cols=["a", "b"],
        doc_val="simhash",
        out_cols=["sig_a", "sig_b"],
    )

    def verify(batch: pa.Table) -> pa.Table:
        sa = batch["sig_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sb = batch["sig_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ham = _popcount64(sa ^ sb).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table(
            {
                "a": pa.array(
                    batch["a"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "b": pa.array(
                    batch["b"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    return with_ab.map_batches(verify, batch_format="pyarrow").sort(["a", "b"])


# ---------------------------------------------------------------------------
# embedding similarity: brute-force + LSH-bucketed ANN, embedding near-dup
# ---------------------------------------------------------------------------

def _embedding_matrix(batch: pa.Table, dtype=np.float32) -> np.ndarray:
    """(n, d) matrix view of the embedding column — zero-copy-friendly
    for both ``list<float>`` (the fixture layout) and
    ``fixed_size_list<float, d>`` (the natural parquet layout for
    embeddings, which has no offsets buffer)."""
    col = batch["embedding"].combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False).astype(dtype)
        start = col.offset * dim
        return flat[start : start + len(batch) * dim].reshape(
            len(batch), dim
        )
    flat = col.values.to_numpy(zero_copy_only=False).astype(dtype)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    dim = offsets[1] - offsets[0]
    return flat[offsets[0] : offsets[-1]].reshape(len(batch), dim)


def _vec_rows(embeddings: rd.Dataset, ids) -> list[dict]:
    """Fetch the rows for a small id set with a vectorized batch filter
    (no per-row Python in the scan), sorted by vec_id."""
    arr = pa.array(sorted(set(int(i) for i in ids)), pa.int64())
    rows = embeddings.map_batches(
        lambda b: b.filter(pa.compute.is_in(b["vec_id"], value_set=arr)),
        batch_format="pyarrow",
    ).take_all()
    return sorted(rows, key=lambda r: r["vec_id"])


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
    qrows = _vec_rows(embeddings, query_ids)
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

    return grouped_map(
        partials, "query_id", final_topk, batch_format="pandas"
    )


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
    # float64 end-to-end: bucket signs and cosines stay bit-comparable
    # with a double-math SQL oracle
    planes = rng.randn(num_planes, dim)
    planes_ref = ray.put(planes)

    qrows = _vec_rows(embeddings, query_ids)
    qid = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    qsig = (qmat @ planes.T > 0).astype(np.uint8)
    qbucket = (qsig.astype(np.int64) << np.arange(num_planes, dtype=np.int64)).sum(axis=1)
    q_by_bucket: dict[int, list[int]] = {}
    for i, bkt in enumerate(qbucket):
        q_by_bucket.setdefault(int(bkt), []).append(i)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    q_ref = ray.put((qid, qn, q_by_bucket))

    def bucket_topk(batch: pa.Table) -> pa.Table:
        planes_ = ray.get(planes_ref)
        qid_, qn_, q_by_bucket_ = ray.get(q_ref)
        m = _embedding_matrix(batch, np.float64)
        sig = (m @ planes_.T > 0).astype(np.uint8)
        buckets = (sig.astype(np.int64) << np.arange(planes_.shape[0], dtype=np.int64)).sum(axis=1)
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
        g["cosine"] = trunc6(g["cosine"].to_numpy())
        return g

    return grouped_map(
        partials, "query_id", final_topk, batch_format="pandas"
    )


def ivf_ann(
    embeddings: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    *,
    n_lists: int = 16,
    nprobe: int = 2,
) -> rd.Dataset:
    """IVF-flat ANN — the inverted-list scale path: every vector is
    assigned to its euclidean-nearest coarse centroid (one inverted
    list per centroid), and a query scans only its ``nprobe`` nearest
    lists, exact-cosine-ranked. Same output schema as
    :func:`ann_cosine_topk`.

    Coarse centroids are the first ``n_lists`` vectors of the corpus
    (deterministic seed centroids — a SQL oracle can recompute every
    assignment exactly; Lloyd refinement is a drop-in replacement for
    :func:`_ivf_centroids` when oracle-exactness isn't needed).
    Assignment ties break to the smaller centroid index. float64
    throughout, like the LSH variant."""
    cents = _ivf_centroids(embeddings, n_lists)
    cents_ref = ray.put(cents)

    qrows = _vec_rows(embeddings, query_ids)
    qid = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    qd = _sq_dists(qmat, cents)
    # nprobe nearest lists per query, ties to the smaller list index
    qlists = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)
    q_ref = ray.put((qid, qn, qlists))

    def list_topk(batch: pa.Table) -> pa.Table:
        cents_ = ray.get(cents_ref)
        qid_, qn_, qlists_ = ray.get(q_ref)
        m = _embedding_matrix(batch, np.float64)
        d = _sq_dists(m, cents_)
        assign = np.argmin(d, axis=1)  # first minimum = smaller list id
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        out_q, out_v, out_s = [], [], []
        for qi in range(qid_.size):
            mask = np.isin(assign, qlists_[qi])
            mask &= vec_ids != qid_[qi]
            if not mask.any():
                continue
            idx = np.flatnonzero(mask)
            s = mn[idx] @ qn_[qi]
            order = idx[np.lexsort((vec_ids[idx], -s))][:k]
            s_order = mn[order] @ qn_[qi]
            out_q.extend([int(qid_[qi])] * order.size)
            out_v.extend(vec_ids[order].tolist())
            out_s.extend(s_order.astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = embeddings.map_batches(list_topk, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["cosine"] = trunc6(g["cosine"].to_numpy())
        return g

    return grouped_map(
        partials, "query_id", final_topk, batch_format="pandas"
    )


def _ivf_centroids(embeddings: rd.Dataset, n_lists: int) -> np.ndarray:
    """Deterministic seed centroids: the corpus' first ``n_lists``
    vectors by vec_id (float64). Swap for k-means here to trade oracle
    exactness for better list balance."""
    rows = _vec_rows(embeddings, range(n_lists))
    return np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def embedding_near_dup(
    embeddings: rd.Dataset,
    *,
    threshold: float = 0.95,
    num_bands: int = 4,
    planes_per_band: int = 16,
) -> rd.Dataset:
    """Embedding-cosine near-dup via BANDED hyperplane LSH (OR of
    ``num_bands`` AND-bands of ``planes_per_band`` sign bits): a pair
    becomes a candidate if every bit agrees in ANY band. 2^planes_per_band
    buckets per band keep the in-bucket all-pairs verify sub-quadratic
    at scale; ``num_bands`` is the recall knob — a cosine-c pair hits a
    band with (1 − acos(c)/π)^planes_per_band, and identical vectors
    collide in EVERY band (recall exactly 1.0 for the oracle's planted
    ground truth). Verified cosine ≥ threshold pairs cluster via
    distributed min-label propagation into (vec_id, dup_of = min
    cluster id)."""
    first = embeddings.take(1)[0]
    dim = len(first["embedding"])
    rng = np.random.RandomState(7)
    planes = rng.randn(num_bands * planes_per_band, dim).astype(np.float32)
    planes_ref = ray.put(planes)
    weights = 1 << np.arange(planes_per_band, dtype=np.int64)

    def assign_buckets(batch: pa.Table) -> pa.Table:
        planes_ = ray.get(planes_ref)
        m = _embedding_matrix(batch)
        bits = m @ planes_.T > 0  # (n, num_bands * planes_per_band)
        n = len(batch)
        tables = []
        for bnd in range(num_bands):
            seg = bits[:, bnd * planes_per_band : (bnd + 1) * planes_per_band]
            tables.append(
                pa.table(
                    {
                        "vec_id": batch["vec_id"],
                        "band": pa.array(np.full(n, bnd, dtype=np.int8)),
                        "bucket": pa.array(seg.astype(np.int64) @ weights),
                        "embedding": batch["embedding"],
                    }
                )
            )
        return pa.concat_tables(tables)

    bucketed = embeddings.map_batches(assign_buckets, batch_format="pyarrow")

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy(dtype=np.int64)
        if ids.size < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
        m = np.stack([np.asarray(e, dtype=np.float32) for e in group["embedding"]])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = m @ m.T
        iu, ju = np.triu_indices(ids.size, 1)
        hit = sims[iu, ju] >= threshold
        ai, bi = ids[iu[hit]], ids[ju[hit]]
        # normalize pair order so the same pair found in two bands dedupes
        return pd.DataFrame(
            {
                "a": pd.Series(np.minimum(ai, bi), dtype=np.int64),
                "b": pd.Series(np.maximum(ai, bi), dtype=np.int64),
            }
        )

    def tag_bucket(batch: pa.Table) -> pa.Table:
        band = batch["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (
            (band * np.uint64(0x9E3779B97F4A7C15) + bucket) % _AGG_PARTS
        ).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def pairs_in_partition(group: pd.DataFrame) -> pd.DataFrame:
        # (band, bucket) cardinality scales with 2^planes_per_band;
        # per-bucket matmuls run under a cheap pandas sub-groupby, not
        # per-group Ray blocks
        outs = [
            pairs_in_bucket(sub)
            for _, sub in group.groupby(["band", "bucket"], sort=False)
        ]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=np.int64),
                    "b": pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(outs, ignore_index=True)

    edges = _dedup_pairs_partitioned(
        grouped_map(
            bucketed.map_batches(tag_bucket, batch_format="pyarrow"),
            "__part",
            pairs_in_partition,
            num_partitions=_AGG_PARTS,
            batch_format="pandas",
            whole_partition=True,  # sub-groups by (band, bucket) itself
        )
    ).materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table(
                {"vec_id": pa.array([], pa.int64()), "dup_of": pa.array([], pa.int64())}
            )
        )
    # distributed min-label clustering — no driver union-find
    return min_label_components(
        edges, node_col="vec_id", label_col="dup_of"
    ).sort("vec_id")


def semantic_dedup(
    embeddings: rd.Dataset,
    *,
    n_clusters: int = 16,
    threshold: float = 0.95,
    num_partitions: int = 16,
    centroids: np.ndarray | None = None,
) -> rd.Dataset:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv
    2303.09540): cluster the corpus around coarse centroids, then drop
    near-duplicates by pairwise cosine WITHIN each cluster only —
    Σ|C|² ≈ n²/k work instead of all-pairs, clusters verified in
    parallel. Complements :func:`embedding_near_dup` (hyperplane LSH):
    LSH buckets bound candidate *pairs*, SemDeDup bounds the *verify
    partition* and keeps the cluster structure in the output.

    Centroids are the deterministic seed set :func:`_ivf_centroids`
    uses (the first ``n_clusters`` vectors by vec_id; pass
    ``centroids=kmeans_fit(...)`` for a Lloyd-refined partition —
    refinement
    is a drop-in when oracle-exactness isn't required). Assignment is
    euclidean argmin with ties to the smaller centroid index — the same
    arithmetic as :func:`ivf_ann`, so a SQL oracle recomputes every
    cluster id exactly. Keep rule, deterministic and order-free: a
    vector is dropped iff SOME smaller vec_id in its cluster has
    cosine ≥ ``threshold`` with it.

    Partitioning assumption (SemDeDup's own scale contract): size
    ``n_clusters`` so one cluster's vectors fit a worker's heap (the
    paper runs k in the 10⁴–10⁵ range on billions of embeddings); each
    cluster hash-shuffles whole to one group.

    Output: ``(vec_id, cluster, kept)`` for every input row.
    """
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
        if cents.ndim != 2:
            raise ValueError(
                f"centroids must be a (k, d) matrix, got shape {cents.shape}"
            )
        n_clusters = cents.shape[0]  # explicit matrix wins over the count
    else:
        cents = _ivf_centroids(embeddings, n_clusters)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cents_ = ray.get(cents_ref)
        m = _embedding_matrix(batch, np.float64)
        d = _sq_dists(m, cents_)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster": pa.array(np.argmin(d, axis=1).astype(np.int64)),
                "embedding": batch["embedding"],
            }
        )

    assigned = embeddings.map_batches(assign, batch_format="pyarrow")

    def dedup_cluster(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:  # empty shuffle block (block-boundary artifact)
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype=np.int64),
                    "cluster": pd.Series([], dtype=np.int64),
                    "kept": pd.Series([], dtype=bool),
                }
            )
        g = group.sort_values("vec_id", kind="stable")
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        m = np.stack([np.asarray(e, dtype=np.float64) for e in g["embedding"]])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = m @ m.T
        # dropped iff any strictly-smaller vec_id row is >= threshold
        dropped = np.tril(sims >= threshold, -1).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": g["cluster"].to_numpy(dtype=np.int64),
                "kept": ~dropped,
            }
        )

    from .shuffle import grouped_map

    return grouped_map(
        assigned,
        "cluster",
        dedup_cluster,
        num_partitions=num_partitions,
        batch_format="pandas",
    ).sort("vec_id")


def _sq_dists(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) squared euclidean distances via the matmul identity
    |m|² − 2 m·cᵀ + |c|² — O(n·k) memory instead of the O(n·k·d)
    broadcast temporary (537 MB per 4096-row batch at k=256, d=64),
    and BLAS-speed. The same expression the SQL oracles compute
    (list_dot_product three ways), so engine/oracle argmin margins
    coincide by construction."""
    return (
        (m * m).sum(axis=1)[:, None]
        - 2.0 * (m @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )


def kmeans_fit(
    embeddings: rd.Dataset,
    *,
    k: int = 16,
    iters: int = 5,
) -> np.ndarray:
    """Distributed Lloyd k-means over the embedding column — the
    refinement the seed-centroid consumers (:func:`ivf_ann`,
    :func:`semantic_dedup`) document as a drop-in. Each iteration is
    ONE ``map_batches`` pass emitting per-batch partials (cluster,
    count, per-dim sums — k×(d+1) floats per batch, nothing
    corpus-sized anywhere), combined by a k-row grouped reduce; the
    driver ever holds only the k×d centroid matrix. Empty clusters
    keep their previous centroid.

    Centroids are :func:`trunc6`-truncated after every iteration,
    which pins the whole fit bit-for-bit across runs, batch splits,
    shuffle strategies and engines: summation-order float noise
    (~1e-12 relative) is absorbed by the 1e-6 grid, so an unrolled
    SQL oracle recomputes the ENTIRE iterative fit exactly (query
    ``ml_kmeans``). Seeds: the first ``k`` vectors by vec_id."""
    cents = _ivf_centroids(embeddings, k)
    d = cents.shape[1]
    from .shuffle import grouped_map

    for _ in range(iters):
        cents_ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            cents_ = ray.get(cents_ref)
            m = _embedding_matrix(batch, np.float64)
            dist = _sq_dists(m, cents_)
            assign = np.argmin(dist, axis=1)
            present = np.unique(assign)
            sums = np.zeros((present.size, m.shape[1]))
            counts = np.zeros(present.size, dtype=np.int64)
            for j, c in enumerate(present):
                sel = assign == c
                sums[j] = m[sel].sum(axis=0)
                counts[j] = int(sel.sum())
            return pa.table(
                {
                    "cluster": pa.array(present.astype(np.int64)),
                    "n": pa.array(counts),
                    "sums": pa.array(
                        list(sums), pa.list_(pa.float64(), m.shape[1])
                    ),
                }
            )

        def combine(group: pd.DataFrame) -> pd.DataFrame:
            if group.empty:
                return pd.DataFrame(
                    {
                        "cluster": pd.Series([], dtype=np.int64),
                        "n": pd.Series([], dtype=np.int64),
                        "sums": pd.Series([], dtype=object),
                    }
                )
            s = np.stack([np.asarray(v, dtype=np.float64) for v in group["sums"]])
            return pd.DataFrame(
                {
                    "cluster": [int(group["cluster"].iloc[0])],
                    "n": [int(group["n"].sum())],
                    "sums": [s.sum(axis=0).tolist()],
                }
            )

        rows = grouped_map(
            embeddings.map_batches(partial, batch_format="pyarrow"),
            "cluster",
            combine,
            num_partitions=min(k, 16),
            batch_format="pandas",
            materialize_output=False,
        ).take_all()  # ≤ k rows — bounded by construction
        nxt = cents.copy()
        for r in rows:
            if r["n"] > 0:
                nxt[int(r["cluster"])] = (
                    np.asarray(r["sums"], dtype=np.float64) / r["n"]
                )
        cents = trunc6(nxt).reshape(k, d)
    return cents


def kmeans_assign(embeddings: rd.Dataset, centroids: np.ndarray) -> rd.Dataset:
    """(vec_id, cluster) assignment under fixed ``centroids`` —
    euclidean argmin, ties to the smaller centroid index (the
    :func:`ivf_ann` arithmetic)."""
    cents_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cents_ = ray.get(cents_ref)
        m = _embedding_matrix(batch, np.float64)
        dist = _sq_dists(m, cents_)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster": pa.array(np.argmin(dist, axis=1).astype(np.int64)),
            }
        )

    return embeddings.map_batches(assign, batch_format="pyarrow")


def _explode_doc_shingles(batch: pa.Table, k: int) -> pa.Table:
    """(doc_id, shingle) rows, distinct per doc — the
    :func:`_batch_shingle_pairs` dictionary kernel; shingle strings are
    materialized once per batch-unique shingle, never per occurrence."""
    n, pair_doc, pair_uid, uniq_sh, tokens, _, _ = _batch_shingle_pairs(
        batch["text"], k
    )
    strs = np.array(
        [" ".join(tokens[t] for t in tup) for tup in uniq_sh], dtype=object
    )
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(
                ids[pair_doc] if n else np.zeros(0, np.int64), pa.int64()
            ),
            "shingle": pa.array(
                strs[pair_uid].tolist() if n else [], pa.string()
            ),
        }
    )


def decontaminate(
    train: rd.Dataset,
    test: rd.Dataset,
    *,
    shingle_k: int = 3,
    broadcast_cap: int = 2_000_000,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Train/test overlap decontamination (the GPT-3 / Pile
    pre-training hygiene step): a train document is ``contaminated``
    iff it shares at least one k-token shingle with ANY test document.
    Returns ``(doc_id, contaminated)`` for EVERY train doc — callers
    filter or audit.

    Test-side shingles explode distinct-per-doc through the shared
    dictionary kernel and materialize once (the test set is the small
    side by definition). Under ``broadcast_cap`` exploded rows the
    distinct shingles ship once via ``ray.put`` and each train batch
    verifies with one vectorized ``pc.is_in`` — zero shuffles, fused
    with the read. Past the cap the two exploded sides co-partition on
    the shingle (union + partition-hash groupby, the semi-join shape
    of ``tags.extract_taggings_semijoin``) and the contaminated-id set
    flag-attaches to the full train id set by a doc_id co-partition —
    nothing corpus-sized on the driver or in one object. At planet
    scale, swap the shingle string for its 61-bit blake2b hash
    (:func:`_token_shingle_hashes`) to shrink the shuffle; strings are
    kept here so the SQL oracle compares exactly."""
    test_sh = test.map_batches(
        lambda b: _explode_doc_shingles(b, shingle_k), batch_format="pyarrow"
    ).materialize()

    if test_sh.count() <= broadcast_cap:
        distinct = pa.array(
            sorted(
                {
                    s
                    for b in test_sh.iter_batches(batch_format="pyarrow")
                    for s in b["shingle"].to_pylist()
                }
            ),
            pa.string(),
        )
        val_ref = ray.put(distinct)

        def flag(batch: pa.Table) -> pa.Table:
            vals = ray.get(val_ref)
            ex = _explode_doc_shingles(batch, shingle_k)
            hit = pc.is_in(ex["shingle"], value_set=vals).to_numpy(
                zero_copy_only=False
            )
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            exid = ex["doc_id"].to_numpy(zero_copy_only=False)
            out = np.isin(ids, np.unique(exid[hit]))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "contaminated": pa.array(out),
                }
            )

        return train.map_batches(flag, batch_format="pyarrow").sort("doc_id")

    # distributed semi-join: union both exploded sides on the shingle
    train_sh = train.map_batches(
        lambda b: _explode_doc_shingles(b, shingle_k), batch_format="pyarrow"
    )

    def tag_side(is_test: bool):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__test", pa.array(np.full(len(batch), is_test, dtype=bool))
            )

        return fn

    unioned = train_sh.map_batches(
        tag_side(False), batch_format="pyarrow"
    ).union(test_sh.map_batches(tag_side(True), batch_format="pyarrow"))

    def semi(part: pd.DataFrame) -> pd.DataFrame:
        te = part[part["__test"]]["shingle"]
        tr = part[~part["__test"]]
        hit = tr[tr["shingle"].isin(set(te))]
        return pd.DataFrame(
            {"doc_id": hit["doc_id"].unique().astype(np.int64)}
        )

    from .shuffle import partitioned_aggregate

    contaminated = partitioned_aggregate(
        unioned, "shingle", semi, num_partitions=num_partitions
    )

    def as_flag(flag_val: bool):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
                    "contaminated": pa.array(
                        np.full(len(batch), flag_val, dtype=bool)
                    ),
                }
            )

        return fn

    both = train.select_columns(["doc_id"]).map_batches(
        as_flag(False), batch_format="pyarrow"
    ).union(contaminated.map_batches(as_flag(True), batch_format="pyarrow"))

    def resolve(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("doc_id", as_index=False)["contaminated"].max()
        g["contaminated"] = g["contaminated"].astype(bool)
        return g

    return partitioned_aggregate(
        both, "doc_id", resolve, num_partitions=num_partitions
    ).sort("doc_id")


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


def gopher_repetition(
    docs: rd.Dataset, *, shingle_k: int = 3, max_dup_frac: float = 0.2
) -> rd.Dataset:
    """Within-document repetition quality signal (the MassiveText /
    Gopher filter family, Rae et al. 2021 §A1.1: drop documents whose
    duplicate n-gram fraction is too high). Per doc:
    ``dup_ngram_frac = 1 - distinct/total`` k-token shingle occurrences
    (trunc6), and ``flagged = frac > max_dup_frac``. Rides the shared
    whole-batch dictionary shingling kernel — total counts fall out of
    the enumeration, distinct counts out of the per-doc unique pairs;
    no per-row Python."""

    def fn(batch: pa.Table) -> pa.Table:
        n, pair_doc, _, _, _, n_sh, _ = _batch_shingle_pairs(
            batch["text"], shingle_k
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "dup_ngram_frac": pa.array([], pa.float64()),
                    "flagged": pa.array([], pa.bool_()),
                }
            )
        distinct = np.bincount(pair_doc, minlength=n).astype(np.int64)
        frac = trunc6(1.0 - distinct / np.maximum(n_sh, 1))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "dup_ngram_frac": pa.array(frac, pa.float64()),
                "flagged": pa.array(frac > max_dup_frac),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


# RE2 on both sides (Arrow and DuckDB), so the patterns behave
# identically in the engine and the SQL oracle
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


def pii_scrub(docs: rd.Dataset) -> rd.Dataset:
    """PII redaction pass (emails → ``<EMAIL>``, phone numbers →
    ``<PHONE>``) — the standard pre-training hygiene stage. Pure
    vectorized Arrow RE2 kernels (count + replace_substring_regex), no
    per-row Python; patterns apply in a fixed order (email first) so
    redaction counts are well-defined. Output: (doc_id, text,
    n_redactions) with text scrubbed."""

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        n_red = np.zeros(len(batch), dtype=np.int64)
        for pat, rep in ((_PII_EMAIL, "<EMAIL>"), (_PII_PHONE, "<PHONE>")):
            n_red += pc.count_substring_regex(text, pat).to_numpy(
                zero_copy_only=False
            )
            text = pc.replace_substring_regex(
                text, pattern=pat, replacement=rep
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
                "text": text,
                "n_redactions": pa.array(n_red, pa.int64()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def cluster_balanced_sample(
    embeddings: rd.Dataset,
    centroids: np.ndarray,
    *,
    per_cluster: int = 20,
) -> rd.Dataset:
    """Cluster-balanced (diversity) downsampling: assign every vector to
    its centroid and keep the ``per_cluster`` smallest vec_ids of each
    cluster — the deterministic skeleton of coverage-preserving corpus
    subsampling (cluster with :func:`kmeans_fit`, then cap each
    cluster's share instead of sampling the head of a skewed corpus).
    Per-cluster rank runs inside a partition-hash groupby; nothing
    corpus-sized leaves the workers."""
    from .shuffle import partitioned_map_groups

    assigned = kmeans_assign(embeddings, centroids)

    def head(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id", kind="stable").head(per_cluster)
        return g[["vec_id", "cluster"]].astype(np.int64)

    return partitioned_map_groups(
        assigned, "cluster", head, num_partitions=16
    ).sort("vec_id")


# md5-bucket cache for DSIR grams (string -> 64-bit int, pre-modulo so
# it is bucket-count-agnostic); capped like the MinHash shingle cache
_MD5_GRAM_CACHE: dict = {}


def _gram_buckets(uniq_sh: np.ndarray, tokens: list, buckets: int) -> np.ndarray:
    """md5-derived bucket id per batch-unique gram (index-tuple rows) —
    ``int(md5(gram)[:16 hex], 16) % buckets``, the construction the
    simhash/winnowing oracles already recompute in SQL.

    Gram strings are built VECTORIZED (one Arrow ``take`` per gram
    column + ``binary_join_element_wise`` — no per-row join loop); the
    remaining Python per unique gram is a dict-get, with md5 only on
    cross-batch-cache misses (the md5 itself is the one inherently
    per-string step; the cache keys on the gram string, which is stable
    across batches where packed dictionary indices are not)."""
    n = len(uniq_sh)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    tok_arr = pa.array(tokens, pa.string())
    k = uniq_sh.shape[1] if uniq_sh.ndim == 2 else len(uniq_sh[0])
    cols = [tok_arr.take(pa.array(uniq_sh[:, j].astype(np.int64))) for j in range(k)]
    grams = pc.binary_join_element_wise(*cols, " ").to_pylist()
    cache = _MD5_GRAM_CACHE
    out = np.empty(n, dtype=np.int64)
    for i, g in enumerate(grams):
        h = cache.get(g)
        if h is None:
            h = _md5_u64(g)
            if len(cache) < 2_000_000:
                cache[g] = h
        out[i] = h % buckets
    return out


def _gram_bucket_partials(
    docs: rd.Dataset, *, buckets: int, num_partitions: int = 16
) -> rd.Dataset:
    """(bucket, n) gram-occurrence counts over a corpus — unigrams AND
    bigrams (NUL-padded per the shared kernel), batch-partial bincounts
    combined by a partition-hash sum; at most ``buckets`` rows out."""

    def partial(batch: pa.Table) -> pa.Table:
        acc = np.zeros(buckets, dtype=np.int64)
        for k in (1, 2):
            n, _, pair_uid, uniq_sh, tokens, _, pair_counts = (
                _batch_shingle_pairs(batch["text"], k)
            )
            if n == 0:
                continue
            b = _gram_buckets(uniq_sh, tokens, buckets)
            np.add.at(acc, b[pair_uid], pair_counts)
        nz = np.flatnonzero(acc)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "n": pa.array(acc[nz]),
            }
        )

    from .shuffle import partitioned_aggregate

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("bucket", as_index=False)["n"].sum()
        return g.astype(np.int64)

    return partitioned_aggregate(
        docs.select_columns(["text"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        "bucket",
        combine,
        num_partitions=num_partitions,
    )


def dsir_scores(
    docs: rd.Dataset,
    target: rd.Dataset,
    *,
    buckets: int = 65536,
    num_partitions: int = 16,
) -> rd.Dataset:
    """DSIR importance scores (Data Selection via Importance Resampling,
    Xie et al. 2023, arXiv 2302.03169): hashed unigram+bigram bucket
    distributions for the TARGET corpus and the RAW corpus (add-1
    smoothed), then per document the log-likelihood ratio
    ``Σ_grams ln(p_target(bucket)/p_raw(bucket))``. Downstream samplers
    keep documents with the highest scores to shift the raw corpus
    toward the target domain.

    Scores are emitted as ``dsir_score = Σ count_b · floor(ln(ratio_b)
    · 1e6)`` — int64 arithmetic, so the score is EXACTLY reproducible
    in any summation order (a float Σ would be ulp-order-dependent;
    the int form is what lets the SQL oracle match bit-for-bit).
    Scale: two bounded count passes (≤ ``buckets`` rows each after the
    partition-hash sum), one ``buckets``-sized int64 ratio table
    broadcast via ``ray.put`` (512 KB at the default), one scoring
    scan; nothing corpus-sized anywhere."""
    # the two count passes are independent — overlap them (take_all
    # blocks, so back-to-back calls would serialize two full scans)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as ex:
        fut_t = ex.submit(
            lambda: _gram_bucket_partials(
                target, buckets=buckets, num_partitions=num_partitions
            ).take_all()
        )
        fut_r = ex.submit(
            lambda: _gram_bucket_partials(
                docs, buckets=buckets, num_partitions=num_partitions
            ).take_all()
        )
        cnt_t = {int(r["bucket"]): int(r["n"]) for r in fut_t.result()}
        cnt_r = {int(r["bucket"]): int(r["n"]) for r in fut_r.result()}
    ct = np.zeros(buckets, dtype=np.int64)
    cr = np.zeros(buckets, dtype=np.int64)
    for b, v in cnt_t.items():
        ct[b] = v
    for b, v in cnt_r.items():
        cr[b] = v
    tt, tr_ = int(ct.sum()), int(cr.sum())
    p_t = (ct + 1).astype(np.float64) / np.float64(tt + buckets)
    p_r = (cr + 1).astype(np.float64) / np.float64(tr_ + buckets)
    lr = np.floor(np.log(p_t / p_r) * 1e6).astype(np.int64)
    lr_ref = ray.put(lr)

    def score(batch: pa.Table) -> pa.Table:
        lr_ = ray.get(lr_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out = np.zeros(len(batch), dtype=np.int64)
        for k in (1, 2):
            n, pair_doc, pair_uid, uniq_sh, tokens, _, pair_counts = (
                _batch_shingle_pairs(batch["text"], k)
            )
            if n == 0:
                continue
            b = _gram_buckets(uniq_sh, tokens, buckets)
            np.add.at(out, pair_doc, pair_counts * lr_[b[pair_uid]])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "dsir_score": pa.array(out),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def pack_sequences(
    docs: rd.Dataset,
    *,
    max_tokens: int = 512,
    partition_size: int = 1000,
) -> rd.Dataset:
    """Greedy sequence packing — the pre-training batcher's final stage:
    concatenate documents in doc_id order until the next one would
    overflow ``max_tokens``, then start a new sequence. Global greedy
    packing is inherently sequential, so the distributed contract is
    PARTITION-SCOPED determinism: docs pack greedily within fixed
    ``doc_id // partition_size`` ranges and a sequence is identified by
    ``(part, seq)`` — the exact semantics a resumable 100 TB packing
    job wants anyway (a re-run of one input range reproduces its
    sequences bit-for-bit without seeing any other range). Token counts
    are the corpus tokenizer's run count (one vectorized
    ``count_substring_regex`` per batch); the per-partition greedy loop
    is bounded by ``partition_size``.

    Output: ``(doc_id, part, seq, n_tokens)`` — one row per doc."""

    def counts(batch: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(batch["text"], ""))
        n_tok = pc.count_substring_regex(text, "[a-z0-9]+")
        ids = batch["doc_id"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "doc_id": ids,
                "part": pc.divide(ids, pa.scalar(partition_size, pa.int64())),
                "n_tokens": pc.cast(n_tok, pa.int64()),
            }
        )

    from .shuffle import partitioned_map_groups

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id", kind="stable")
        toks = g["n_tokens"].to_numpy(np.int64)
        seq = np.zeros(len(g), dtype=np.int64)
        s, acc = 0, 0
        for i, t in enumerate(toks):
            if i == 0:
                acc = int(t)
            elif acc + int(t) > max_tokens:
                s += 1
                acc = int(t)
            else:
                acc += int(t)
            seq[i] = s
        out = g[["doc_id", "part", "n_tokens"]].copy()
        out["seq"] = seq
        return out[["doc_id", "part", "seq", "n_tokens"]]

    counted = docs.select_columns(["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow"
    )
    return partitioned_map_groups(counted, "part", pack).sort("doc_id")


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
    """Marker-word language heuristic → (doc_id, lang_pred, lang_score).

    Vectorized (the ``stages/enrich.py`` pattern): ONE Arrow
    tokenize + dictionary-encode per batch, marker membership as
    ``pc.is_in`` over the DICTIONARY (vocabulary-sized, not
    corpus-sized), hits summed per doc over the first-64-real-tokens
    window with ``np.add.at``. Row-wise semantics pinned by
    ``test_langid_matches_rowwise``: hits count the first 64 tokens
    WITH repeats; ties break to the alphabetically first language
    (strict ``>`` over ascending langs == first-occurrence argmax);
    zero hits → ``und``."""
    langs_sorted = sorted(_LANG_MARKERS)
    langs_np = np.array(langs_sorted)

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        doc, idx, denc = _tokenize_batch(batch["text"])
        dictionary = denc.dictionary
        # per-dictionary-entry indicators (vocab-sized work)
        tok_len = pc.binary_length(dictionary).to_numpy(zero_copy_only=False)
        marks = np.empty((len(dictionary), len(langs_sorted)), dtype=np.int64)
        for j, lang in enumerate(langs_sorted):
            marks[:, j] = pc.is_in(
                dictionary, value_set=pa.array(sorted(_LANG_MARKERS[lang]))
            ).to_numpy(zero_copy_only=False)
        # rank of each flat token among ITS DOC's real (non-empty)
        # tokens: window = first 64 real tokens, with repeats
        real = tok_len[idx] > 0 if idx.size else np.zeros(0, dtype=bool)
        csum = np.zeros(doc.size + 1, dtype=np.int64)
        np.cumsum(real, out=csum[1:])
        first = np.zeros(n, dtype=np.int64)  # first flat index per doc
        if doc.size:
            starts = np.flatnonzero(
                np.concatenate([[True], doc[1:] != doc[:-1]])
            )
            first[doc[starts]] = starts
        rank = csum[:-1] - csum[first[doc]] if doc.size else csum[:-1]
        keep = real & (rank < 64)
        hits = np.zeros((n, len(langs_sorted)), dtype=np.int64)
        kept_doc = doc[keep]
        kept_idx = idx[keep]
        for j in range(len(langs_sorted)):
            np.add.at(hits[:, j], kept_doc, marks[kept_idx, j])
        best = hits.max(axis=1) if n else np.zeros(0, dtype=np.int64)
        preds = np.where(best > 0, langs_np[np.argmax(hits, axis=1)], "und")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(preds.tolist(), pa.string()),
                "lang_score": pa.array(best, pa.int64()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def fingerprint_md5(docs: rd.Dataset) -> rd.Dataset:
    """MD5 content fingerprint (oracle-friendly: DuckDB ``md5()``).

    One md5 per document is inherent, but the per-row Python is
    trimmed to the hash call itself: rows are hashed as zero-copy
    ``memoryview`` slices of the Arrow data buffer (no per-row str
    materialization / utf-8 re-encode — the column's utf8 bytes ARE
    the hash input; null → empty). Equivalence with the row-wise
    definition pinned by ``test_fingerprint_buffer_kernel_matches``."""

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch["text"].combine_chunks().cast(pa.large_binary())
        if arr.null_count:
            arr = pc.fill_null(arr, b"")
        n = len(arr)
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset : arr.offset + n + 1
        ]
        data = memoryview(arr.buffers()[2] or b"")
        md5 = hashlib.md5
        fps = [
            md5(data[offs[i] : offs[i + 1]]).hexdigest() for i in range(n)
        ]
        return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps)})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


# cross-batch cache of char-k-gram md5 hashes (gram string → uint64,
# pre->>1); natural-language gram distributions are heavy-headed, so
# steady-state md5 work is only the genuinely new grams
_MD5_CHARGRAM_CACHE: dict = {}


def winnowing_fingerprints(
    docs: rd.Dataset, *, k: int = 5, window: int = 4
) -> rd.Dataset:
    """Winnowing document fingerprints (rolling k-gram hash, min per
    window) → (doc_id, fingerprints list) for plagiarism-style matching.

    Vectorized: each doc's chars become a uint32 codepoint array
    (``utf-32-le`` view — k-grams are CHARACTER grams, exactly the
    ``s[i:i+k]`` slices of the row-wise definition), all docs' k-gram
    windows stack into one batch matrix via ``sliding_window_view``,
    and md5 runs once per BATCH-UNIQUE gram (``np.unique`` rows +
    cross-batch cache) instead of once per character position. Window
    minima are one ``sliding_window_view(...).min(axis=1)`` per doc.
    Row-wise equivalence pinned by ``test_winnowing_matches_rowwise``;
    hashes stay ``md5(gram)[:8 bytes] >> 1`` so the DuckDB oracle
    recomputes them from substr+md5."""
    from numpy.lib.stride_tricks import sliding_window_view

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        # per-doc codepoint arrays (python .lower() — the row-wise
        # definition's case fold, NOT Arrow utf8_lower)
        codes: list[np.ndarray] = []
        for text in texts:
            s = (text or "").lower()
            codes.append(
                np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            )
        spans = np.array(
            [max(c.size - k + 1, 0) for c in codes], dtype=np.int64
        )
        total = int(spans.sum())
        out: list[list[int]] = [[] for _ in texts]
        if total:
            grams = np.empty((total, k), dtype=np.uint32)
            pos = 0
            for c, m in zip(codes, spans):
                if m:
                    grams[pos : pos + m] = sliding_window_view(c, k)
                    pos += m
            uniq, inv = np.unique(grams, axis=0, return_inverse=True)
            inv = np.asarray(inv).reshape(-1)  # numpy 2.0 axis-unique shape
            cache = _MD5_CHARGRAM_CACHE
            uh = np.empty(uniq.shape[0], dtype=np.uint64)
            for i, row in enumerate(uniq):
                g = "".join(map(chr, row))
                h = cache.get(g)
                if h is None:
                    h = _md5_u64(g) >> 1
                    if len(cache) < 2_000_000:
                        cache[g] = h
                uh[i] = h
            hashes = uh[inv]
            pos = 0
            for i, m in enumerate(spans):
                if m == 0:
                    continue
                arr = hashes[pos : pos + m]
                pos += m
                if arr.size <= window:
                    out[i] = [int(arr.min())]
                else:
                    mins = sliding_window_view(arr, window).min(axis=1)
                    out[i] = np.unique(mins).astype(np.int64).tolist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprints": pa.array(out, pa.list_(pa.int64())),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# TF-IDF + corpus splitting (training-data pipeline staples)
# ---------------------------------------------------------------------------

def document_frequencies(
    docs: rd.Dataset,
    *,
    min_df: int = 1,
    num_partitions: int = 64,
    combine: str = "partitioned",
) -> rd.Dataset:
    """(term, df) document frequencies: in-batch distinct-term partials
    (one row per (doc, term), deduped before leaving the task) combined
    by a partition-hashed sum — the shuffle moves the *vocabulary*, not
    the corpus. ``min_df`` prunes the long tail (the knob that bounds
    the broadcast idf table at 100 TB).

    ``combine="partitioned"`` (default) splits the vocabulary across
    ``num_partitions`` hash partitions — the unbounded-vocabulary scale
    shape. ``combine="tree"`` fans partials in through a two-level
    repartition tree instead (~2 s less fixed shuffle cost): the FINAL
    reducer holds the whole raw vocabulary in one block, so it is only
    for callers that collect the df table whole anyway (tfidf's idf
    broadcast) — never for an unbounded standalone aggregation."""
    from .shuffle import partitioned_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        # dictionary-encode kernel (the stages/enrich.py pattern): one
        # RE2 split over the whole batch, distinct (doc, term) pairs via
        # one np.unique over packed keys, df per term via bincount — no
        # per-document Python. Equivalence with the per-row findall
        # definition is pinned by test_tfidf_kernels_match_rowwise.
        doc, idx, denc = _tokenize_batch(batch["text"])
        nv = len(denc.dictionary)
        if nv == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        uk = np.unique(doc * nv + idx)
        df = np.bincount((uk % nv).astype(np.int64), minlength=nv).astype(np.int64)
        lens = pc.binary_length(denc.dictionary).to_numpy(zero_copy_only=False)
        keep = (df > 0) & (lens > 0)  # drop unused + empty boundary token
        return pa.table(
            {
                "term": denc.dictionary.filter(pa.array(keep)).cast(pa.string()),
                "df": pa.array(df[keep], pa.int64()),
            }
        )

    partials = docs.select_columns(["text"]).map_batches(
        partial, batch_format="pyarrow"
    )

    def combine_fn(part: pd.DataFrame) -> pd.DataFrame:
        out = part.groupby("term", as_index=False)["df"].sum()
        return out[out["df"] >= min_df]

    if combine == "tree":
        # per-block partials are already vocab-bounded: one fan-in block
        # + one vectorized pandas sum (min_df applied exactly, on the
        # complete per-term totals)
        return partials.repartition(1).map_batches(
            combine_fn, batch_format="pandas"
        )
    return partitioned_aggregate(
        partials, "term", combine_fn, num_partitions=num_partitions
    )


def tfidf_top_terms(
    docs: rd.Dataset,
    *,
    k: int = 5,
    min_df: int = 1,
    num_partitions: int = 64,
    max_vocab: int | None = 2_000_000,
) -> rd.Dataset:
    """Per-document top-k terms by smoothed TF-IDF
    (``tf * (ln((1+N)/(1+df)) + 1)``, sklearn's smooth idf) — the
    classic two-pass MapReduce shape: pass 1 aggregates document
    frequencies (vocabulary-sized shuffle), the pruned idf table
    broadcasts ONCE (``ray.put``), pass 2 streams the corpus again and
    scores + top-ks each document entirely inside its batch (a doc's
    terms never split across batches). Ties break to the
    lexicographically smaller term, matching the SQL oracle's
    ``ORDER BY score DESC, term``.

    The broadcast idf table is HARD-BOUNDED: past ``max_vocab`` terms
    the vocabulary is truncated to the top ``max_vocab`` by document
    frequency (ties to the lexicographically smaller term) via a
    distributed sort+limit, so the driver/worker idf structure never
    scales with corpus vocabulary. ``min_df`` prunes the long tail
    before the cap ever binds; on any bounded-vocabulary corpus the cap
    is invisible."""
    n_docs = docs.count()
    # tree combine: tfidf collects the df table whole right below (the
    # idf broadcast), so the unbounded-vocabulary groupby shape buys
    # nothing here and costs ~2 s of fixed shuffle overhead
    df_tbl = document_frequencies(
        docs, min_df=min_df, num_partitions=num_partitions, combine="tree"
    ).to_pandas()
    n_terms = len(df_tbl)
    if max_vocab is not None and n_terms > max_vocab:
        # no-silent-caps: a binding cap changes per-doc top-k output
        import warnings

        warnings.warn(
            f"tfidf_top_terms: vocabulary {n_terms} exceeds "
            f"max_vocab={max_vocab}; dropping the {n_terms - max_vocab} "
            "lowest-df terms (per-doc top-k may change past the cap)"
        )
        df_tbl = df_tbl.sort_values(
            ["df", "term"], ascending=[False, True], kind="stable"
        ).head(max_vocab)
    # sorted term array + parallel idf values: the score pass looks
    # terms up with ONE np.searchsorted per batch instead of a per-doc
    # Python dict walk
    t_order = np.argsort(df_tbl["term"].to_numpy(dtype=object), kind="stable")
    idf_terms = df_tbl["term"].to_numpy(dtype=object)[t_order]
    idf_vals = (
        np.log((1.0 + n_docs) / (1.0 + df_tbl["df"].to_numpy(np.float64))) + 1.0
    )[t_order]
    idf_ref = ray.put((idf_terms, idf_vals))

    def score(batch: pa.Table) -> pa.Table:
        """Vectorized scoring (dictionary-encode kernel): tf per
        (doc, term) via one np.unique over packed keys, idf gathered by
        searchsorted on the batch's UNIQUE terms only, per-doc top-k by
        one lexsort (score DESC, term ASC — same order as the per-row
        ``sort(key=(-score, term))``)."""
        idf_terms_, idf_vals_ = ray.get(idf_ref)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tfidf": pa.array([], pa.float64()),
            }
        )
        doc, idx, denc = _tokenize_batch(batch["text"])
        nv = len(denc.dictionary)
        if nv == 0 or doc.size == 0:
            return empty
        uk, tf = np.unique(doc * nv + idx, return_counts=True)
        d_i = (uk // nv).astype(np.int64)
        t_i = (uk % nv).astype(np.int64)
        # idf per dictionary term (NaN = not in vocabulary / empty token)
        uniq_terms = denc.dictionary.to_numpy(zero_copy_only=False)
        pos = np.searchsorted(idf_terms_, uniq_terms)
        pos_c = np.minimum(pos, max(idf_terms_.size - 1, 0))
        found = (
            (pos < idf_terms_.size) & (idf_terms_[pos_c] == uniq_terms)
            if idf_terms_.size
            else np.zeros(nv, dtype=bool)
        )
        idf_of = np.where(found, idf_vals_[pos_c], np.nan)
        mask = found[t_i]
        if not mask.any():
            return empty
        d_f, t_f = d_i[mask], t_i[mask]
        s_f = tf[mask].astype(np.float64) * idf_of[t_f]
        # per-term lexicographic rank for the ASC tie-break
        trank = np.empty(nv, dtype=np.int64)
        trank[np.argsort(uniq_terms, kind="stable")] = np.arange(nv)
        order = np.lexsort((trank[t_f], -s_f, d_f))
        d_s = d_f[order]
        grp_first = np.concatenate([[True], d_s[1:] != d_s[:-1]])
        grp_start = np.flatnonzero(grp_first)
        within = np.arange(d_s.size) - np.repeat(
            grp_start, np.diff(np.append(grp_start, d_s.size))
        )
        sel = within < k
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[d_s[sel]], pa.int64()),
                "term": denc.dictionary.take(
                    pa.array(t_f[order][sel], pa.int64())
                ).cast(pa.string()),
                "tfidf": pa.array(trunc6(s_f[order][sel]), pa.float64()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


# split-hash constants (decorrelated from fixtures.page_points' mix)
_SPLIT_MUL = 2246822519
_SPLIT_ADD = 3266489917


def corpus_split(
    docs: rd.Dataset,
    *,
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
) -> rd.Dataset:
    """Deterministic train/val/test assignment: a pure-arithmetic hash of
    ``doc_id`` → uniform u ∈ [0,1) → cumulative-fraction buckets. The
    hash is independent of every document attribute, so the split is
    stratified in expectation over any grouping (lang, source, …) and
    reproducible across runs/cluster sizes — no shuffle, no state, one
    vectorized map."""
    names = [n for n, _ in fractions]
    bounds = np.cumsum([f for _, f in fractions])
    assert abs(bounds[-1] - 1.0) < 1e-9, "fractions must sum to 1"

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        u = (
            (ids * np.uint64(_SPLIT_MUL) + np.uint64(_SPLIT_ADD))
            % np.uint64(4294967296)
        ).astype(np.float64) / 4294967296.0
        lab = np.select(
            [u < b for b in bounds[:-1]] + [np.ones_like(u, dtype=bool)],
            names,
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "split": pa.array(lab.astype(str), pa.string()),
            }
        )

    return docs.select_columns(["doc_id"]).map_batches(fn, batch_format="pyarrow")


def curate_corpus(
    docs: rd.Dataset,
    *,
    min_tokens: int = 10,
    min_stopword_ratio: float = 0.05,
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
) -> rd.Dataset:
    """End-to-end corpus curation — quality gate → exact dedup → split —
    fused for minimal data movement: ONE streaming pass computes token
    stats + content fingerprint and drops low-quality rows in-batch (the
    text never leaves the task), then the only shuffle moves
    (16-byte md5, doc_id) pairs hash-partitioned by fingerprint for the
    keep-smallest dedup, and split assignment is arithmetic on the
    surviving ids. Output: (doc_id, split) — the curated training
    manifest. The quality gate reuses the ``text_stats`` arithmetic
    (same expressions, so thresholds compare identically in the SQL
    oracle); dedup matches ``exact_dedup`` keep-smallest semantics;
    the split matches ``corpus_split``."""
    from .shuffle import partitioned_aggregate

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        toks = text.str.lower().str.findall(_TOKEN_RE)
        n_tokens = toks.map(len)
        n_stop = toks.map(lambda ws: sum(w in STOPWORDS for w in ws))
        ratio = n_stop / n_tokens.clip(lower=1)
        keep = (n_tokens >= min_tokens) & (ratio >= min_stopword_ratio)
        fp = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in text[keep]
        ]
        return pd.DataFrame(
            {
                "doc_id": batch.loc[keep, "doc_id"].astype("int64"),
                "fp": fp,
            }
        )

    gated = docs.select_columns(["doc_id", "text"]).map_batches(
        gate, batch_format="pandas"
    )

    def keep_min(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("fp", as_index=False)["doc_id"].min()

    kept = partitioned_aggregate(gated, "fp", keep_min)

    names = [n for n, _ in fractions]
    bounds = np.cumsum([f for _, f in fractions])

    def split(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        u = (
            (ids * np.uint64(_SPLIT_MUL) + np.uint64(_SPLIT_ADD))
            % np.uint64(4294967296)
        ).astype(np.float64) / 4294967296.0
        lab = np.select(
            [u < b for b in bounds[:-1]] + [np.ones_like(u, dtype=bool)],
            names,
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "split": pa.array(lab.astype(str), pa.string()),
            }
        )

    return kept.map_batches(split, batch_format="pyarrow")


def top_bigrams(
    docs: rd.Dataset, *, k: int = 20, num_partitions: int = 64
) -> rd.Dataset:
    """Corpus-wide top-k token bigrams — the LM-data n-gram-statistics
    staple. In-batch bigram counting (text never leaves the task), a
    vocabulary-sized partition-hashed sum, then a tiny global sort-limit
    on the aggregated (bigram, n) table. Ties break lexicographically,
    matching the SQL ``ORDER BY n DESC, bigram``.

    The in-batch count is fully vectorized: the shared dictionary-encode
    tokenizer (:func:`_tokenize_batch`) yields per-doc dictionary-index
    sequences; adjacent same-doc pairs pack into one uint64 each, one
    ``np.unique`` counts them, and only the UNIQUE pairs rehydrate to
    strings via two Arrow ``take``s + ``binary_join_element_wise``
    (row-wise-loop equivalence pinned by
    ``test_top_bigrams_kernel_matches_rowwise``)."""
    from .shuffle import partitioned_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        doc, idx, denc = _tokenize_batch(batch["text"])
        dict_arr = denc.dictionary
        tok_len = pc.binary_length(dict_arr).to_numpy(zero_copy_only=False)
        keep = tok_len[idx] > 0  # drop split-artifact empty tokens
        doc, idx = doc[keep], idx[keep]
        if idx.size < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        if len(dict_arr) >= (1 << 32):  # unreachable for any sane batch
            raise ValueError("top_bigrams: per-batch token dictionary > 2^32")
        same = doc[1:] == doc[:-1]
        a = idx[:-1][same].astype(np.uint64)
        b = idx[1:][same].astype(np.uint64)
        packed = (a << np.uint64(32)) | b
        uniq, counts = np.unique(packed, return_counts=True)
        ua = (uniq >> np.uint64(32)).astype(np.int64)
        ub = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)
        bigram = pc.binary_join_element_wise(
            pc.take(dict_arr, pa.array(ua)),
            pc.take(dict_arr, pa.array(ub)),
            " ",
        )
        return pa.table(
            {"bigram": bigram, "n": pa.array(counts.astype(np.int64))}
        )

    partials = docs.select_columns(["text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    counts = partitioned_aggregate(
        partials,
        "bigram",
        lambda p: p.groupby("bigram", as_index=False)["n"].sum(),
        num_partitions=num_partitions,
    )
    # per-block partial top-k + one tiny combine — the counts table is
    # vocab-sized, and a full sort of it to keep k rows is the most
    # expensive way to find them (see shuffle.partial_topk)
    from .shuffle import partial_topk

    return partial_topk(
        counts, [("n", "descending"), ("bigram", "ascending")], k
    )


def length_quantiles(
    docs: rd.Dataset,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    *,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """EXACT distributed quantiles of document length (the corpus
    length-filter primitive): per-batch value-count partials → a
    partition-hashed sum keyed by the length VALUE (the shuffle moves
    the value histogram, not the corpus) → the tiny final histogram
    resolves each quantile as the smallest value whose cumulative count
    reaches ``ceil(q·n)`` — a deterministic discrete-quantile rule the
    SQL oracle reproduces with a window-function scan. Returns a small
    pandas frame (q, n_chars)."""
    from .shuffle import partitioned_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["text"].fillna("").str.len().value_counts()
        return pd.DataFrame(
            {
                "n_chars": vc.index.to_numpy(np.int64),
                "cnt": vc.to_numpy(np.int64),
            }
        )

    hist = (
        partitioned_aggregate(
            docs.select_columns(["text"]).map_batches(partial, batch_format="pandas"),
            "n_chars",
            lambda p: p.groupby("n_chars", as_index=False)["cnt"].sum(),
            num_partitions=num_partitions,
        )
        .to_pandas()
        .sort_values("n_chars")
        .reset_index(drop=True)
    )
    if hist.empty:
        return pd.DataFrame(columns=["q", "n_chars"])
    cum = hist["cnt"].cumsum().to_numpy()
    n = int(cum[-1])
    vals = hist["n_chars"].to_numpy()
    out = []
    for q in qs:
        rank = int(np.ceil(q * n))
        out.append((q, int(vals[np.searchsorted(cum, rank, "left")])))
    return pd.DataFrame(out, columns=["q", "n_chars"])
