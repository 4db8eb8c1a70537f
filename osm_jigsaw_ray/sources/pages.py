"""Pages sources.

* :func:`pages_from_documents` — derive an ``input_hint``-shaped pages
  table 1:1 from the driver's ``documents`` parquet (doc_id kept as an
  extra key column so the DuckDB oracle can recompute points/urls
  arithmetically).
* :func:`synthetic_pages` — pure generator at any scale (bench corpus).

Both embed the page text and the deterministic geo point into the html
payload; the extractor must recover the text byte-identically
(``BASELINE.json: input_hint`` invariant).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..fixtures import generate_pages, page_points, render_html


#: the columns the extract→join path actually consumes — ``text`` is
#: re-derived from ``html`` by the extractor (byte-identical invariant),
#: so decoding it off parquet is pure waste
PAGE_READ_COLS = ["url", "warc_ts", "html", "lang"]


def read_pages(
    path: str, *, columns: list[str] | None = None, **kw
) -> rd.Dataset:
    """Fusion-eligible corpus read: one read block per parquet file.

    At planet scale (file count far above the read-parallelism floor)
    Ray Data leaves files unsplit and ``Read->MapBatches`` fuse into ONE
    task pool — the wide ``html`` column never enters the object store.
    At bench/test scale the floor makes ``SetReadParallelismRule`` split
    each file (``additional_split_factor`` 2), which silently disables
    operator fusion (``operator_fusion.FuseOperators._can_fuse`` refuses
    any split read) and re-routes every html byte through the object
    store. Pinning ``override_num_blocks`` to the file count makes the
    local plan match the plan the same pipeline gets at scale
    (measured: 1M-page headline 30.8→24.3 s at 8 cpus, 11.3→9.7 s at
    32). Falls back to the default read when the path is not a flat
    parquet directory."""
    if "override_num_blocks" not in kw and os.path.isdir(path):
        n = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
        if n:
            kw["override_num_blocks"] = n
    return rd.read_parquet(path, columns=columns, **kw)


def _derive_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    lat, lon = page_points(ids)
    urls = [f"https://example.org/p/{i:08d}" for i in ids]
    htmls = [
        render_html(int(i), float(lat[k]), float(lon[k]), texts[k] or "")
        for k, i in enumerate(ids)
    ]
    ts = pa.array(
        np.datetime64("2025-01-01T00:00:00", "us") + ids.astype("timedelta64[s]"),
        type=pa.timestamp("us"),
    )
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
        }
    )


def pages_from_documents(sf_dir: str) -> rd.Dataset:
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return docs.map_batches(_derive_batch, batch_format="pyarrow")


def synthetic_pages(
    n: int, *, parallelism: int = 8, filler_kb: int = 0
) -> rd.Dataset:
    """Seeded pages at any scale, generated distributed: each Ray task
    materializes its id range (no driver-side giant table).
    ``filler_kb`` adds realistic boilerplate around the article so the
    payload weight matches real crawl pages."""
    shard = max(1, n // max(1, parallelism))
    starts = list(range(0, n, shard))

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for s in batch["start"].to_pylist():
            out.append(
                generate_pages(min(shard, n - s), start_id=s, filler_kb=filler_kb)
            )
        return pa.concat_tables(out)

    # seed rows must exceed DataContext.target_min_block_size or Ray Data
    # bundles ALL of them into a single map task (tiny 8-byte seed blocks
    # coalesce → the whole corpus generates serially — measured, not
    # hypothetical); the 2 MiB pad forces one generation task per shard
    pad = b"\x00" * (2 * 1024 * 1024)
    seed_ds = rd.from_arrow(
        pa.table(
            {
                "start": pa.array(starts, pa.int64()),
                "pad": pa.array([pad] * len(starts), pa.binary()),
            }
        )
    )
    return seed_ds.repartition(len(starts)).map_batches(
        gen, batch_format="pyarrow", batch_size=1
    )
