"""Per-partition lineage manifests for resumable output (north_rule).

The reference's resume granularity is whole pipeline steps (one file per
step, rerun on crash — ``go.bash:10-20``). At 10^12-row scale the unit
must be the output partition: each partition directory is written
atomically (tmp dir + rename) together with a small JSON manifest
recording the input lineage (partition key, row count, content
fingerprint, engine version). A rerun calls :func:`pending_partitions`
and skips anything whose manifest is already committed.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field

MANIFEST_NAME = "_MANIFEST.json"


@dataclass
class PartitionManifest:
    partition: str
    rows: int
    fingerprint: str
    inputs: list[str]
    engine_version: str = "0.1.0"
    # per-partition metrics (north_rule: "per-partition lineage +
    # metrics"): commit_partition fills write_s/bytes; callers may add
    # their own counters before committing
    metrics: dict = field(default_factory=dict)


def commit_partition(out_root: str, partition: str, write_fn, manifest: PartitionManifest) -> str:
    """Atomically materialize one partition: ``write_fn(tmp_dir)`` writes
    the data files, then the tmp dir renames into place with its manifest.
    Idempotent: an existing committed partition is left untouched."""
    final_dir = os.path.join(out_root, partition)
    if is_committed(out_root, partition):
        return final_dir
    os.makedirs(out_root, exist_ok=True)
    tmp_dir = tempfile.mkdtemp(prefix=f".{partition.replace('/', '_')}-", dir=out_root)
    try:
        t0 = time.monotonic()
        write_fn(tmp_dir)
        manifest.metrics = {
            "write_s": round(time.monotonic() - t0, 6),
            "bytes": sum(
                e.stat().st_size for e in os.scandir(tmp_dir) if e.is_file()
            ),
            **manifest.metrics,
        }
        with open(os.path.join(tmp_dir, MANIFEST_NAME), "w") as f:
            json.dump(asdict(manifest), f)
        if os.path.exists(final_dir):  # crashed mid-rename before: replace
            import shutil

            shutil.rmtree(final_dir)
        os.replace(tmp_dir, final_dir)
    except BaseException:
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise
    return final_dir


def is_committed(out_root: str, partition: str) -> bool:
    return os.path.exists(os.path.join(out_root, partition, MANIFEST_NAME))


def read_manifest(out_root: str, partition: str) -> PartitionManifest | None:
    path = os.path.join(out_root, partition, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return PartitionManifest(**json.load(f))


def pending_partitions(out_root: str, partitions: list[str]) -> list[str]:
    """The subset of ``partitions`` not yet committed — the resume set."""
    return [p for p in partitions if not is_committed(out_root, p)]
