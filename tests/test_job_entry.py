"""`ray job submit` entrypoint test: the job driver script runs the
step pipeline under its own Ray session (direct invocation — the
sandbox has no job server; the driver logic is identical) and writes
run-level metrics with per-partition rollups. Resubmission resumes:
committed partitions are skipped."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(build, osm):
    return subprocess.run(
        [
            sys.executable, "scripts/job_entry.py",
            "--osm", osm, "--build", build,
            "--steps", "synth,areas,graph,tags,raster",
            "--pages", "200", "--partitions", "4",
        ],
        cwd=REPO,
        env={**os.environ, "RAY_GRAFT_CPUS": "4"},
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_job_entry_runs_and_resumes(tmp_path):
    build = str(tmp_path / "build")
    osm = str(tmp_path / "osm")
    r = _run(build, osm)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    m = json.load(open(f"{build}/_RUN_METRICS.json"))
    assert set(m["steps"]) == {"synth", "areas", "graph", "tags", "raster"}
    assert m["cluster_cpus"] == 4
    assert m["partitions"]["raster"]["partitions"] == 6
    assert m["partitions"]["raster"]["bytes"] > 0
    first_bytes = m["partitions"]["raster"]["bytes"]

    # resubmit: raster partitions are already committed -> resumed, and
    # the rollup is unchanged (no double-writing)
    r2 = _run(build, osm)
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert "committed 0 new band partitions" in r2.stdout
    m2 = json.load(open(f"{build}/_RUN_METRICS.json"))
    assert m2["partitions"]["raster"]["bytes"] == first_bytes
