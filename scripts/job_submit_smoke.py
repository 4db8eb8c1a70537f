"""`ray job submit` lifecycle smoke (round-3 verdict item #9).

Attempts the real job-submission path end-to-end:

    ray start --head --num-cpus=8   (job server rides the head node)
    ray job submit --address http://127.0.0.1:8265 --working-dir . -- \
        python scripts/job_entry.py --osm ... --build ... --pages 500
    ray stop

and prints one JSON line: either the successful run's metrics or the
exact blocker (this sandbox lacks `aiohttp`, which the dashboard job
agent needs to serve the Jobs REST API — `ray[data]` is baked in, not
`ray[default]`, and installs are out of scope). Either way the result
is recorded in README.md / BENCH_RESULTS.md; the driver logic itself is
covered by the direct-invocation tests of `scripts/job_entry.py`.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def sh(cmd: list[str], timeout: int = 300, **kw) -> subprocess.CompletedProcess:
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, **kw
    )


def main() -> None:
    rec: dict = {"metric": "ray job submit lifecycle smoke"}
    try:
        import aiohttp  # noqa: F401

        rec["aiohttp"] = True
    except ImportError:
        rec["aiohttp"] = False

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # preset =local would bypass the cluster
    run_dir = "/tmp/ray_jigsaw_jobsmoke"
    if os.path.isdir(run_dir):
        shutil.rmtree(run_dir)

    head = sh(
        ["ray", "start", "--head", "--num-cpus=8", "--port=6379",
         "--dashboard-host=127.0.0.1"],
        env=env,
    )
    rec["ray_start_rc"] = head.returncode
    if head.returncode != 0:
        rec["blocker"] = (head.stderr or head.stdout)[-1500:]
        print(json.dumps(rec))
        return
    try:
        t0 = time.time()
        sub = sh(
            [
                "ray", "job", "submit",
                "--address", "http://127.0.0.1:8265",
                "--working-dir", str(ROOT),
                "--",
                sys.executable, "scripts/job_entry.py",
                "--osm", f"{run_dir}/osm", "--build", f"{run_dir}/build",
                "--pages", "500", "--partitions", "4",
            ],
            env=env,
            timeout=420,
            cwd=str(ROOT),
        )
        rec["submit_rc"] = sub.returncode
        rec["wall_sec"] = round(time.time() - t0, 1)
        if sub.returncode == 0:
            metrics = f"{run_dir}/build/_RUN_METRICS.json"
            rec["run_metrics"] = (
                json.load(open(metrics)) if os.path.isfile(metrics) else None
            )
            rec["status"] = "succeeded"
        else:
            rec["status"] = "failed"
            rec["blocker"] = (sub.stderr or sub.stdout)[-1500:]
    finally:
        sh(["ray", "stop", "--force"], env=env)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
