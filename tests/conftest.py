import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # run the suite under the ENGINE default strategy (hash unless
    # GRAFT_SHUFFLE=sort) — tests must be green under what ships
    from osm_jigsaw_ray.pipelines.shuffle import apply_default_strategy

    apply_default_strategy()
    yield
    ray.shutdown()
