import os

import pytest
from hypothesis import settings

os.environ.setdefault("RAY_DISABLE_IMPORT_WARNING", "1")

# deterministic property tests: the correctness gate must not flake on a
# random draw — the randomized sweeps in-repo already cover breadth
settings.register_profile("ci", derandomize=True, deadline=None)
settings.load_profile("ci")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
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
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()
