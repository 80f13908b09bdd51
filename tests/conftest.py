"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # order-dependent operators (unique/tail/enumerate) are tested here
    ctx.execution_options.preserve_order = True
    yield
    ray.shutdown()
