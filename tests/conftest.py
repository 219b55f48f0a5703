import sys

import pytest

REFERENCE_PATH = '/root/reference'


@pytest.fixture(scope='session')
def ray_session():
    """Initialise Ray ONCE per pytest session (driver contract: tests own
    their Ray session; library code never calls ray.init)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address='local', num_cpus=4, include_dashboard=False,
            ignore_reinit_error=True, logging_level='ERROR',
        )
    yield
    ray.shutdown()


@pytest.fixture(scope='session', autouse=True)
def _quiet_ray_data():
    try:
        from ray.data import DataContext
        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield


@pytest.fixture(scope='session')
def reference():
    """The reference implementation, imported from the read-only checkout
    (it is not pip-installed). Used solely as a differential-testing oracle."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import fastjsonschema
    return fastjsonschema
