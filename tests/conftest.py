import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boann_ocsf_security_data_platform_spark import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = f"{TESTDATA}/sf0.001"
SF_ORACLE = f"{TESTDATA}/sf0.01"
FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="boann-tests", master="local[4]")
    yield s


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES


def pytest_collection_modifyitems(config, items):
    """Opt-in hash sharding (PYTEST_SHARD=i/n): tools/run_tests_parallel.py
    runs n pytest processes, each keeping the deterministic 1/n slice of
    collected items whose crc32(nodeid) lands on its shard — poor-man's
    pytest-xdist (not installable in this container), chosen over per-file
    queueing because the dominant cost (the ~200 parametrized oracle
    comparisons in test_oracle.py) must itself split across workers to get
    suite wall-clock under the CI budget. Each worker owns its own Spark
    session; tests are already path-isolated via tmp_path."""
    shard = os.environ.get("PYTEST_SHARD")
    if not shard:
        return
    import zlib

    idx, n = (int(x) for x in shard.split("/"))
    keep, drop = [], []
    for it in items:
        (keep if zlib.crc32(it.nodeid.encode()) % n == idx else drop).append(it)
    items[:] = keep
    config.hook.pytest_deselected(items=drop)
