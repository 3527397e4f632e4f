from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Keep test shuffles narrow; AQE coalesces anyway.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from graphsense_blocksci_spark.session import get_spark

    s = get_spark("gbs-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory) -> str:
    from graphsense_blocksci_spark import fixtures

    return str(fixtures.ensure_fixtures())
