import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from yckg_spark.session import get_spark

    s = get_spark("yckg-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def smoke_fixture_dir():
    from fixtures.generate import default_fixture

    return default_fixture("smoke")
