from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_loader_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
# ILS_FORCE_NO_TESTDATA=1 simulates a hosted-CI runner locally so the
# skip gate itself is testable where the fixtures DO exist.
HAS_TESTDATA = os.path.isdir(SF_SMOKE) and not os.environ.get(
    "ILS_FORCE_NO_TESTDATA"
)


def pytest_collection_modifyitems(config, items):
    """On hosts without the driver-generated /root/testdata fixtures
    (e.g. hosted CI runners), skip every test that reads them: anything
    using the ``sf_dir`` fixture plus modules marked
    ``requires_testdata``. Self-contained tests (table format, loader
    contract, normalization, partitioning, …) still run everywhere."""
    if HAS_TESTDATA:
        return
    skip = pytest.mark.skip(
        reason="driver-generated /root/testdata fixtures not present"
    )
    for item in items:
        mod = getattr(item, "module", None)
        imports_smoke = mod is not None and "SF_SMOKE" in vars(mod)
        if (
            "sf_dir" in getattr(item, "fixturenames", ())
            or imports_smoke
            or item.get_closest_marker("requires_testdata")
        ):
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
