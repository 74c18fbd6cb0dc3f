from __future__ import annotations

import tempfile

import pytest

from faers_datalakehouse_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Fresh warehouse per test session: the in-memory catalog resets on
    # session restart but managed-table directories persist, so reusing a
    # warehouse path collides with LOCATION_ALREADY_EXISTS on re-create.
    wh = tempfile.mkdtemp(prefix="spark_wh_")
    s = get_spark(
        "tests",
        cpus=8,
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF0001
