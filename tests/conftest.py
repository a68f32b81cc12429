from __future__ import annotations

import pytest

from data_migration_validator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(app_name="dmv-tests", cores=4, shuffle_partitions=8)
    yield sp


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path)
