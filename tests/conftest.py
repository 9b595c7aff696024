from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from etl_challenge_localiza_spark.session import get_spark

    # 8 local cores + 8 shuffle partitions keeps tiny-data tests fast
    # (32-way shuffles on 20-row fixtures are pure overhead).
    s = get_spark(app_name="pytest", cpus=8)
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s


@pytest.fixture(scope="session")
def sf0001() -> str:
    return "/root/testdata/sf0.001"
