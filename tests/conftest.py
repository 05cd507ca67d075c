from __future__ import annotations

import pandas as pd
import pytest

from wtq.generate import ensure_pages
from wtq.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("wtq-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_path() -> str:
    return ensure_pages(SF_SMOKE)


@pytest.fixture(scope="session")
def pages_pdf(pages_path) -> pd.DataFrame:
    return pd.read_parquet(pages_path)
