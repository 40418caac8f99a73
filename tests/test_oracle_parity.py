"""Differential test: every registry query vs its DuckDB oracle at sf0.001.

This mirrors exactly what the driver does at sf0.01 (row count + schema +
order-insensitive values), so a green run here predicts a green
CORRECTNESS_r{N}.json.
"""

import pytest

from fagi_gis_spark import registry
from tests.conftest import SF_TINY, assert_frames_match

NAMES = sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = registry.queries()[name]
    sdf = q(spark, SF_TINY)
    ddf = duck.execute(registry.oracle_sql()[name]).df()
    assert len(ddf) > 0, f"oracle for {name} returned 0 rows — weak test"
    assert_frames_match(sdf, ddf)
