"""Driver-contract guards.

The external driver hashes query results column-by-column after
sorting by name; complex column types (arrays, structs, maps) risk
representation mismatches between Spark and DuckDB, so every
queries() output must be flat scalars — enforced here so future
additions can't regress the gate."""

from __future__ import annotations

import importlib
import sys

import pytest
from pyspark.sql import types as T

sys.path.insert(0, "/root/repo")
entry_mod = importlib.import_module("__spark_entry__")

ATOMIC = (
    T.StringType, T.BooleanType, T.IntegerType, T.LongType, T.ShortType,
    T.ByteType, T.DoubleType, T.FloatType, T.DecimalType, T.DateType,
    T.TimestampType, T.TimestampNTZType,
)


def test_queries_and_oracles_aligned():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(q) == set(o)
    assert len(q) >= 40


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_schema_is_flat(name, spark):
    df = entry_mod.queries()[name](spark, "/root/testdata/sf0.001")
    bad = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if not isinstance(f.dataType, ATOMIC)
    ]
    assert not bad, f"non-atomic output columns in {name}: {bad}"


def test_entry_contract(spark):
    df = entry_mod.entry(spark)
    names = [f.name for f in df.schema.fields]
    assert names == ["url", "keep", "fired_rules"]
