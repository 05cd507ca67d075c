"""Rule-semantics bridge (FIXTURES.md §5): prove the map/array operator
semantics carried over from the reference on a hand-written fixture
shaped like its records (way_osm_id, tags map, nodes array), firing
reference-style rule codes before the machinery is re-targeted at web
text.

Covers: P6 map lookup (tags ->> k), P7 key existence (tags ? k),
P8 IN-list, P10 CASE→code ladder (proccess_data.sql:519-538),
P14 tag-clean blocklist via map_filter + drop-if-empty
(water.lua:84-221), array access nodes[1]/nodes[last]
(proccess_data.sql:121,125), U3-as-single-pass rollup.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("way_osm_id", T.LongType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("nodes", T.ArrayType(T.LongType())),
    ]
)

ROWS = [
    # fires 6-2: waterway=river + bridge=culvert (proccess_data.sql:519-526)
    (1, {"waterway": "river", "bridge": "culvert", "name": "r1"}, [10, 11, 12]),
    # fires 6-3: landuse=reservoir (proccess_data.sql:529-538)
    (2, {"landuse": "reservoir", "name": "r2"}, [20, 21]),
    # clean record
    (3, {"waterway": "stream", "name": "r3"}, [30, 31, 32, 33]),
    # record whose tags are ALL blocklisted → dropped at ingest
    (4, {"note": "x", "source": "y"}, [40, 41]),
]

BLOCKLIST = ("note", "source", "fixme")


@pytest.fixture(scope="module")
def ways(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_map_filter_blocklist_drop_if_empty(ways):
    """P14: remove blocklisted keys; drop the record if nothing left
    (clean_tags returns true → record skipped, water.lua:221,247)."""
    cleaned = ways.withColumn(
        "tags", F.map_filter("tags", lambda k, v: ~k.isin(*BLOCKLIST))
    ).filter(F.size(F.map_keys("tags")) > 0)
    ids = [r.way_osm_id for r in cleaned.orderBy("way_osm_id").collect()]
    assert ids == [1, 2, 3]


def test_case_ladder_rule_codes(ways):
    """P10 + U3-as-single-pass: the reference evaluates 13 unioned rule
    blocks; one CASE array pass is semantically equal."""
    tags = F.col("tags")
    arr = F.array(
        F.when(
            (tags["waterway"].isin("river", "stream", "canal", "drain", "ditch"))
            & (F.map_contains_key(tags, "bridge"))
            & (tags["bridge"] == "culvert"),
            F.lit("6-2"),
        ),
        F.when(tags["landuse"] == "reservoir", F.lit("6-3")),
    )
    fired = ways.select(
        "way_osm_id",
        F.array_sort(F.filter(arr, lambda x: x.isNotNull())).alias("codes"),
    )
    got = {r.way_osm_id: list(r.codes) for r in fired.collect()}
    assert got == {1: ["6-2"], 2: ["6-3"], 3: [], 4: []}


def test_node_endpoint_access(ways):
    """nodes[1] / nodes[cardinality(nodes)] → element_at ±1, the
    first/last-node join keys (proccess_data.sql:121,125,265,341)."""
    eps = ways.select(
        "way_osm_id",
        F.element_at("nodes", 1).alias("first_node"),
        F.element_at("nodes", -1).alias("last_node"),
    ).orderBy("way_osm_id")
    rows = [(r.first_node, r.last_node) for r in eps.collect()]
    assert rows == [(10, 12), (20, 21), (30, 33), (40, 41)]


def test_endpoint_graph_join(spark, ways):
    """J2: equi-join on a derived array-element key — ways whose last
    node is another way's first node (the graph_nodes pattern,
    proccess_data.sql:118-133)."""
    ends = ways.select(F.col("way_osm_id").alias("w1"), F.element_at("nodes", -1).alias("node"))
    starts = ways.select(F.col("way_osm_id").alias("w2"), F.element_at("nodes", 1).alias("node"))
    extra = spark.createDataFrame([(5, {"waterway": "river"}, [12, 99])], SCHEMA)
    starts2 = extra.select(F.col("way_osm_id").alias("w2"), F.element_at("nodes", 1).alias("node"))
    joined = ends.join(starts.unionByName(starts2), "node").filter("w1 <> w2")
    assert [(r.w1, r.w2) for r in joined.collect()] == [(1, 5)]
