"""Skew-salted join.

When a join key is heavily skewed (one hot key owns a large share of
the fact side), a plain hash join puts the whole hot key in one task.
Salting splits each fact row into one of `salt` sub-keys and replicates
the (small) other side `salt` times, so the hot key spreads over
`salt` tasks.  AQE's skew-join handles sort-merge cases adaptively;
explicit salting is the deterministic fallback the north rule asks for.

Join-type contract: fact-preserving types only (inner, left outer,
left semi, left anti).  Replicating the dim side is transparent to
those — every fact row sees exactly one replica at its own salt, and
unmatched fact rows surface once.  Right/full outer are REJECTED:
a dim row with no fact match would surface once per replica (`salt`
null-padded duplicates), silently corrupting the result.  De-duping
those post-join would need a second shuffle on the dim key — at that
point a plain AQE skew join is strictly better, so we refuse rather
than pretend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPPORTED_HOW = ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on `key` with `salt`-way salting.  For the
    supported fact-preserving join types the result is identical to
    fact.join(dim, key, how) — verified per-type in
    tests/test_scale_properties.py."""
    if how not in SUPPORTED_HOW:
        raise ValueError(
            f"salted_join supports fact-preserving join types {SUPPORTED_HOW}; "
            f"got {how!r} — dim replication would emit duplicate unmatched rows"
        )
    f = fact.withColumn("__salt", F.pmod(F.hash(*fact.columns), F.lit(salt)))
    d = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return f.join(d, [key, "__salt"], how).drop("__salt")
