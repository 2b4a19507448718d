"""Bucketed table sink/source: co-located route joins with NO exchange.

SURVEY §2.1 sinks + the DESIGN §4 shuffle budget: every relate join
shuffles both sides on the group keys unless the data already satisfies
that clustering. Spark's bucketed tables persist a hash-clustering on
disk (``bucketBy`` + ``saveAsTable``), so a route network saved once with
:func:`save_bucketed` joins against any other table bucketed the same way
with ZERO Exchange nodes — at 100 TB that is the difference between
re-shuffling the corpus per query and scanning co-located buckets.

Notes that matter in this engine:

- Bucket AFTER :func:`linref_spark.events.frame.add_event_id`: id minting
  materializes through ``localCheckpoint``, which erases the logical
  partitioning info (an ``ExistingRDD`` reports unknown partitioning), so
  bucket-then-mint loses the exchange elision; mint-then-bucket keeps it.
- The binned strategy ALSO skips the shuffle — its join keys are
  (route, bin), a superset of the bucket cols — but only with
  ``spark.sql.requireAllClusterKeysForCoPartition=false`` (by default
  Spark demands every join key be a bucket key before eliding the
  exchange; with the conf relaxed, hash-clustering on route alone
  satisfies the (route, bin) clustering — verified plan + identical
  pair counts).
- Bucket counts must MATCH on both sides for exchange-free joins
  (Spark joins bucketed tables without a shuffle only when the bucket
  spec lines up); :func:`bucket_spec` reads a saved table's spec so a
  second table can be written to match.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 64,
    sort_cols: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-bucketed) table.

    ``sort_cols`` defaults to ``bucket_cols``; sorting within buckets lets
    downstream sort-merge joins skip the per-task sort too. ``path`` makes
    the table external (data at ``path``, metadata in the session
    catalog); omitted, it lands in the warehouse dir.
    """
    sort_cols = list(sort_cols) if sort_cols is not None else list(bucket_cols)
    w = (
        df.write.format(format)
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def load_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its clustering intact (a plain
    ``spark.table``; the name exists so pipelines read/write through one
    seam and the docstring contract above is discoverable)."""
    return spark.table(table)


def bucket_spec(
    spark: SparkSession, table: str
) -> Optional[Tuple[Tuple[str, ...], int]]:
    """(bucket columns, bucket count) of a saved table, or None if the
    table is not bucketed — use to write a join partner with a MATCHING
    spec."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r.col_name: (r.data_type or "") for r in rows}
    n = info.get("Num Buckets")
    cols = info.get("Bucket Columns")
    if not n or not cols:
        return None
    names = tuple(re.findall(r"`([^`]+)`", cols)) or tuple(
        c.strip() for c in cols.strip("[]").split(",") if c.strip()
    )
    return names, int(n)
