"""Additive schema evolution (SURVEY.md §2.3 T11, §7.3 #3).

The reference evolves schemas additively: dbt ``on_schema_change=
'append_new_columns'`` (contacts.sql:5) plus ``ALTER TABLE ... ADD COLUMN
IF NOT EXISTS`` migrations. Here: a column unknown to the table appears in
a batch mid-replay; the merge promotes the schema in the same commit, old
files read the new column as null, and no restart happens. The feed
generator makes ``tool`` appear only in the late half of the feed, so the
promotion genuinely fires in-flight.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.schemas import TRANSCRIPT, TRANSCRIPT_KEY
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

from tests.oracle import COMPARE_COLS, expected_state, table_to_state

NO_TOOL = T.StructType([f for f in TRANSCRIPT.fields if f.name != "tool"])


def test_merge_promotes_new_column(spark, feed_path, tmp_path):
    """merge_upsert(evolve=True) appends unseen batch columns to the table
    schema atomically with the data; pre-evolution rows read as null."""
    t = SnapshotTable.create(spark, str(tmp_path / "t"), NO_TOOL, TRANSCRIPT_KEY, num_buckets=4)
    from cht_sync_spark.functions.json_doc import doc_to_row

    rows = doc_to_row(ChangesFeedSource(spark, feed_path).df())
    early = rows.where(F.col("tool").isNull()).drop("tool").limit(50)
    merge_upsert(t, early)
    assert "tool" not in [f.name for f in t.snapshot().schema.fields]

    late = rows.where(F.col("tool").isNotNull())
    assert late.count() > 0
    merge_upsert(t, late)  # evolve=True default
    names = [f.name for f in t.snapshot().schema.fields]
    assert names[-1] == "tool" and "tool" in names  # appended, not reordered
    cur = t.read_current()
    assert cur.where(F.col("tool").isNotNull()).count() > 0
    # time travel: pre-evolution snapshot still reads with its own schema
    assert "tool" not in t.snapshot(version=2).schema.fieldNames()


def test_pipeline_evolves_in_flight(spark, feed_path, tmp_path, feed_df):
    """Full replay into a table that starts WITHOUT the late-added column:
    the batch where ``tool`` first materializes promotes the schema and the
    final state still matches the sequential oracle exactly."""
    path = str(tmp_path / "t")
    SnapshotTable.create(spark, path, NO_TOOL, TRANSCRIPT_KEY, num_buckets=8)
    pipe = ReplayPipeline(
        spark, ChangesFeedSource(spark, feed_path, sources=feed_sources()), path, batch_size=300, num_buckets=8
    )
    pipe.run()
    assert "tool" in pipe.table.snapshot().schema.fieldNames()

    oracle = expected_state([r.asDict() for r in feed_df.collect()])
    got = table_to_state([r.asDict() for r in pipe.table.read_current().collect()])
    assert set(got) == set(oracle)
    for _id in oracle:
        for c in COMPARE_COLS:
            assert got[_id][c] == oracle[_id][c], f"{_id}.{c}"


def test_extras_overflow_map(spark):
    """Fields not yet in the typed payload land in the _extras map with
    their JSON text values; known fields are excluded."""
    from cht_sync_spark.functions.json_doc import doc_extras

    df = spark.createDataFrame(
        [
            ('{"_id":"a:1","text":"hi","brand_new":"v1","nested":{"x":1}}',),
            ('{"_id":"a:2","text":"yo"}',),
            (None,),
        ],
        "doc string",
    )
    out = df.select(doc_extras(F.col("doc")).alias("ex")).collect()
    assert out[0]["ex"] == {"brand_new": "v1", "nested": '{"x":1}'}
    assert out[1]["ex"] == {}
    assert out[2]["ex"] is None


def test_type_widening_int_to_long_and_float_to_double(spark, tmp_path):
    """Widening evolution (Iceberg's int->long / float->double promotion):
    a wider batch widens the table column in the same commit; OLD parquet
    files (written int32/float) read correctly under the widened schema
    (Spark 4's vectorized reader upcasts in place — no rewrite)."""
    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("n", T.IntegerType(), True),
            T.StructField("x", T.FloatType(), True),
            T.StructField("seq", T.LongType(), True),
        ]
    )
    t = SnapshotTable.create(spark, str(tmp_path / "w"), schema, ["k"], num_buckets=2)
    merge_upsert(t, spark.createDataFrame([("a", 1, 1.5, 1)], schema))

    wide = spark.createDataFrame(
        [("b", 2**40, 2.5, 2)], "k string, n long, x double, seq long"
    )
    merge_upsert(t, wide)
    got = {f.name: f.dataType.simpleString() for f in t.snapshot().schema.fields}
    assert got["n"] == "bigint" and got["x"] == "double"

    rows = {r["k"]: (r["n"], r["x"]) for r in t.read_current().collect()}
    assert rows["a"] == (1, 1.5) and rows["b"] == (2**40, 2.5)

    # narrower batches keep flowing (cast up by _conform), schema stable
    merge_upsert(t, spark.createDataFrame([("c", 3, 3.5, 3)], schema))
    assert {f.name: f.dataType.simpleString() for f in t.snapshot().schema.fields} == got
    assert t.read_current().count() == 3


def test_type_widening_never_touches_key_or_bucket_cols(spark, tmp_path):
    """A wider KEY column must not widen: bucket layout is pmod(xxhash64)
    over the physical type, so widening would silently re-bucket future
    writes away from existing rows. The wider batch is cast down instead."""
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),
            T.StructField("v", T.StringType(), True),
            T.StructField("seq", T.LongType(), True),
        ]
    )
    t = SnapshotTable.create(spark, str(tmp_path / "kw"), schema, ["k"], num_buckets=4)
    merge_upsert(t, spark.createDataFrame([(1, "a", 1)], schema))
    merge_upsert(t, spark.createDataFrame([(2, "b", 2)], "k long, v string, seq long"))
    assert t.snapshot().schema["k"].dataType.simpleString() == "int"
    assert {r["k"]: r["v"] for r in t.read_current().collect()} == {1: "a", 2: "b"}
