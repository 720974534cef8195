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
