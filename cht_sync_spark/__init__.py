"""cht_sync_spark — a PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of the reference CDC pipeline (medic/cht-sync:
CouchDB ``_changes`` feed -> checkpointed batches -> Postgres upsert landing
table -> incremental dbt transforms) as an idiomatic Spark design:

- a seq-ordered changes-feed source with per-partition checkpoints
  (:mod:`cht_sync_spark.sources`),
- last-writer-wins dedup via window functions
  (:mod:`cht_sync_spark.operators.lww`),
- a vectorized (Catalyst ``from_json`` / Arrow pandas UDF) doc->row transform
  (:mod:`cht_sync_spark.functions.json_doc`),
- an exactly-once MERGE upsert sink over a snapshot-committed parquet table
  format (:mod:`cht_sync_spark.tables`),
- downstream typed models with tombstone cascade
  (:mod:`cht_sync_spark.operators.models`),
- micro-batch orchestration with lineage (:mod:`cht_sync_spark.streaming`).

All plans are declared with the DataFrame API so Catalyst handles pushdown,
pruning, join strategy and whole-stage codegen; Python crosses the data path
only in Arrow-batched UDFs.
"""

__version__ = "0.1.0"
