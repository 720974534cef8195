"""Schema-contract enforcement + data tests (SURVEY.md §2.3 T10).

The reference declares ``contract: enforced: true`` on its typed models and
attaches ``unique`` / ``not_null`` tests to the key columns
(tests/dbt/package/models/contacts/contacts.yml:7-15): a batch whose shape
drifts FAILS the run instead of being silently coerced, and the built table
is validated after every incremental merge.

Spark-first re-expression:

- plan-time: :func:`cht_sync_spark.tables.format._conform` with
  ``strict=True`` raises :class:`SchemaContractError` on any missing /
  extra / retyped column — zero data pass, pure schema comparison;
- data-time: :func:`check_contract` runs ONE aggregation job computing all
  not_null violation counts and the key-uniqueness defect in a single pass
  (conditional counts — no per-test scan like dbt's N test queries), and
  raises :class:`ContractViolation` with per-test counts;
- :func:`contract_report` is the same pass as a DataFrame for dashboards /
  the driver correctness harness.

Scale: callers scope the checked slice to the buckets a batch touched
(see ModelRunner.run_increment), so per-batch validation is O(touched
buckets) like the merge itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ContractViolation(ValueError):
    """A data test failed (not_null / unique — contacts.yml:10-15)."""


def contract_report(
    df: DataFrame,
    unique_key: list[str] | None = None,
    not_null: list[str] | None = None,
) -> DataFrame:
    """One-row report: total rows, distinct keys, duplicate-key count, and a
    null count per declared not_null column. Single aggregation job."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if unique_key:
        kd = F.count_distinct(*[F.col(c) for c in unique_key]).alias("n_keys")
        aggs.append(kd)
    for c in not_null or []:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}"))
    out = df.agg(*aggs)
    if unique_key:
        out = out.withColumn("dup_keys", F.col("n_rows") - F.col("n_keys"))
    return out


def check_contract(
    df: DataFrame,
    unique_key: list[str] | None = None,
    not_null: list[str] | None = None,
) -> dict[str, int]:
    """Run the report and RAISE on any violation; returns the counts dict
    when clean (handy for lineage/metrics)."""
    row = contract_report(df, unique_key, not_null).first()
    stats = row.asDict()
    problems = []
    if unique_key and stats.get("dup_keys", 0):
        problems.append(f"unique({','.join(unique_key)}): {stats['dup_keys']} duplicate keys")
    for c in not_null or []:
        if stats.get(f"nulls_{c}", 0):
            problems.append(f"not_null({c}): {stats[f'nulls_{c}']} nulls")
    if problems:
        raise ContractViolation("; ".join(problems))
    return {k: int(v) for k, v in stats.items() if v is not None}
