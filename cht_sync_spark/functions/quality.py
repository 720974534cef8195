"""Row-level data-quality expectations — the declarative gate between the
CDC plane and the training-data plane.

The reference validates its typed models two ways: schema contracts plus
``unique``/``not_null`` column tests (tests/dbt/package/models/contacts/
contacts.yml:7-15 — covered by operators/contracts.py T10), and dbt's
wider test vocabulary (``accepted_values``, custom SQL asserts) that real
dbt projects attach to the same models. This module is the engine's form
of those row-level tests, shaped like Delta Live Tables' expectations:

- an :class:`Expectation` is (name, boolean Column, action). A row FAILS
  the rule when the predicate is false OR NULL (dbt/DLT semantics: an
  unevaluable row cannot be trusted);
- ``action='drop'`` rows are excluded from the clean output (and carry
  their violated-rule names into the quarantine side — the semantic-rule
  counterpart of the ingest plane's malformed-envelope DLQ,
  functions/dlq.py); ``'warn'`` rows are counted but kept; ``'fail'``
  makes :func:`check_expectations` raise, failing the batch the way an
  enforced dbt test fails the run.

Scale: :func:`expectations_report` is ONE aggregation job with a
conditional count per rule (not dbt's N test queries = N scans), and
:func:`apply_expectations` is a pure map-stage split — the predicate
columns are ordinary Catalyst expressions, codegen'd, zero shuffle. Both
compose with the model plane's bucket-scoped slices, so per-batch
validation stays O(touched slice) like the merge itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Expectation",
    "ExpectationFailed",
    "accepted_values",
    "apply_expectations",
    "check_expectations",
    "expectations_report",
]

_ACTIONS = ("drop", "warn", "fail")


class ExpectationFailed(ValueError):
    """A 'fail'-action expectation had violations (the enforced-test path)."""


@dataclass
class Expectation:
    name: str
    predicate: Column  # True = row passes; false OR NULL = row fails
    action: str = "drop"

    def __post_init__(self) -> None:
        if self.action not in _ACTIONS:
            raise ValueError(
                f"expectation {self.name!r}: action must be one of {_ACTIONS}, "
                f"got {self.action!r}"
            )

    def fails(self) -> Column:
        """Null-safe failure test: NULL predicates fail (dbt/DLT rule)."""
        return ~F.coalesce(self.predicate, F.lit(False))


def _validate(rules: list[Expectation]) -> None:
    if not rules:
        raise ValueError("at least one expectation is required")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {sorted(names)}")


def expectations_report(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """One-row report in ONE aggregation pass: total rows, a violation
    count per rule (``fail_<name>``), and ``n_retained`` — rows that pass
    every drop/fail rule (what :func:`apply_expectations` would keep)."""
    _validate(rules)
    gating = [r for r in rules if r.action in ("drop", "fail")]
    keep = F.lit(True)
    for r in gating:
        keep = keep & ~r.fails()
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    aggs += [F.count(F.when(r.fails(), 1)).alias(f"fail_{r.name}") for r in rules]
    aggs.append(F.count(F.when(keep, 1)).alias("n_retained"))
    return df.agg(*aggs)


def check_expectations(df: DataFrame, rules: list[Expectation]) -> dict[str, int]:
    """Run the report and RAISE :class:`ExpectationFailed` if any
    'fail'-action rule has violations; returns the counts dict when the
    batch may proceed (handy for lineage/metrics, mirroring
    contracts.check_contract)."""
    stats = {k: int(v) for k, v in expectations_report(df, rules).first().asDict().items()}
    problems = [
        f"{r.name}: {stats[f'fail_{r.name}']} rows"
        for r in rules
        if r.action == "fail" and stats.get(f"fail_{r.name}", 0)
    ]
    if problems:
        raise ExpectationFailed("; ".join(problems))
    return stats


def apply_expectations(
    df: DataFrame, rules: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (clean, quarantined) by the drop/fail rules —
    'warn' rules never remove rows. The quarantine side carries
    ``_violated``: the array of gating-rule names the row failed, in rule
    order (the DLQ-reasons analogue for semantic rules). Both sides are
    map-stage projections of the input — Catalyst evaluates the shared
    predicates once per side, no shuffle, no driver round-trip."""
    _validate(rules)
    gating = [r for r in rules if r.action in ("drop", "fail")]
    if not gating:
        return df, df.withColumn("_violated", F.array().cast("array<string>")).limit(0)
    violated = F.filter(
        F.array(*[F.when(r.fails(), F.lit(r.name)) for r in gating]),
        lambda x: x.isNotNull(),
    )
    keep = F.lit(True)
    for r in gating:
        keep = keep & ~r.fails()
    clean = df.where(keep)
    quarantined = df.withColumn("_violated", violated).where(F.size("_violated") > 0)
    return clean, quarantined


def accepted_values(col: str | Column, values: list) -> Column:
    """dbt's ``accepted_values`` test as a predicate (NULL fails, like the
    dbt test, via the caller's null-as-fail rule)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(values)
