"""As-of join and interval (range) join — time-alignment operators.

Training-data pipelines over transcripts/events need these constantly:
"attach each tool call to the nearest preceding user turn", "attribute
each purchase to the latest click before it", "collect every event that
falls inside a window opened by some trigger". The reference has no
analogue (its feed is totally seq-ordered key-value upserts; SURVEY.md
§2.6) — these are beyond-reference LLM-pipeline operators, same tier as
dedup/similarity/sessionization.

Spark-first design
------------------

Spark has no ASOF JOIN operator, and the naive formulations are
scale-killers: an inequality theta-join plans as
``BroadcastNestedLoopJoin``/cartesian (O(L·R) comparisons per key), and a
"join then keep latest" plans the full pair blow-up before pruning.

``asof_join`` instead uses the **union-merge** formulation (the
distributed equivalent of ``pandas.merge_asof``): tag the two sides,
union them on (key, ts), and run ONE running ``last(payload, ignorenulls)``
window per key. Cost = one hash exchange + one sort over ``|L|+|R|`` rows
— no join operator at all, no pair materialization, linear in input at any
scale. Hot keys are bounded by a single conversation/user's event count
(the same bound every per-key window in this engine lives with — salting
cannot apply because as-of needs a total per-key time order).

``interval_point_join`` (range join) uses **bucketized equi-join**: both
sides map onto coarse time buckets (intervals explode to the buckets they
span, points to exactly one), the join is a plain hash equi-join on
(key, bucket), and the precise range predicate filters the candidates.
With bucket width ≥ the typical interval span each interval lands in ≤ 2
buckets, so the exchange carries ~2·|I| + |P| rows — against the
cartesian's O(I·P). A ``max_buckets`` guard raises (rather than silently
truncating) on pathologically long intervals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_secs(c: Column) -> Column:
    """Fractional epoch seconds for either timestamp flavor. TIMESTAMP_NTZ
    has no direct numeric cast; the NTZ->LTZ hop interprets in the session
    timezone — the engine pins ``spark.sql.session.timeZone=UTC``
    (session.py:61), so the hop is exact and DST-free, and every use here
    is a *difference* of two epochs, where any fixed offset cancels."""
    return c.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload of the single
    ``right`` row with the largest ``right_ts`` ≤ ``left_ts`` (direction
    ``"backward"``, inclusive — DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``
    semantics) or the smallest ``right_ts`` ≥ ``left_ts`` (``"forward"``),
    per key. Unmatched left rows keep null payload (LEFT join semantics).

    ``right_cols`` are the payload columns carried over (default: all
    non-key, non-ts columns), emitted as ``<col><suffix>``; the matched
    timestamp is emitted as ``<right_ts><suffix>``. ``tolerance_seconds``
    nulls out matches farther than the tolerance (pandas ``merge_asof``
    convention).

    Determinism: among right rows tied on (key, ts) the winner is the last
    under the payload struct's natural order — pre-dedupe the right side
    to one row per (key, ts) when ties are possible and a specific winner
    is required (the driver query does).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, right_ts)]

    # payload struct: matched ts first, then the carried columns
    r_payload = F.struct(
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    r_tagged = right.select(
        *keys, F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"), r_payload.alias("__r")
    )
    r_dtype = r_tagged.schema["__r"].dataType

    l_payload = F.struct(*[F.col(c) for c in left.columns])
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_dtype).alias("__r"),
        l_payload.alias("__l"),
    )
    l_dtype = l_tagged.schema["__l"].dataType
    r_tagged = r_tagged.withColumn("__l", F.lit(None).cast(l_dtype))

    # backward: ascending ts; right (__side 0) sorts before left at equal
    # ts, so the running last() sees it -> inclusive match. forward is the
    # mirror image on descending ts. Ties among right rows resolve to the
    # last payload struct in sort order (struct comparison is fieldwise).
    ts_ord = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_ord, F.col("__side").asc(), F.col("__r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    matched = both.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )

    m = F.col("__m")
    if tolerance_seconds is not None:
        delta = _epoch_secs(F.col("__ts")) - _epoch_secs(m[f"{right_ts}{suffix}"])
        if direction == "forward":
            delta = -delta
        m = F.when(delta <= F.lit(float(tolerance_seconds)), F.col("__m"))

    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(m[f"{right_ts}{suffix}"].alias(f"{right_ts}{suffix}"))
    out_cols.extend(m[f"{c}{suffix}"].alias(f"{c}{suffix}") for c in right_cols)
    return matched.select(*out_cols)


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    on: str | list[str],
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    point_ts: str = "ts",
    bucket_seconds: float = 1800.0,
    max_buckets: int = 64,
) -> DataFrame:
    """Range join: every (interval, point) pair with the same key and
    ``start_col <= point_ts <= end_col`` (both bounds inclusive).

    Output: all interval columns, then the point's columns suffixed
    ``_pt`` for any name that collides. Each qualifying pair appears
    exactly once (a point's bucket is unique and an interval's exploded
    bucket list is distinct, so the equi-join can produce the pair at most
    once before the precise filter).

    Pick ``bucket_seconds`` at or above the typical interval span so
    intervals explode into ≤ 2 buckets; intervals spanning more than
    ``max_buckets`` buckets raise at execution time rather than silently
    dropping matches.
    """
    keys = [on] if isinstance(on, str) else list(on)

    def _bucket(c: Column) -> Column:
        # epoch seconds via double: floor handles pre-1970 correctly and
        # bucket resolution never needs sub-second precision
        return F.floor(_epoch_secs(c) / F.lit(float(bucket_seconds))).cast("long")

    b0, b1 = _bucket(F.col(start_col)), _bucket(F.col(end_col))
    guard = F.when(
        b1 - b0 > max_buckets,
        F.raise_error(
            F.format_string(
                "interval_point_join: interval spans more than %s buckets of %ss — "
                "raise bucket_seconds or max_buckets",
                F.lit(str(max_buckets)),
                F.lit(str(bucket_seconds)),
            )
        ).cast("long"),
    ).otherwise(b1)
    iv = intervals.withColumn("__bucket", F.explode(F.sequence(b0, guard)))

    pt_renames = {c: f"{c}_pt" if c in intervals.columns else c for c in points.columns}
    pt = points.select(
        *[F.col(c).alias(n) for c, n in pt_renames.items()],
        _bucket(F.col(point_ts)).alias("__bucket"),
        *[F.col(k).alias(f"__k_{k}") for k in keys],
    )

    cond = [iv["__bucket"] == pt["__bucket"]]
    cond += [F.col(k) == F.col(f"__k_{k}") for k in keys]
    pt_ts_out = pt_renames[point_ts]
    joined = iv.join(pt, cond, "inner").where(
        (F.col(pt_ts_out) >= F.col(start_col)) & (F.col(pt_ts_out) <= F.col(end_col))
    )
    return joined.select(*intervals.columns, *[pt_renames[c] for c in points.columns])
