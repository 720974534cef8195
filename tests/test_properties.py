"""Property-based tests (hypothesis) for the engine's core algebra.

The exactly-once story rests on three algebraic claims (SURVEY.md §7.3):

1. lww_dedup is IDEMPOTENT and ASSOCIATIVE over unions: dedup of any
   batch partitioning, in any order, equals dedup of the whole.
2. merge_upsert is exactly-once under replay: applying the same batch
   twice equals applying it once.
3. sequential merge of an arbitrary batch partitioning converges to the
   same final table as a one-shot merge AND as the pure-Python
   sequential-apply oracle.

Hypothesis generates adversarial event sets: colliding keys, equal rev
heights with delete-vs-edit conflicts, duplicated events across batches
(at-least-once delivery), arbitrary batch boundaries.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.operators.lww import lww_dedup
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("rev_height", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
        T.StructField("_rev", T.StringType(), True),
        T.StructField("seq", T.LongType(), False),
    ]
)
ORDER = [("rev_height", False), ("_deleted", True), ("_rev", False), ("seq", False)]


def _oracle(events: list[tuple]) -> dict[str, tuple]:
    """Independent winner computation (mirrors tests/oracle.py semantics):
    max over (height, live-beats-delete, rev, seq), nulls smallest."""
    def key(e):
        _k, h, d, rev, seq = e
        return (
            (0, 0) if h is None else (1, h),
            0 if d else 1,  # live (False) ranks above delete at equal height
            (0, "") if rev is None else (1, rev),
            seq,
        )

    winners: dict[str, tuple] = {}
    for e in events:
        cur = winners.get(e[0])
        if cur is None or key(e) > key(cur):
            winners[e[0]] = e
    return winners


events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),              # key
        st.one_of(st.none(), st.integers(1, 3)),            # rev_height
        st.booleans(),                                      # _deleted
        st.one_of(st.none(), st.sampled_from(["1-aa", "2-ab", "2-zz", "3-cc"])),
        st.integers(0, 50),                                 # seq (may collide)
    ),
    min_size=1,
    max_size=14,
)


def _df(spark, events):
    return spark.createDataFrame(
        [(k, h, d, r, s) for k, h, d, r, s in events], SCHEMA
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=events_strategy, cut=st.integers(0, 13))
def test_lww_idempotent_associative_and_matches_oracle(spark, events, cut):
    # uniquify seq so the winning row is fully determined (the generator may
    # collide seqs; real feeds never do)
    events = [(k, h, d, r, s * 100 + i) for i, (k, h, d, r, s) in enumerate(events)]
    cut = min(cut, len(events))
    whole = {
        r["k"]: tuple(r) for r in lww_dedup(_df(spark, events), key=["k"], order=ORDER).collect()
    }
    # associativity: dedup(dedup(a) ∪ b) == dedup(a ∪ b)
    a, b = events[:cut], events[cut:]
    parts = lww_dedup(_df(spark, a), key=["k"], order=ORDER)
    if b:
        parts = parts.unionByName(_df(spark, b))
    split = {r["k"]: tuple(r) for r in lww_dedup(parts, key=["k"], order=ORDER).collect()}
    assert split == whole
    # idempotence: dedup(dedup(x)) == dedup(x)
    again = {
        r["k"]: tuple(r)
        for r in lww_dedup(
            lww_dedup(_df(spark, events), key=["k"], order=ORDER), key=["k"], order=ORDER
        ).collect()
    }
    assert again == whole
    # independent-oracle agreement on the exact winning row
    want = _oracle(events)
    assert {k: v for k, v in whole.items()} == {k: tuple(v) for k, v in want.items()}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=events_strategy, cut=st.integers(0, 13), data=st.data())
def test_merge_partitioning_and_replay_converge(spark, tmp_path_factory, events, cut, data):
    # make full ordering tuples unique so the winner is unambiguous
    seen, uniq = set(), []
    for i, (k, h, d, r, s) in enumerate(events):
        uniq.append((k, h, d, r, s * 100 + i))
    events = uniq
    cut = min(cut, len(events))
    base = tmp_path_factory.mktemp("prop")

    def run(batches, name):
        t = SnapshotTable.create(
            spark, str(base / name), SCHEMA, ["k"], num_buckets=2, lww_order=ORDER
        )
        for b in batches:
            if b:
                merge_upsert(t, _df(spark, b), tombstones="keep")
        return {r["k"]: tuple(r) for r in t.read_current().collect()}

    one_shot = run([events], "one")
    split = run([events[:cut], events[cut:]], "split")
    assert split == one_shot
    # at-least-once delivery: replaying the first batch again changes nothing
    replay = run([events[:cut], events[cut:], events[:cut]], "replay")
    assert replay == one_shot
    # oracle agreement on the winner's identity
    want = _oracle(events)
    assert set(one_shot) == set(want)
    for k in want:
        assert one_shot[k][4] == want[k][4], f"{k}: {one_shot[k]} != {want[k]}"
