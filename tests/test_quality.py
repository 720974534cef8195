"""Expectations (functions/quality.py), mixture_sample (functions/corpus.py),
and pseudonymize (functions/text.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from cht_sync_spark.functions.corpus import mixture_sample
from cht_sync_spark.functions.quality import (
    Expectation,
    ExpectationFailed,
    accepted_values,
    apply_expectations,
    check_expectations,
    expectations_report,
)
from cht_sync_spark.functions.text import pseudonymize


# ---------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["web", "wiki", "code"][i % 3], f"text {i}") for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string").cache()


def _coin(doc_id: int, salt: str = "mix") -> str:
    return hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:8]


# ------------------------------------------------------------ mixture_sample

def test_mixture_epoch_counts_match_python(docs):
    mult = {"wiki": 2.25, "web": 0.5, "code": 0.0}
    out = mixture_sample(docs, mult).select("doc_id", "source", "epoch").collect()
    got = {}
    for r in out:
        got.setdefault((r.doc_id, r.source), []).append(r.epoch)
    exp = {}
    for i in range(300):
        src = ["web", "wiki", "code"][i % 3]
        m = mult[src]
        fl = int(m)
        epochs = list(range(fl))
        thr = format(int((m - fl) * 0x100000000), "08x")
        if _coin(i) < thr:
            epochs.append(fl)
        if epochs:
            exp[(i, src)] = epochs
    assert {k: sorted(v) for k, v in got.items()} == exp
    # sanity on the shape: code dropped entirely, wiki always >= 2 copies
    assert all(src != "code" for (_, src) in got)
    assert all(len(v) >= 2 for (k, v) in got.items() if k[1] == "wiki")


def test_mixture_default_and_integer_mult(docs):
    out = mixture_sample(docs, {"wiki": 3.0}, default_mult=1.0)
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts["wiki"] == 100 * 3  # exactly three copies, no coin flip
    assert counts["web"] == 100 and counts["code"] == 100  # default 1.0


def test_mixture_partition_invariance(docs):
    a = mixture_sample(docs, {"wiki": 1.5, "web": 0.25})
    b = mixture_sample(docs.repartition(7, "text"), {"wiki": 1.5, "web": 0.25})
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_mixture_validates_negative(docs):
    with pytest.raises(ValueError, match=">= 0"):
        mixture_sample(docs, {"wiki": -1.0})


# ------------------------------------------------------------- pseudonymize

def test_pseudonymize_referential_integrity(spark):
    a = spark.createDataFrame([(1, "u7"), (2, "u8"), (3, None)], "id long, user string")
    b = spark.createDataFrame([(10, "u7")], "id long, user string")
    ta = {r.user: r.tok for r in a.select("user", pseudonymize(F.col("user"), "s3cret").alias("tok")).collect()}
    tb = {r.user: r.tok for r in b.select("user", pseudonymize(F.col("user"), "s3cret").alias("tok")).collect()}
    assert ta["u7"] == tb["u7"]  # same secret + value -> same token across tables
    assert ta[None] is None  # null stays null
    assert ta["u7"] != ta["u8"]
    expected = "id_" + hashlib.md5(b"s3cret:u7").hexdigest()[:16]
    assert ta["u7"] == expected


def test_pseudonymize_secret_rotation_and_params(spark):
    df = spark.createDataFrame([("u7",)], "user string")
    t1 = df.select(pseudonymize(F.col("user"), "k1").alias("t")).first().t
    t2 = df.select(pseudonymize(F.col("user"), "k2").alias("t")).first().t
    assert t1 != t2  # rotating the secret unlinks tokens
    t3 = df.select(pseudonymize(F.col("user"), "k1", prefix="acct_", length=8).alias("t")).first().t
    assert t3.startswith("acct_") and len(t3) == len("acct_") + 8
    with pytest.raises(ValueError, match="length"):
        pseudonymize(F.col("user"), "k1", length=0)


# ------------------------------------------------------------- expectations

@pytest.fixture(scope="module")
def ev(spark):
    # (id, type, value): one bad type, one negative value, one NULL value
    rows = [
        (1, "click", 1.0),
        (2, "view", 2.0),
        (3, "bogus", 3.0),
        (4, "click", -1.0),
        (5, "view", None),
    ]
    return spark.createDataFrame(rows, "id long, et string, value double").cache()


def _rules():
    return [
        Expectation("known_type", accepted_values("et", ["click", "view"]), "drop"),
        Expectation("value_nonneg", F.col("value") >= 0, "drop"),
        Expectation("small_id", F.col("id") < 100, "warn"),
    ]


def test_report_counts_null_as_fail(ev):
    row = expectations_report(ev, _rules()).first()
    assert row.n_rows == 5
    assert row.fail_known_type == 1
    assert row.fail_value_nonneg == 2  # the negative AND the NULL value
    assert row.fail_small_id == 0
    assert row.n_retained == 2


def test_apply_split_and_reasons(ev):
    clean, quar = apply_expectations(ev, _rules())
    assert sorted(r.id for r in clean.collect()) == [1, 2]
    got = {r.id: r._violated for r in quar.collect()}
    assert got == {3: ["known_type"], 4: ["value_nonneg"], 5: ["value_nonneg"]}


def test_warn_only_rules_keep_everything(ev):
    rules = [Expectation("small_id", F.col("id") < 3, "warn")]
    clean, quar = apply_expectations(ev, rules)
    assert clean.count() == 5 and quar.count() == 0
    row = expectations_report(ev, rules).first()
    assert row.fail_small_id == 3 and row.n_retained == 5


def test_check_raises_on_fail_action(ev):
    rules = [Expectation("value_nonneg", F.col("value") >= 0, "fail")]
    with pytest.raises(ExpectationFailed, match="value_nonneg: 2 rows"):
        check_expectations(ev, rules)
    ok = check_expectations(ev.where("value >= 0"), rules)
    assert ok["n_rows"] == 3 and ok["fail_value_nonneg"] == 0


def test_validation(ev):
    with pytest.raises(ValueError, match="duplicate"):
        expectations_report(ev, [Expectation("a", F.lit(True)), Expectation("a", F.lit(True))])
    with pytest.raises(ValueError, match="action"):
        Expectation("a", F.lit(True), "explode")
    with pytest.raises(ValueError, match="at least one"):
        expectations_report(ev, [])
