"""Storage-backed signature intermediates (VERDICT r2 #8): with
``sig_table_path`` the shingle/normalize stage runs ONCE (one write), and
every downstream consumer scans the written signature table — at 100 TB the
executor cache is the wrong home for an all-documents intermediate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _pairs(df):
    return {(r["id_a"], r["id_b"]): round(r["jaccard"], 6) for r in df.collect()}


def test_jaccard_sig_table_same_result_no_source_rescan(spark, docs, tmp_path):
    from cht_sync_spark.functions.dedup import jaccard_pairs

    plain = _pairs(jaccard_pairs(docs, n=2, threshold=0.6))
    stored = jaccard_pairs(docs, n=2, threshold=0.6, sig_table_path=str(tmp_path / "sig"))
    assert _pairs(stored) == plain and plain, "storage-backed form must be identical"

    # every scan in the result plan reads the WRITTEN signature table — the
    # source documents parquet (and with it the shingle recompute) appears
    # in no consumer: the shingle stage ran exactly once, at write time
    files = stored.inputFiles()
    assert files, "expected file scans in the plan"
    assert all(str(tmp_path / "sig") in f for f in files), files


def test_minhash_sig_table_same_result_no_source_rescan(spark, docs, tmp_path):
    from cht_sync_spark.functions.dedup import minhash_lsh_pairs

    plain = _pairs(minhash_lsh_pairs(docs, n=2, threshold=0.6))
    stored = minhash_lsh_pairs(
        docs, n=2, threshold=0.6, sig_table_path=str(tmp_path / "msig")
    )
    assert _pairs(stored) == plain and plain
    files = stored.inputFiles()
    assert files and all(str(tmp_path / "msig") in f for f in files), files
