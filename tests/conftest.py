import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # tests: small session, fast startup
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

from cht_sync_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cht_sync_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def feed_df(spark):
    from cht_sync_spark.sources.feedgen import synth_changes

    return synth_changes(spark, n_convs=60, base_turns=5, turns_jitter=6, hot_convs=2, hot_turns=60).cache()


@pytest.fixture(scope="session")
def feed_path(spark, feed_df, tmp_path_factory):
    from cht_sync_spark.sources.feedgen import write_feed

    p = str(tmp_path_factory.mktemp("feed") / "changes")
    write_feed(feed_df, p, n_files=4)
    return p
