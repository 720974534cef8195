"""The north-rule deployment form, run for real: ``spark-submit
--py-files cht_sync_spark.zip scripts/submit_replay.py``.

Pins two things nothing else in the suite exercises:

- the package imports and the whole replay job run from the --py-files
  zip alone (the subprocess cwd is OUTSIDE the repo, so a path leak into
  the working tree would fail the import);
- ``session.get_spark`` defers to the submit-provided master instead of
  clobbering it with ``local[$SPARK_GRAFT_CPUS]`` (under spark-submit the
  gateway pre-exists; setting .master() there would run a cluster job
  local on the driver — the bug this test was added against).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_py_files_replay(spark, tmp_path):
    from cht_sync_spark.sources.feedgen import synth_changes, write_feed
    from cht_sync_spark.tables.format import SnapshotTable

    feed = str(tmp_path / "feed")
    write_feed(synth_changes(spark, n_convs=20), feed, n_files=2)

    pkg = tmp_path / "cht_sync_spark.zip"
    with zipfile.ZipFile(pkg, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "cht_sync_spark")):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    script = tmp_path / "submit_replay.py"  # run a COPY from outside the repo
    shutil.copy(os.path.join(REPO, "scripts", "submit_replay.py"), script)

    table = str(tmp_path / "t")
    env = {k: v for k, v in os.environ.items() if not k.startswith("SPARK_GRAFT")}
    out = subprocess.run(
        [
            "spark-submit", "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(pkg),
            str(script),
            "--feed", feed, "--table", table,
            "--mode", "mor", "--batch-size", "200", "--num-buckets", "4",
            "--sources", "synthhost/db0,synthhost/db1",
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["batches"] > 0 and report["events"] > 0

    # the submitted job's final state equals an in-process replay's
    t = SnapshotTable(spark, table)
    live = t.read_current(drop_tombstones=True)
    assert live.count() > 0
    ckpts = [k for k in t.snapshot().properties if k.startswith("checkpoint.")]
    assert ckpts, "per-source checkpoints must be committed with the data"
