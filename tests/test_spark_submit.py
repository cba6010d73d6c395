"""Packaging/launch-mode evidence (north rule): the crawl engine runs
via ``spark-submit --py-files dist/scrapeulous_spark.zip`` — i.e. the
package imports and executes from the zip alone, the way it would ship
to a multi-executor cluster."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available")
def test_submit_with_pyfiles_zip(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_dist import build

    zip_path = build(str(tmp_path / "scrapeulous_spark.zip"))
    env = dict(os.environ, SPARK_GRAFT_CACHE=os.path.join(REPO, ".cache"))
    res = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_crawl.py"),
            "--scale", "smoke",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),  # NOT the repo: the package must come from the zip
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["urls_fetched"] > 0 and out["seen_set"] > 0
    assert out["master"] == "local[4]"
