"""Session profile checks: the local defaults and the documented
cluster-scale overlay."""

from __future__ import annotations

from big_data_imdb_classifier_spark.session import cluster_conf


def test_cluster_conf_scales_with_fleet_shape():
    c = cluster_conf(executors=1000, cores_per_executor=4)
    assert int(c["spark.sql.shuffle.partitions"]) == 8000  # 2 waves
    assert c["spark.dynamicAllocation.maxExecutors"] == "1000"
    small = cluster_conf(executors=10, cores_per_executor=8)
    assert int(small["spark.sql.shuffle.partitions"]) == 160
    # correctness-critical settings survive any fleet shape
    for conf in (c, small):
        assert conf["spark.sql.session.timeZone"] == "UTC"
        assert conf["spark.sql.adaptive.enabled"] == "true"


def test_session_timezone_is_utc(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_cluster_conf_runs_on_local_cluster_master():
    """The deployment overlay is RUNNABLE, not just documented: a
    subprocess brings up local-cluster[2,2,2048] (two real worker JVMs,
    cross-process shuffles) with cluster_conf() applied and executes a
    registry query end-to-end (tools/cluster_smoke.py)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "cluster_smoke.py")],
        capture_output=True, text=True, timeout=280, cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "OK cluster-smoke" in proc.stdout
