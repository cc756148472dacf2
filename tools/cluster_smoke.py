"""Smoke-test the cluster conf overlay on a NON-local master.

``local-cluster[2,2,2048]`` spawns two real worker JVMs with their own
executors — the closest a single machine gets to a cluster deployment:
task serialization crosses process boundaries, shuffle blocks go through
the block manager (not thread-local memory), and any conf that only
works in ``local[N]`` breaks here. This proves the engine's session
profile + ``cluster_conf()`` overlay survive a distributed master, which
is the runnable form of the 100 TB deployment claim.

The spark-submit shape of the same thing (a real cluster swaps the
master URL and drops the overrides)::

    spark-submit \\
      --master local-cluster[2,2,2048] \\
      $(python -c "from big_data_imdb_classifier_spark.session import \\
          cluster_conf; print(' '.join(f'--conf {k}={v}' for k, v in \\
          cluster_conf(executors=2, cores_per_executor=2).items()))") \\
      --conf spark.shuffle.service.enabled=false \\
      --conf spark.dynamicAllocation.enabled=false \\
      tools/cluster_smoke.py

(The two overrides exist because standalone local-cluster workers have
no external shuffle service; on YARN/K8s leave them on.)

Run directly: ``python tools/cluster_smoke.py [sf_dir]``. Exits 0 and
prints one OK line on success.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from big_data_imdb_classifier_spark import plans
    from big_data_imdb_classifier_spark.session import cluster_conf, get_spark

    overlay = cluster_conf(executors=2, cores_per_executor=2)
    # Standalone workers ship no external shuffle service; a real
    # cluster manager provides one, local-cluster does not.
    overlay["spark.shuffle.service.enabled"] = "false"
    overlay["spark.dynamicAllocation.enabled"] = "false"
    # The worker JVMs are capped at 2048 MB each; ask for executors that
    # fit (the 100 TB overlay assumes real executor sizing via submit).
    overlay["spark.executor.memory"] = "1536m"
    overlay["spark.driver.memory"] = "2g"

    spark = get_spark(
        app_name="cluster-smoke",
        master="local-cluster[2,2,2048]",
        extra_conf=overlay,
    )
    try:
        plans.load_all()
        # One shuffle-bearing registry query end-to-end across the two
        # worker processes.
        df = plans.QUERIES["pricing_summary"](spark, sf_dir)
        rows = df.collect()
        assert len(rows) > 0, "pricing_summary returned no rows"

        # Confs actually applied on the distributed session
        conf = spark.conf
        assert conf.get("spark.serializer").endswith("KryoSerializer")
        assert conf.get("spark.sql.adaptive.enabled") == "true"
        assert conf.get("spark.sql.session.timeZone") == "UTC"

        # Two executor JVMs registered (beyond the driver)
        status = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
        n_exec = status.size()
        assert n_exec >= 3, f"expected driver + 2 executors, saw {n_exec}"
        print(
            f"OK cluster-smoke: {len(rows)} rows, "
            f"{n_exec - 1} executors, master={spark.sparkContext.master}"
        )
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
