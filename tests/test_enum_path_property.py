"""Enum-path hardening property test (round 10, r9 VERDICT task 5).

The bounded-key quantile fast path already produced one silent
wrong-results mode that only appeared at sf0.1 (the dummy-key variant:
rank scrambling under constant-folded grouping — now a loud error).
Its premise — AQE exchange elision + _pid-order fold — is exactly the
kind of local-mode-adjacent assumption that must be re-proven away from
the configuration everything else runs under. This test runs the THREE
shipped callers' exact invocation shapes (stats_percentiles_by_flag,
approx_percentile_price's exact side + winsorize's cuts, and
stats_mad_outliers' domain-recursion) at sf0.1 on a NON-DEFAULT core
count (local[5]: odd parallelism → different range-partition and _pid
layout than local[32]/local[8]) and asserts the enum path reproduces
the general path bit-for-bit.

Runs in a subprocess: the suite's session fixture pins its own master
and one JVM cannot host two contexts.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

SF_DIR = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.1"
)

_SCRIPT = r"""
import os, sys
sys.path.insert(0, sys.argv[1])
sf_dir = sys.argv[2]

from big_data_imdb_classifier_spark.session import get_spark
from big_data_imdb_classifier_spark.operators.stats import group_quantiles
from big_data_imdb_classifier_spark.sources.readers import load_table
from pyspark.sql import functions as F

spark = get_spark(app_name="enum_prop", master="local[5]",
                  shuffle_partitions=5)
li = load_table(spark, sf_dir, "lineitem")

def qmap(df):
    return {r["l_returnflag"]: tuple(r["q"]) for r in df.collect()}

# 1) stats_percentiles_by_flag shape: 4 pcts, plain.
pcts4 = [0.25, 0.50, 0.75, 0.95]
gen = qmap(group_quantiles(li, ["l_returnflag"], "l_extendedprice", pcts4))
fast = qmap(group_quantiles(li, ["l_returnflag"], "l_extendedprice", pcts4,
                            enum_keys=True))
assert gen == fast, f"4-pct mismatch:\nGEN {gen}\nENUM {fast}"

# 2) approx_percentile_price exact side / winsorize cuts: 2 pcts.
for pcts2 in ([0.5, 0.95], [0.05, 0.95]):
    gen = qmap(group_quantiles(li, ["l_returnflag"], "l_extendedprice", pcts2))
    fast = qmap(group_quantiles(li, ["l_returnflag"], "l_extendedprice",
                                pcts2, enum_keys=True))
    assert gen == fast, f"{pcts2} mismatch:\nGEN {gen}\nENUM {fast}"

# 3) stats_mad_outliers shape: median with returned domain, then a
# weighted quantile over deviations derived FROM that domain.
med_fast, dom = group_quantiles(
    li, ["l_returnflag"], "l_extendedprice", [0.5],
    enum_keys=True, return_domain=True)
med_gen = qmap(group_quantiles(li, ["l_returnflag"], "l_extendedprice", [0.5]))
assert qmap(med_fast) == med_gen, "median mismatch"

med_lit = F.when(F.lit(False), F.lit(None).cast("double"))
for flag, q in sorted(med_gen.items()):
    med_lit = med_lit.when(F.col("l_returnflag") == F.lit(flag),
                           F.lit(q[0]))
devs = dom.select(
    "l_returnflag", F.abs(F.col("_v") - med_lit).alias("_dev"), "_c")
mad_fast = qmap(group_quantiles(devs, ["l_returnflag"], "_dev", [0.5],
                                weight_col="_c", enum_keys=True))
mad_gen = qmap(group_quantiles(devs, ["l_returnflag"], "_dev", [0.5],
                               weight_col="_c"))
assert mad_fast == mad_gen, f"MAD mismatch:\nGEN {mad_gen}\nENUM {mad_fast}"

# Domain completeness at sf0.1: weights must cover every row, nulls in.
n_dom = dom.agg(F.sum("_c")).collect()[0][0]
n_all = li.count()
assert n_dom == n_all, f"domain covers {n_dom} of {n_all} rows"

print("ENUM_PROP_OK")
spark.stop()
"""


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.1 testdata not present"
)
def test_enum_path_equals_general_sf01_nondefault_cores(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "enum_prop.py"
    script.write_text(_SCRIPT)
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)  # master pinned inside the script
    proc = subprocess.run(
        [sys.executable, str(script), repo, SF_DIR],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, (
        f"enum property subprocess failed:\n{proc.stdout[-4000:]}\n"
        f"{proc.stderr[-4000:]}"
    )
    assert "ENUM_PROP_OK" in proc.stdout
