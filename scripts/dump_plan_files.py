#!/usr/bin/env python
"""Dump `.explain(formatted)` plans for the NAMED queries to individual
files: scripts/dump_plan_files.py <outdir> <suffix> <qname> [<qname> ...]

Writes <outdir>/<qname>_<suffix>.txt for each. SPARK_GRAFT_CPUS is pinned
to 32 like dump_plans.py so Exchange partition counts are host-independent.
"""

from __future__ import annotations

import os
import sys

# resolve the repo root from this file so the script works from a pinned
# worktree too (the before/after plan pairs come from two checkouts)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SPARK_GRAFT_CPUS"] = "32"


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    from copy_sharepoint_to_onelake_lakehousefiles_spark import all_queries, get_spark

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark("plan_files")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(path, flush=True)


if __name__ == "__main__":
    main()
