"""Dump `.explain(formatted)` physical plans of the headline queries to
PLANS.md — the artifact showing pushdown, pruning, broadcast selection and
codegen coverage per query (the 'iterate until it's the plan you'd want'
loop, made inspectable)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from copy_sharepoint_to_onelake_lakehousefiles_spark import all_queries, get_spark
    from bench import HEADLINE

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark("plans")
    qs = all_queries()
    out = ["# PLANS — formatted physical plans of the headline queries (sf0.01)\n"]
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"\n## {name}\n\n```\n{plan}\n```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
