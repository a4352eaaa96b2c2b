"""Dump .explain('formatted') for declared queries to files.

Usage: python scripts/dump_plan.py OUTDIR SUFFIX q1 [q2 ...] [--sf=DIR]

Writes OUTDIR/<query>_<SUFFIX>.txt. Queries that collect internally
(streaming harnesses) still produce a plan file for the frame they
return; their operator plans are covered by the batch-twin queries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from pd_utils_spark.session import get_spark


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = [a for a in sys.argv[3:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[3:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
