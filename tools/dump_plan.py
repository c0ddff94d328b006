"""Dump the formatted physical plan of named registry queries to files.

Usage: python tools/dump_plan.py OUT_DIR SUFFIX name [name...]
Writes OUT_DIR/<name>_<SUFFIX>.txt with df.explain("formatted") output at
$SPARK_GRAFT_SF_DIR (default sf0.1) — the evidence artifact for the
optimization rounds (plans/r12/<query>_before.txt / _after.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compss_python_spark.plans import REGISTRY  # noqa: E402
from compss_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
