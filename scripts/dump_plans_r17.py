"""Dump .explain('formatted') for named queries to plans/r17/<name><suffix>.txt.

Plan-only (no timed execution — building a query may still run its
build-time actions such as count probes and checkpoint materializations,
exactly as the bench's build phase does).

Run: python scripts/dump_plans_r17.py q1 q2 ... [--suffix _before] [--sf DIR]
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY  # noqa: E402
from real_time_flight_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    suffix = "_before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    out_dir = pathlib.Path(__file__).resolve().parents[1] / "plans" / "r17"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="flightframe-dump-plans")
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}{suffix}.txt").write_text(txt)
        print(name, "->", f"{name}{suffix}.txt", len(txt), "bytes")


if __name__ == "__main__":
    main()
