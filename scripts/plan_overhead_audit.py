"""Registry-wide planning-overhead audit: t_build vs t_exec per query.

For every active catalog query at sf0.1, separates the two components the
headline bench conflates:

- t_build — everything the builder call pays before the final frame
  exists: py4j expression round-trips, Catalyst analysis/optimization,
  and each lazy ``localCheckpoint(eager=False)`` barrier's ``toRdd``
  pass. NOTE the toRdd pass is not pure planning: it also kicks off any
  BroadcastExchange relation futures in the barrier's subtree (measured:
  the curation funnel's decontaminate barrier plans in 0.09 s standalone
  but its checkpoint call costs 1.29 s — the delta is the benchmark-gram
  broadcast side actually executing). So t_build = plan construction
  (constant in data size) + broadcast/barrier prework (scales with the
  broadcast sides, which are the SMALL inputs by design).
- t_exec — a ``noop``-format write action of the built DataFrame: the
  final frame's scan/shuffle/aggregate work.

Why it matters: at sf0.1 several composite queries (curation funnel/audit,
BPE rounds, codebook training) are >80% t_build, so the sf0.1 headline
total overstates what a 1000-executor run would cost — the planning share
amortizes at 100 TB and the broadcast-side share grows only with the
small inputs, while t_exec scales with the corpus (the 100x curve entries
in scale_curve_results.json measure that end-to-end regime). This audit
makes the split a recorded, re-runnable number instead of a per-query
anecdote (r8 profiling idiom: build >> exec flags a planning artifact).

Protocol: one untimed warm pass (JVM/codegen/page-cache), then one timed
build and one timed exec per query, in registry order. Writes ONE JSON
file ``scripts/plan_overhead_results.json`` with per-query splits and the
registry totals.

Run: python scripts/plan_overhead_audit.py   [~2 sweeps of wall time]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from real_time_flight_data_pipeline_spark.plans import ORIGINAL_ORDER
from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
OUT = pathlib.Path(__file__).parent / "plan_overhead_results.json"


def main() -> None:
    spark = get_spark()
    names = [n for n in ORIGINAL_ORDER if n in REGISTRY]
    detail: dict[str, dict[str, float]] = {}
    for name in names:
        build = REGISTRY[name].builder
        # Untimed warm pass: first-touch costs (module import, codegen
        # compilation, parquet footer cache) belong to neither component.
        build(spark, SF).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df = build(spark, SF)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        detail[name] = {
            "build_sec": round(t1 - t0, 4),
            "exec_sec": round(t2 - t1, 4),
        }
        print(
            f"{name:40s} build={t1 - t0:7.3f}s exec={t2 - t1:7.3f}s",
            flush=True,
        )
    tot_build = sum(d["build_sec"] for d in detail.values())
    tot_exec = sum(d["exec_sec"] for d in detail.values())
    result = {
        "sf": 0.1,
        "n_queries": len(detail),
        "total_build_sec": round(tot_build, 2),
        "total_exec_sec": round(tot_exec, 2),
        "build_share": round(tot_build / (tot_build + tot_exec), 4),
        "detail": detail,
    }
    OUT.write_text(json.dumps(result, indent=1))
    print(
        json.dumps(
            {k: v for k, v in result.items() if k != "detail"},
        )
    )


if __name__ == "__main__":
    main()
