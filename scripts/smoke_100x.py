"""Execute the ENTIRE documents/embeddings catalog tier at the 100x corpus.

Why: the r8 100x scale tier caught a scale-killer the 10x point could not
see — docs_bigram_plausibility's LM join was statically planned as a
BroadcastHashJoin of a vocabulary-sized side (fine 25x under the 64 MB
threshold at 10x, OOM-fatal at 100x). PLANS.md digests plans at sf0.001,
where every broadcast decision is trivially safe, so that class of defect
is structurally invisible to plan review at small SF. The only honest
check is execution: run every active catalog query that reads only the
documents/embeddings tables against the 100x shape-preserving corpus
(scripts/scale_curve.build_corpus_100x: ~500k docs / 27M tokens / 220k
vectors) and record wall time or the exact failure.

Classification per query:
- ok: completed under the watchdog; seconds recorded.
- timeout: cancelled at WATCHDOG_SEC via the query's job group — a hang
  or a super-linear blowup; MUST be investigated, never allowlisted.
- error: raised; message head recorded — broadcast OOMs land here.
- skipped_other_tables: the builder needs tables the 100x corpus does
  not synthesize. Since r10 the corpus synthesizes the FULL table set
  (scale_curve.build_relational_100x: 60M lineitem / 15M orders / 10M
  events + re-keyed dims), so this status should no longer occur; it is
  kept as a tripwire for future tables.

Run: python scripts/smoke_100x.py        (writes scripts/smoke_100x_results.json)
"""

from __future__ import annotations

import json
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from real_time_flight_data_pipeline_spark.plans import ORIGINAL_ORDER
from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.session import get_spark
from scale_curve import WORK, build_corpus_100x, build_relational_100x

CORPUS = WORK / "sf100x"
WATCHDOG_SEC = 600
OUT = pathlib.Path(__file__).with_name("smoke_100x_results.json")


def main() -> None:
    # Optional argv subset: re-smoke just the named queries, merging into
    # the existing results file (a full sweep takes over an hour).
    subset = list(dict.fromkeys(sys.argv[1:]))
    unknown = sorted(set(subset) - set(REGISTRY))
    if unknown:
        sys.exit(f"unknown queries {unknown}")
    spark = get_spark(app_name="flightframe-smoke-100x")
    if not (CORPUS / "documents.parquet").exists():
        build_corpus_100x(spark)
    if not (CORPUS / "lineitem.parquet").exists():
        build_relational_100x(spark)  # r10: events/TPC-H tier, no more skips
    sc = spark.sparkContext
    results: dict[str, dict] = {}
    if subset and OUT.exists():
        results = json.loads(OUT.read_text())
    # After a driver-side stall the abandoned daemon worker keeps executing
    # (py4j plan construction; Spark work outside the cancelled group), so
    # every LATER timing shares the machine with that zombie (ADVICE r9).
    # Correctness outcomes are still valid; timings are not — flag them.
    tainted_by: str | None = None
    for name in subset or ORIGINAL_ORDER:
        q = REGISTRY.get(name)
        if q is None:
            continue
        group = f"smoke100x-{name}"

        # Run builder+write in a worker thread and join with a deadline
        # (ADVICE r8): sc.cancelJobGroup only interrupts RUNNING Spark
        # jobs, so a query whose blowup is driver-synchronous (long py4j
        # plan construction, a driver loop between jobs — exactly the
        # class the signature_col fix addressed) would otherwise hang the
        # smoke far past WATCHDOG_SEC with no record. The worker inherits
        # the job group via InheritableThreadLocal (PYSPARK_PIN_THREAD
        # propagates setLocalProperty to child threads in Spark 4), so
        # cancelJobGroup still kills the Spark-job-bound case; the
        # driver-stalled case is detected by the join deadline and
        # recorded as a timeout even though the thread itself cannot be
        # killed (daemon=True keeps it from blocking process exit).
        outcome: dict = {}

        def _run(q=q, outcome=outcome, group=group) -> None:
            sc.setJobGroup(group, group, interruptOnCancel=True)
            try:
                df = q.builder(spark, str(CORPUS))
                df.write.format("noop").mode("overwrite").save()
                outcome["ok"] = True
            except Exception as e:  # noqa: BLE001 — classified below
                outcome["error"] = f"{type(e).__name__}: {e}"

        t0 = time.perf_counter()
        worker = threading.Thread(target=_run, daemon=True, name=group)
        worker.start()
        worker.join(WATCHDOG_SEC)
        if worker.is_alive():
            sc.cancelJobGroup(group)
            worker.join(30)  # grace for the cancellation to surface
        sec = round(time.perf_counter() - t0, 2)
        if worker.is_alive():
            results[name] = {"status": "timeout", "sec": sec,
                             "where": "driver-side (thread still alive)",
                             "note": "subsequent timings unreliable — "
                                     "zombie worker still running"}
            tainted_by = name
            print(f"TIMEOUT    {name}: driver-side stall at {sec}s "
                  f"(remaining timings tainted)", flush=True)
        elif outcome.get("ok"):
            results[name] = {"status": "ok", "sec": sec}
            if tainted_by:
                results[name]["tainted_by"] = tainted_by
            print(f"ok         {name}: {sec}s", flush=True)
        else:
            msg = outcome.get("error", "worker died without outcome")
            if sec >= WATCHDOG_SEC - 5 and "cancelled" in msg.lower():
                results[name] = {"status": "timeout", "sec": sec}
                print(f"TIMEOUT    {name}: cancelled at {sec}s", flush=True)
            elif "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                results[name] = {"status": "skipped_other_tables"}
                print(f"skip       {name}: needs non-100x tables", flush=True)
            else:
                results[name] = {"status": "error", "sec": sec,
                                 "error": msg.splitlines()[0][:300]}
                print(f"ERROR      {name}: {msg.splitlines()[0][:200]}",
                      flush=True)
        OUT.write_text(json.dumps(results, indent=1))  # survive partial runs
    n_ok = sum(1 for r in results.values() if r["status"] == "ok")
    n_bad = sum(1 for r in results.values()
                if r["status"] in ("error", "timeout"))
    n_skip = len(results) - n_ok - n_bad
    print(json.dumps({"metric": "smoke_100x", "ok": n_ok, "failed": n_bad,
                      "skipped_other_tables": n_skip}))


if __name__ == "__main__":
    main()
