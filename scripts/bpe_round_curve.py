"""Per-round marginal cost of N-round BPE training at sf0.1 (r7 verdict #4).

The catalog queries (docs_bpe_top_merges / docs_bpe_encode) train 2 rounds;
tests/test_bpe_nround.py proves 8-round bit-exactness vs the composed
DuckDB oracle. This script answers the SCALE question the verdict asked:
does per-round cost stay flat as rounds accumulate? Structurally it should
— every round is one exact pair-count shuffle (O(distinct pairs),
map-combined) + one doc-partitioned window pass applying a 1-row broadcast
merge, and each round's output is localCheckpointed so lineage and plan
size are bounded at any N. The honest limiter is the driver-synchronous
round loop (each top-pick is a 1-row action barrier), exactly like
sequential BPE trainers — parallelism is within a round, not across them.

Run: python scripts/bpe_round_curve.py        (sf0.1, 16 rounds)
     python scripts/bpe_round_curve.py --deep  (sf0.01, 128 rounds — the
         r8/r9 carried ask: remove the 16-round extrapolation by showing
         per-round cost AND plan size stay flat out to 128 accumulated
         merges; results land in bpe_round_curve_deep.json)
Writes scripts/bpe_round_curve_results.json and prints one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.functions import text as TX
from real_time_flight_data_pipeline_spark.plans.llm_ext import _bpe_round
from real_time_flight_data_pipeline_spark.session import get_spark
from real_time_flight_data_pipeline_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.1"
ROUNDS = 16
OUT = pathlib.Path(__file__).with_name("bpe_round_curve_results.json")
# Deep tier: enough accumulated merges that any lineage/plan growth or
# per-round cost creep would be unmistakable, at the small SF so the
# corpus scan does not drown the per-round fixed cost being measured.
DEEP_SF_DIR = "/root/testdata/sf0.01"
DEEP_ROUNDS = 128
DEEP_OUT = pathlib.Path(__file__).with_name("bpe_round_curve_deep.json")


def main() -> None:
    deep = "--deep" in sys.argv[1:]
    sf_dir = DEEP_SF_DIR if deep else SF_DIR
    n_rounds = DEEP_ROUNDS if deep else ROUNDS
    out = DEEP_OUT if deep else OUT
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents")
    toks0 = docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("toks")
    ).localCheckpoint(eager=True)  # eager: exclude tokenize from round 0's time
    n0 = toks0.agg(F.sum(F.size("toks"))).head()[0]

    cur = toks0
    rounds = []
    for rnd in range(1, n_rounds + 1):
        t0 = time.time()
        cur, top = _bpe_round(cur)
        # _bpe_round's output is eagerly localCheckpointed, so the round's
        # full cost (pair count + top pick + merge application) is paid
        # inside the call; the two reads below are checkpoint scans.
        sec = round(time.time() - t0, 3)
        t = top.collect()[0]
        after = cur.agg(F.sum(F.size("toks"))).head()[0]
        # Plan-size flatness: each round's output is localCheckpointed, so
        # the NEXT round plans against a checkpoint scan — the optimized
        # plan must not accumulate nodes across rounds (the lineage-growth
        # failure mode of iterative DataFrame loops).
        plan_lines = len(
            cur._jdf.queryExecution().optimizedPlan().toString().splitlines()
        )
        rounds.append(
            {
                "round": rnd,
                "sec": sec,
                "merge": f"{t.l}+{t.r}",
                "pair_count": t.cnt,
                "tokens_after": after,
                "plan_lines": plan_lines,
            }
        )
        print(
            f"round {rnd:3d}: {sec:6.2f}s  {t.l!r}+{t.r!r} x{t.cnt}"
            f"  -> {after}  plan={plan_lines}"
        )

    secs = [r["sec"] for r in rounds]
    plans = [r["plan_lines"] for r in rounds]
    # flatness: median of the last half vs the first half — a trainer
    # whose per-round cost grows with accumulated rounds shows ratio >> 1.
    half = len(secs) // 2
    ratio = round(
        statistics.median(secs[half:]) / statistics.median(secs[:half]), 3
    )
    result = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "tokens_before": n0,
        "median_sec_first_half": round(statistics.median(secs[:half]), 3),
        "median_sec_last_half": round(statistics.median(secs[half:]), 3),
        "late_over_early_ratio": ratio,
        "plan_lines_first": plans[0],
        "plan_lines_last": plans[-1],
        "plan_lines_max": max(plans),
    }
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps({"metric": "bpe_round_flatness", "value": ratio,
                      "unit": "ratio", "rounds": n_rounds,
                      "sf_dir": sf_dir, "plan_lines_max": max(plans)}))


if __name__ == "__main__":
    main()
