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


def main() -> None:
    spark = get_spark()
    docs = load_table(spark, SF_DIR, "documents")
    toks0 = docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("toks")
    ).localCheckpoint(eager=True)  # eager: exclude tokenize from round 0's time
    n0 = toks0.agg(F.sum(F.size("toks"))).head()[0]

    cur = toks0
    rounds = []
    for rnd in range(1, ROUNDS + 1):
        t0 = time.time()
        cur, top = _bpe_round(cur)
        # _bpe_round's output is eagerly localCheckpointed, so the round's
        # full cost (pair count + top pick + merge application) is paid
        # inside the call; the two reads below are checkpoint scans.
        sec = round(time.time() - t0, 3)
        t = top.collect()[0]
        after = cur.agg(F.sum(F.size("toks"))).head()[0]
        rounds.append(
            {
                "round": rnd,
                "sec": sec,
                "merge": f"{t.l}+{t.r}",
                "pair_count": t.cnt,
                "tokens_after": after,
            }
        )
        print(f"round {rnd:2d}: {sec:6.2f}s  {t.l!r}+{t.r!r} x{t.cnt}  -> {after}")

    secs = [r["sec"] for r in rounds]
    # flatness: median of the last 8 rounds vs the first 8 — a trainer
    # whose per-round cost grows with accumulated rounds shows ratio >> 1.
    ratio = round(statistics.median(secs[8:]) / statistics.median(secs[:8]), 3)
    result = {
        "sf_dir": SF_DIR,
        "rounds": rounds,
        "tokens_before": n0,
        "median_sec_first8": round(statistics.median(secs[:8]), 3),
        "median_sec_last8": round(statistics.median(secs[8:]), 3),
        "late_over_early_ratio": ratio,
    }
    OUT.write_text(json.dumps(result, indent=1))
    print(json.dumps({"metric": "bpe_round_flatness", "value": ratio,
                      "unit": "ratio", "rounds": ROUNDS, "sf": 0.1}))


if __name__ == "__main__":
    main()
