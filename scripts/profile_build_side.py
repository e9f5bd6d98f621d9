"""Profile the build side of the bench's most build-heavy queries (r13
verdict #4): separate py4j expression-construction time (addressable — the
r8 LSH fix replaced ~2,300 F.lit round trips with one JVM-parsed SQL
string for a 3x win) from genuine Spark jobs the builder runs (in-query
codebook training etc., oracle-required). Writes
scripts/build_profile_results.json with per-query totals, py4j
send_command share, and call counts.

Run: python scripts/profile_build_side.py [names...]
"""

from __future__ import annotations

import cProfile
import io
import json
import pathlib
import pstats
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"

DEFAULT = [
    "embedding_index_ingest_dedup",
    "docs_curation_funnel",
    "docs_curation_audit",
    "docs_bpe_top_merges",
    "docs_near_dup_clusters_star",
    "embedding_ivfpq_topk",
    "docs_bpe_encode",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="flightframe-build-profile")
    # warm the JVM + py4j path once
    REGISTRY["top_users_by_value"].builder(spark, SF).collect()
    out = {}
    for name in names:
        q = REGISTRY[name]
        q.builder(spark, SF)  # warm (caches, broadcast state)
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        q.builder(spark, SF)
        pr.disable()
        wall = time.perf_counter() - t0
        st = pstats.Stats(pr, stream=io.StringIO())
        rows = {}
        for (fn_file, _line, fn_name), (cc, nc, tt, ct, _cal) in st.stats.items():
            key = None
            if "java_gateway" in fn_file and fn_name == "send_command":
                key = "py4j_send"
            elif fn_name == "collect" and "dataframe" in fn_file:
                key = "df_collect_ct"
            elif fn_name == "_parse_datatype_string" or "types.py" in fn_file and fn_name == "fromJson":
                key = "schema_parse"
            if key:
                prev = rows.get(key, (0, 0.0, 0.0))
                rows[key] = (prev[0] + nc, prev[1] + tt, prev[2] + ct)
        ent = {"wall_sec": round(wall, 3)}
        for k, (n, tt, ct) in rows.items():
            ent[k] = {"calls": n, "tottime": round(tt, 3), "cumtime": round(ct, 3)}
        # top 8 cumulative entries for the eye
        top = sorted(st.stats.items(), key=lambda kv: -kv[1][3])[:40]
        ent["top"] = [
            f"{pathlib.Path(f).name}:{ln}:{fn} nc={v[1]} tot={v[2]:.3f} cum={v[3]:.3f}"
            for (f, ln, fn), v in top
            if v[3] > 0.05 and fn not in ("<module>",)
        ][:10]
        out[name] = ent
        print(name, json.dumps(ent, indent=1)[:600], file=sys.stderr)
    path = pathlib.Path(__file__).parent / "build_profile_results.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
