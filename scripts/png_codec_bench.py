"""Measure the PNG (stdlib-zlib) multimodal tier: catalog-query wall at
sf0.1, aggregate decode/encode throughput at a realistic image size on
local[32], and the per-filter single-core cost model.

The banked catalog query (q_multimodal_png, r18 window) runs on tiny
images so the oracle compare stays cheap; the throughput question at
corpus scale is different — how many bytes/second of real compressed
image data can one executor core turn back into pixels, and how does the
scanline filter mix move that number (None/Sub/Up reverse vectorized;
Average/Paeth are inherently sequential scalar chains)? This records
both, so the 100 TB read is priced honestly: decode parallelizes
per-image with zero shuffle, aggregate throughput = per-core MB/s x
cores, and a deployment that needs more swaps libpng into the SAME
mapInPandas plumbing (schema, batching, strictness contract unchanged).

Run: python scripts/png_codec_bench.py          (all tiers)
Writes/merges png_codec_results.json keyed by tier.
"""

from __future__ import annotations

import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

SF = "/root/testdata/sf0.1"
OUT = pathlib.Path(__file__).with_name("png_codec_results.json")
HD_W, HD_H, HD_N = 640, 480, 1024  # ~0.9 GB raw pixels across the fleet
_HD_SYNTH_SCHEMA = "img_id long, png binary"
_HD_STAT_SCHEMA = "img_id long, sum_r long, filter_sum long, n_idat int"


def _hd_pixels(seed: int) -> np.ndarray:
    j = np.arange(HD_W * HD_H * 3, dtype=np.int64)
    return ((seed * 13 + j * 17) % 256).astype(np.uint8).reshape(HD_H, HD_W, 3)


def _hd_synth(batches):
    import pandas as pd

    from real_time_flight_data_pipeline_spark.functions.codecs import png_encode

    for pdf in batches:
        payloads = [_hd_pixels(int(s)) for s in pdf["img_id"]]
        yield pd.DataFrame(
            {"img_id": pdf["img_id"], "png": [png_encode(p) for p in payloads]}
        )


def _hd_stats(batches):
    import pandas as pd

    from real_time_flight_data_pipeline_spark.functions.codecs import png_decode

    for pdf in batches:
        rows = {k: [] for k in ("img_id", "sum_r", "filter_sum", "n_idat")}
        for img_id, buf in zip(pdf["img_id"], pdf["png"]):
            px, filters, n_idat = png_decode(bytes(buf))
            rows["img_id"].append(img_id)
            rows["sum_r"].append(int(px[:, :, 0].astype("int64").sum()))
            rows["filter_sum"].append(int(sum(filters)))
            rows["n_idat"].append(n_idat)
        yield pd.DataFrame(rows)


def run_catalog(spark) -> dict:
    """The banked catalog query end-to-end at sf0.1 (median of 3)."""
    from real_time_flight_data_pipeline_spark.plans.northstar import (
        q_multimodal_png,
    )

    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        q_multimodal_png(spark, SF).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    return {"wall_median_sec": statistics.median(runs), "runs": runs}


def run_hd(spark) -> dict:
    """Encode then decode HD_N images of HD_WxHD_H on local[32]; the two
    stages are timed separately by persisting the encoded payloads to
    parquet between them (so decode reads real bytes from disk, the
    deployed shape)."""
    import shutil

    tmp = "/tmp/flightframe_png_bench"
    shutil.rmtree(tmp, ignore_errors=True)
    ids = spark.range(HD_N).toDF("img_id").repartition(32)

    t0 = time.perf_counter()
    ids.mapInPandas(_hd_synth, schema=_HD_SYNTH_SCHEMA).write.parquet(tmp)
    encode_wall = time.perf_counter() - t0

    encoded = spark.read.parquet(tmp)
    n_bytes = encoded.selectExpr("sum(length(png)) b").collect()[0]["b"]
    t0 = time.perf_counter()
    out = encoded.mapInPandas(_hd_stats, schema=_HD_STAT_SCHEMA)
    agg = out.selectExpr(
        "count(*) n", "sum(sum_r) sr", "min(filter_sum) fmin", "min(n_idat) ni"
    ).collect()[0]
    decode_wall = time.perf_counter() - t0

    # correctness spot-pin: closed-form sum_r for image 0
    j = np.arange(HD_W * HD_H * 3, dtype=np.int64)
    p0 = int(((0 * 13 + j * 17) % 256)[j % 3 == 0].sum())
    r0 = (
        spark.read.parquet(tmp)
        .filter("img_id = 0")
        .mapInPandas(_hd_stats, schema=_HD_STAT_SCHEMA)
        .collect()[0]
    )
    assert r0.sum_r == p0, (r0.sum_r, p0)
    assert agg["n"] == HD_N

    raw_mb = HD_N * HD_W * HD_H * 3 / 1e6
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "n_images": HD_N,
        "geometry": f"{HD_W}x{HD_H}",
        "raw_mb": round(raw_mb, 1),
        "png_mb": round(n_bytes / 1e6, 1),
        "encode_wall_sec": round(encode_wall, 2),
        "decode_wall_sec": round(decode_wall, 2),
        "decode_raw_mb_per_sec": round(raw_mb / decode_wall, 1),
        "decode_images_per_sec": round(HD_N / decode_wall, 1),
    }


def run_filter_micro() -> dict:
    """Single-core per-filter decode cost at HD geometry — the explicit
    cost model behind the aggregate number (None/Sub/Up vectorized,
    Average/Paeth sequential scalar chains)."""
    from real_time_flight_data_pipeline_spark.functions.codecs import (
        png_decode,
        png_encode,
    )

    px = _hd_pixels(7)
    out = {}
    for f, name in ((0, "none"), (1, "sub"), (2, "up"), (3, "average"), (4, "paeth")):
        data = png_encode(px, row_filters=[f] * HD_H)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            dec, _, _ = png_decode(data)
            runs.append(time.perf_counter() - t0)
        assert (dec == px).all()
        ms = statistics.median(runs) * 1000
        out[name] = {
            "decode_ms": round(ms, 1),
            "mb_per_sec": round(HD_W * HD_H * 3 / (ms / 1000) / 1e6, 1),
        }
    return out




def run_adpcm_micro() -> dict:
    """Single-core IMA ADPCM decode/encode rate (the audio compressed
    codec; one 32k-sample clip, median of 3) — the same explicit
    cost-model role the per-filter PNG ladder plays."""
    import numpy as np

    from real_time_flight_data_pipeline_spark.functions.codecs import (
        adpcm_ima_decode,
        adpcm_ima_encode,
    )

    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32768, 1 << 15).astype(np.int16)
    t0 = time.perf_counter()
    payload, recon = adpcm_ima_encode(x)
    enc = time.perf_counter() - t0
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        dec, _, _ = adpcm_ima_decode(payload)
        runs.append(time.perf_counter() - t0)
    assert (dec == recon).all()
    ms = statistics.median(runs) * 1000
    return {
        "n_samples": len(x),
        "payload_bytes": len(payload),
        "decode_ms": round(ms, 1),
        "decode_ksamples_per_sec": round(len(x) / ms, 1),
        "encode_ms": round(enc * 1000, 1),
    }


def main() -> None:
    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    results["filter_micro_640x480_1core"] = run_filter_micro()
    results["adpcm_micro_32k_1core"] = run_adpcm_micro()

    from real_time_flight_data_pipeline_spark.session import get_spark

    spark = get_spark("png-codec-bench")
    try:
        results["sf0.1_catalog"] = run_catalog(spark)
        results["hd640_local32"] = run_hd(spark)
    finally:
        spark.stop()
    OUT.write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
