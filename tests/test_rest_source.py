"""S2 in-engine: the rest_poll Python DataSource replays API-shaped spool
pages as a stream, with producer-parity record mapping and incremental
offsets across triggers."""

from __future__ import annotations

import json
import os

from real_time_flight_data_pipeline_spark.sources.rest import (
    RestPollDataSource,
    build_record,
)
from real_time_flight_data_pipeline_spark.streaming.pipeline import (
    normalize_flight_stream,
    parse_wire_json,
)

from .test_streaming import NOW

_API_REC = {
    "flight_date": "2025-08-21",
    "flight_status": "active",
    "departure": {
        "airport": "Haneda", "iata": "HND", "icao": "RJTT",
        "terminal": "3", "gate": "61",
        "scheduled": "2025-08-21T00:05:00+00:00",
        "estimated": None, "actual": None, "delay": 12,
    },
    "arrival": {
        "airport": "Pudong", "iata": "PVG", "icao": "ZSPD",
        "terminal": "2", "gate": None,
        "scheduled": "2025-08-21T04:05:00+00:00",
        "estimated": None, "actual": None, "delay": None,
    },
    "airline": {"name": "All Nippon Airways", "iata": "NH", "icao": "ANA"},
    "flight": {"number": "849", "iata": "NH849", "icao": "ANA849"},
}


def _page(path, idx, recs):
    with open(os.path.join(path, f"page{idx:04d}.json"), "w") as f:
        json.dump({"pagination": {"count": len(recs)}, "data": recs}, f)


def test_build_record_producer_parity():
    rec = build_record(_API_REC, ingest_time="2025-08-21T00:10:00+00:00")
    assert rec["flight_key"] == "NH849_2025-08-21T00:05:00+00:00"
    assert rec["status"] == "active"
    assert rec["departure"]["delay_min"] == 12
    assert rec["arrival"]["schedule"] == "2025-08-21T04:05:00+00:00"
    # flight_num fallback chain: iata -> icao -> number -> UNKNOWN
    no_iata = {**_API_REC, "flight": {"number": "849", "iata": None, "icao": "ANA849"}}
    assert build_record(no_iata)["flight_key"].startswith("ANA849_")
    bare = {**_API_REC, "flight": {}, "departure": {}}
    assert build_record(bare)["flight_key"] == "UNKNOWN_None"


def test_rest_poll_stream_incremental(spark, tmp_path):
    spool = tmp_path / "spool"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    os.makedirs(spool)
    _page(spool, 0, [_API_REC])
    second = {
        **_API_REC,
        "flight": {"number": "850", "iata": "NH850", "icao": "ANA850"},
    }
    _page(spool, 1, [second])

    spark.dataSource.register(RestPollDataSource)
    raw = (
        spark.readStream.format("rest_poll")
        .option("path", str(spool))
        .option("fixed_ingest_time", "2025-08-21T00:10:00+00:00")
        .load()
    )
    staged = normalize_flight_stream(parse_wire_json(raw), NOW)
    q = (
        staged.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.processAllAvailable()
    keys = {r["flight_key"] for r in spark.read.parquet(str(out)).collect()}
    assert keys == {
        "NH849_2025-08-21T00:05:00+00:00",
        "NH850_2025-08-21T00:05:00+00:00",
    }

    # a new page appears -> next trigger picks up ONLY the new offset range
    third = {
        **_API_REC,
        "flight": {"number": "851", "iata": "NH851", "icao": "ANA851"},
    }
    _page(spool, 2, [third])
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(str(out)).collect()
    keys = sorted(r["flight_key"] for r in rows)
    assert keys == [
        "NH849_2025-08-21T00:05:00+00:00",
        "NH850_2025-08-21T00:05:00+00:00",
        "NH851_2025-08-21T00:05:00+00:00",
    ]  # no re-emission of pages 0-1


def test_rest_poll_to_warehouse_end_to_end(spark, tmp_path):
    """Full S2 -> K2 path: rest_poll stream -> normalize -> foreachBatch
    warehouse merge, same sink the Kafka path uses."""
    from pyspark.sql import DataFrame

    from real_time_flight_data_pipeline_spark.streaming.pipeline import (
        FlightWarehouse,
        warehouse_load,
    )

    spool = tmp_path / "spool"
    os.makedirs(spool)
    _page(spool, 0, [_API_REC])

    spark.dataSource.register(RestPollDataSource)
    raw = (
        spark.readStream.format("rest_poll")
        .option("path", str(spool))
        .option("fixed_ingest_time", "2025-08-21T00:10:00+00:00")
        .load()
    )
    staged = normalize_flight_stream(parse_wire_json(raw), NOW)
    wh = FlightWarehouse(spark, str(tmp_path / "wh"))

    def sink(batch_df: DataFrame, _epoch: int) -> None:
        if not batch_df.isEmpty():
            warehouse_load(wh, batch_df, "timestamp'2025-08-22 00:00:01'")

    q = (
        staged.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    fact = {r["flight_key"]: r for r in wh.fact.read().collect()}
    assert set(fact) == {"NH849_2025-08-21T00:05:00+00:00"}
    assert fact["NH849_2025-08-21T00:05:00+00:00"]["route_id"] is not None
    airports = {r["icao"] for r in wh.airport.read().collect()}
    assert airports == {"RJTT", "ZSPD"}


def test_rest_poll_http_mode_loopback(spark, tmp_path):
    """http mode end-to-end over a loopback server: one GET per trigger,
    responses spooled before emission, spool-mode replay parity, api_key and
    limit forwarded as query params."""
    import http.server
    import threading

    second = {**_API_REC, "flight": {"number": "850", "iata": "NH850", "icao": "ANA850"}}
    pages = [
        json.dumps({"pagination": {"count": 1}, "data": [_API_REC]}),
        json.dumps({"pagination": {"count": 1}, "data": [second]}),
    ]
    requests_seen = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            requests_seen.append(self.path)
            body = pages.pop(0) if pages else '{"data": []}'
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body.encode())

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        spool = tmp_path / "spool"
        from real_time_flight_data_pipeline_spark.sources.rest import (
            register_rest_source,
        )

        register_rest_source(spark)
        raw = (
            spark.readStream.format("rest_poll")
            .option("url", f"http://127.0.0.1:{srv.server_port}/v1/flights")
            .option("api_key", "test-key")
            .option("limit", 25)
            .option("spool_dir", str(spool))
            .option("fixed_ingest_time", "2025-08-21T00:10:00+00:00")
            .load()
        )
        q = (
            raw.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        srv.shutdown()

    # api_key/limit forwarded (producer parity with fetch_batch params)
    assert requests_seen and "access_key=test-key" in requests_seen[0]
    assert "limit=25" in requests_seen[0]

    http_rows = {
        r["value"] for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    keys = {json.loads(v)["flight_key"] for v in http_rows}
    assert keys == {
        "NH849_2025-08-21T00:05:00+00:00",
        "NH850_2025-08-21T00:05:00+00:00",
    }

    # the fetched bytes were spooled page-per-poll, and spool-mode replay of
    # that directory reproduces the http rows exactly
    import os as _os

    from real_time_flight_data_pipeline_spark.sources.rest import (
        RestSpoolStreamReader,
    )

    assert sorted(f for f in _os.listdir(spool) if f.endswith(".json")) == [
        "page00000000.json",
        "page00000001.json",
    ]
    reader = RestSpoolStreamReader(
        {"path": str(spool), "fixed_ingest_time": "2025-08-21T00:10:00+00:00"}
    )
    replay = {v for (v,) in reader.readBetweenOffsets({"page": 0}, {"page": 2})}
    assert replay == http_rows


def test_spool_ingest_time_is_mtime_deterministic(tmp_path):
    """Without fixed_ingest_time, ingest_time derives from the page file's
    mtime — identical across replays, never wall-clock at read time."""
    import time

    from real_time_flight_data_pipeline_spark.sources.rest import (
        RestSpoolStreamReader,
    )

    spool = tmp_path / "spool"
    os.makedirs(spool)
    _page(spool, 0, [_API_REC])
    reader = RestSpoolStreamReader({"path": str(spool)})
    first = list(reader.readBetweenOffsets({"page": 0}, {"page": 1}))
    time.sleep(1.1)
    again = list(reader.readBetweenOffsets({"page": 0}, {"page": 1}))
    assert first == again
    ingest = json.loads(first[0][0])["ingest_time"]
    import datetime as dt

    expected = dt.datetime.fromtimestamp(
        os.stat(spool / "page0000.json").st_mtime, tz=dt.timezone.utc
    ).isoformat()
    assert ingest == expected
