"""dead_letter_split (T6 hardened): error rows are classified and kept with
their original wire bytes, never silently lost; valid rows flow through the
standard normalize path unchanged."""

from __future__ import annotations

import json

from real_time_flight_data_pipeline_spark.streaming.pipeline import (
    dead_letter_split,
    normalize_flight_stream,
    parse_wire_json,
)

from .test_streaming import NOW


def _wire(key="NH849_2025-08-21T00:05:00+00:00", **over):
    rec = {
        "flight_key": key,
        "flight_date": "2025-08-21",
        "status": "active",
        "airline": {"iata": "NH", "icao": "ANA", "name": "All Nippon Airways"},
        "flight": {"number": "849", "iata": "NH849", "icao": "ANA849"},
        "departure": {
            "airport": "Haneda", "iata": "HND", "icao": "RJTT",
            "gate": "61", "terminal": "3",
            "schedule": "2025-08-21T00:05:00+00:00",
            "estimated": None, "actual": None, "delay_min": 12,
        },
        "arrival": {
            "airport": "Pudong", "iata": "PVG", "icao": "ZSPD",
            "gate": None, "terminal": "2",
            "schedule": "2025-08-21T04:05:00+00:00",
            "estimated": None, "actual": None, "delay_min": None,
        },
        "ingest_time": "2025-08-21T00:10:00+00:00",
        "source": "test",
    }
    rec.update(over)
    return json.dumps(rec)


def test_dead_letter_split_classifies_and_partitions(spark):
    good = _wire()
    broken = "{this is not json"
    no_key = _wire(key=None)
    bad_ts = _wire(
        key="X_1",
        departure={"schedule": "garbage", "estimated": None, "actual": None,
                   "delay_min": None, "airport": None, "iata": None,
                   "icao": None, "gate": None, "terminal": None},
        arrival={"schedule": None, "estimated": None, "actual": None,
                 "delay_min": None, "airport": None, "iata": None,
                 "icao": None, "gate": None, "terminal": None},
    )
    neg_delay = _wire(key="Y_1")
    neg_delay = neg_delay.replace('"delay_min": 12', '"delay_min": -5')

    raw = spark.createDataFrame(
        [(v,) for v in (good, broken, no_key, bad_ts, neg_delay)], "value string"
    )
    valid, dlq = dead_letter_split(raw, NOW)

    reasons = {r["reason"] for r in dlq.collect()}
    assert reasons == {
        "unparseable_json",
        "missing_flight_key",
        "no_valid_timestamps",
        "negative_delay",
    }
    assert {r["flight_key"] for r in valid.collect()} == {
        "NH849_2025-08-21T00:05:00+00:00"
    }
    # DLQ keeps the original bytes: replay after a fix is a re-ingest
    assert broken in {r["raw_json"] for r in dlq.collect()}
    # valid path is byte-identical to the default normalize path on the
    # same good rows (the split adds no divergence for clean data)
    default = normalize_flight_stream(
        parse_wire_json(raw.limit(1)), NOW
    ).collect()
    assert [tuple(r) for r in valid.collect()] == [tuple(r) for r in default]
