"""REST polling source (S2) as a Spark 4 Python streaming DataSource.

The reference polls Aviationstack in a separate producer process and lets
Kafka decouple it from Spark (run_producer.py:123-165). This module brings
that poll loop in-engine: ``RestPollDataSource`` registers as format
``rest_poll`` and emits Kafka-shaped rows (``value: string`` JSON), so the
downstream pipeline (parse_wire_json -> normalize_flight_stream) is byte-
identical to the Kafka path.

Polling is abstracted over a *page fetcher*:

* spool mode (default, and what tests use): ``path`` points at a directory
  of JSON page files shaped like the API response ``{"data": [...]}``; each
  newly appearing file is one poll result. Offsets are file counts, so
  checkpoint replay is deterministic (``readBetweenOffsets`` re-reads the
  same files).
* http mode (production): ``url`` (+ optional ``api_key``/``limit``) polls
  the endpoint once per trigger — producer parity with fetch_batch
  (run_producer.py:123-134) — and *spools the response before emitting it*
  (write-tmp-then-rename into ``spool_dir``). The spool is the replay log:
  offsets stay file counts, so checkpoint recovery replays the exact bytes
  originally fetched even though the live API has moved on. Uses
  ``requests`` when importable, stdlib ``urllib`` otherwise.

``ingest_time`` is derived from the spool page file's mtime (or the
``fixed_ingest_time`` option), never from wall-clock at read time: a
replayed offset range must produce byte-identical rows or the downstream
GREATEST(ingest_time) merge (M4) could flip on recovery.

Record mapping reproduces the producer's ``build_record``
(run_producer.py:36-121): field projection to the wire schema and the
``flight_key = f"{flight_num}_{dep_sched}"`` dedup key. The producer's
timestamp ISO-normalization (P11) is deliberately NOT reproduced — SURVEY
P11 is subsumed by the engine-side clean_ts chain + strict parse (P9/P10),
so raw API timestamps pass through for the engine to normalize.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

WIRE_VALUE_SCHEMA = "value string"


def build_record(rec: dict, ingest_time: str | None = None) -> dict:
    """API flight object -> wire record (producer parity, run_producer.py:36-121)."""
    dep = rec.get("departure") or {}
    arr = rec.get("arrival") or {}
    airline = rec.get("airline") or {}
    flight = rec.get("flight") or {}

    dep_sched = dep.get("scheduled") or dep.get("scheduled_time")
    flight_num = flight.get("iata") or flight.get("icao") or flight.get("number") or "UNKNOWN"

    def leg(d: dict, sched) -> dict:
        return {
            "airport": d.get("airport"),
            "iata": d.get("iata"),
            "icao": d.get("icao"),
            "gate": d.get("gate"),
            "terminal": d.get("terminal"),
            "schedule": sched,
            "estimated": d.get("estimated"),
            "actual": d.get("actual"),
            "delay_min": d.get("delay"),
        }

    return {
        "flight_key": f"{flight_num}_{dep_sched}",
        "flight_date": rec.get("flight_date"),
        "status": rec.get("flight_status"),
        "airline": {
            "iata": airline.get("iata"),
            "icao": airline.get("icao"),
            "name": airline.get("name"),
        },
        "flight": {
            "number": flight.get("number"),
            "iata": flight.get("iata"),
            "icao": flight.get("icao"),
        },
        "departure": leg(dep, dep_sched),
        "arrival": leg(arr, arr.get("scheduled")),
        "ingest_time": ingest_time
        or datetime.now(timezone.utc).isoformat(),
        "source": "rest_poll",
    }


def _spool_pages(path: str) -> list[str]:
    return sorted(
        f for f in os.listdir(path) if f.endswith(".json") and not f.startswith("_")
    )


class RestSpoolStreamReader(SimpleDataSourceStreamReader):
    """Offset = number of page files consumed. Pages are immutable once
    written (producer convention: write to _tmp, rename), so offset ranges
    replay deterministically after a checkpoint restart."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError(
                "rest_poll requires a 'path' option (spool directory of JSON "
                "page files) or a 'url' option (http polling mode)"
            )
        self.path = path
        self.fixed_ingest_time = options.get("fixed_ingest_time")

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _page_ingest_time(self, full_path: str) -> str:
        """Deterministic per-page ingest_time: the spool file's mtime (the
        moment the page landed), not wall-clock at read time — replaying an
        offset range after restart must yield identical rows."""
        if self.fixed_ingest_time:
            return self.fixed_ingest_time
        mtime = os.stat(full_path).st_mtime
        return datetime.fromtimestamp(mtime, tz=timezone.utc).isoformat()

    def _read_pages(self, first: int, last: int) -> Iterator[tuple]:
        # Materialized list, not a generator: Spark's prefetching cache
        # copy.copy()s the returned iterator, which generators don't support.
        rows = []
        for page_file in _spool_pages(self.path)[first:last]:
            full = os.path.join(self.path, page_file)
            with open(full) as f:
                body = json.load(f)
            ingest = self._page_ingest_time(full)
            rows.extend(
                (json.dumps(build_record(rec, ingest)),)
                for rec in body.get("data", [])
            )
        return iter(rows)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        n = len(_spool_pages(self.path))
        return self._read_pages(start["page"], n), {"page": n}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._read_pages(start["page"], end["page"])


def _http_get(url: str) -> bytes:
    """GET via requests when importable, stdlib urllib otherwise (the
    documented import gate: no third-party dependency is required)."""
    try:
        import requests  # noqa: PLC0415

        resp = requests.get(url, timeout=30)
        resp.raise_for_status()
        return resp.content
    except ImportError:
        from urllib.request import urlopen  # noqa: PLC0415

        with urlopen(url, timeout=30) as resp:
            return resp.read()


class RestHttpStreamReader(RestSpoolStreamReader):
    """http mode: one GET per trigger (producer parity: fetch_batch polls the
    same endpoint with a fixed limit each cycle, run_producer.py:123-134),
    spooled to ``spool_dir`` *before* emission so offsets replay the exact
    fetched bytes after restart. All offset/replay logic is inherited from
    the spool reader — the spool IS the source of truth."""

    def __init__(self, options: dict):
        spool_dir = options.get("spool_dir")
        if not spool_dir:
            raise ValueError(
                "rest_poll http mode requires a 'spool_dir' option: the spool "
                "is the durable replay log that makes checkpoint recovery "
                "deterministic against a live endpoint"
            )
        os.makedirs(spool_dir, exist_ok=True)
        super().__init__({**options, "path": spool_dir})
        from urllib.parse import urlencode  # noqa: PLC0415

        params = {}
        if options.get("api_key"):
            params["access_key"] = options["api_key"]
        params["limit"] = int(options.get("limit", 100))
        self.url = options["url"] + ("?" + urlencode(params) if params else "")

    def _poll_once(self) -> None:
        body = _http_get(self.url)
        if not json.loads(body).get("data"):
            return  # empty poll -> no page, offset unchanged
        n = len(_spool_pages(self.path))
        tmp = os.path.join(self.path, f"_tmp_page{n:08d}.json")
        with open(tmp, "wb") as f:
            f.write(body)
        os.rename(tmp, os.path.join(self.path, f"page{n:08d}.json"))

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        self._poll_once()
        return super().read(start)


class RestPollDataSource(DataSource):
    """format("rest_poll"): S2 in-engine. Emits (value: string) JSON rows.

    With a ``url`` option the reader polls over HTTP and spools; with only
    ``path`` it replays an existing spool directory."""

    @classmethod
    def name(cls) -> str:
        return "rest_poll"

    def schema(self) -> str:
        return WIRE_VALUE_SCHEMA

    def simpleStreamReader(self, schema) -> RestSpoolStreamReader:
        opts = dict(self.options)
        if opts.get("url"):
            return RestHttpStreamReader(opts)
        return RestSpoolStreamReader(opts)


def register_rest_source(spark) -> None:
    spark.dataSource.register(RestPollDataSource)


def poll_rest_source(*_args, **_kwargs):  # pragma: no cover
    raise NotImplementedError(
        "Use spark.readStream.format('rest_poll') after register_rest_source"
        "(spark): option('path', dir) replays a spool; option('url', ...) + "
        "option('spool_dir', dir) polls a live endpoint."
    )
