"""REST polling source (S2) — out-of-engine by design.

The reference polls Aviationstack in a separate producer process
(run_producer.py:123-165) and lets Kafka decouple it from Spark. We keep
that architecture: the engine consumes Kafka (sources/kafka.py) or file
replay (streaming/pipeline.py). A Spark 4 Python streaming DataSource for
REST polling is a possible future in-engine variant; it is intentionally
not implemented here because the test environment has no network and no
API credentials.
"""

from __future__ import annotations


def poll_rest_source(*_args, **_kwargs):  # pragma: no cover
    raise NotImplementedError(
        "REST polling runs out-of-engine (see module docstring); use "
        "sources.kafka or the file-replay source for ingestion."
    )
