from .normalize import (  # noqa: F401
    TS_FMT,
    clean_ts,
    flight_key,
    on_time_label,
    parse_flight_ts,
    route_label,
)
