from .pipeline import FlightWarehouse, normalize_flight_stream, warehouse_load  # noqa: F401
