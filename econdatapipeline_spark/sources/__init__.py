"""Sources and sinks: fetchers (driver-side I/O) + normalizers (lazy DataFrames)."""
