"""CDC query surface (populated next: changelog materialization, typed views,
PG array parsing, transaction stats)."""
