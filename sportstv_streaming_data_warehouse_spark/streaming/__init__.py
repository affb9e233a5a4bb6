from .dedup import dedup_stream
from .ingest import (
    daily_rollup_stream,
    read_transaction_stream,
    run_available_data,
    start_ingestion,
)
from .quality_gate import split_valid, start_gated_ingestion, with_violations
from .sessionize import sessionize_stream

__all__ = [
    "daily_rollup_stream",
    "dedup_stream",
    "split_valid",
    "start_gated_ingestion",
    "with_violations",
    "read_transaction_stream",
    "run_available_data",
    "start_ingestion",
    "sessionize_stream",
]
