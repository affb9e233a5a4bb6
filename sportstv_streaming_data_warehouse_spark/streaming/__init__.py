from .ingest import (
    daily_rollup_stream,
    read_transaction_stream,
    run_available_data,
    start_ingestion,
)
from .sessionize import sessionize_stream

__all__ = [
    "daily_rollup_stream",
    "read_transaction_stream",
    "run_available_data",
    "start_ingestion",
    "sessionize_stream",
]
