from .daily import run_available_now, streaming_daily_avg
from .joins import view_purchase_attribution, write_stream_upsert
from .sessionize import sessionize_batch, sessionize_native, sessionize_stream

__all__ = [
    "run_available_now",
    "streaming_daily_avg",
    "sessionize_batch",
    "sessionize_native",
    "sessionize_stream",
    "view_purchase_attribution",
    "write_stream_upsert",
]
