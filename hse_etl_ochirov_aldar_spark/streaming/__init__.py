from .daily import streaming_daily_avg, run_available_now

__all__ = ["streaming_daily_avg", "run_available_now"]
