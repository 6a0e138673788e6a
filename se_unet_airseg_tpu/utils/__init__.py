from .profiling import Timer, time_report, device_trace

__all__ = ["Timer", "time_report", "device_trace"]
