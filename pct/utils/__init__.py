from pct.utils.telemetry import stamp, flatten_dict, append_csv_row, StepTimer
from pct.utils.profiling import device_trace, span
from pct.utils.ply import read_ply, write_ply

__all__ = ["stamp", "flatten_dict", "append_csv_row", "StepTimer", "read_ply", "write_ply", "device_trace", "span"]
