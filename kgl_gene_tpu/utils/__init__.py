from .intervals import OpenRightInterval, IntervalSet, intervals_to_array
from .logging import ExecEnvLogger, log, init_logger
