"""Cross-cutting utilities: dataclass-reflective CLI parsing, stage timing,
profiler zones, logging."""

from .argparser import ArgParser, ParseArgsError
from .timer import Timer
from .profiler import named_zone, profiling_enabled, set_profiling, trace_to
