"""Cross-cutting utilities: dataclass-reflective CLI parsing, stage timing,
profiler zones, logging, device-side correctness gating."""

from .argparser import ArgParser, ParseArgsError
from .goldengate import check_framebuffer, region_means
from .timer import Timer
from .profiler import named_zone, profiling_enabled, set_profiling, trace_to
