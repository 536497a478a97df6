from tpu_bench.core.config import Config
from tpu_bench.core.timing import Timer, time_variant
from tpu_bench.core.reporting import Reporter
from tpu_bench.core.variants import Layouts, materialize

__all__ = ["Config", "Timer", "time_variant", "Reporter", "Layouts",
           "materialize"]
