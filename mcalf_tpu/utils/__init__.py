from mcalf_tpu.utils.checkpoint import latest_checkpoint, load_state, save_state
from mcalf_tpu.utils.compile_cache import enable_compile_cache
from mcalf_tpu.utils.profiling import get_timings, phase_timer, reset_timings, trace
from mcalf_tpu.utils.rank import is_rank0, rank0_print
from mcalf_tpu.utils.stats import sigma_clipped_stats

__all__ = [
    "enable_compile_cache",
    "sigma_clipped_stats",
    "phase_timer",
    "get_timings",
    "reset_timings",
    "trace",
    "save_state",
    "load_state",
    "latest_checkpoint",
    "is_rank0",
    "rank0_print",
]
