from mcalf_tpu.parallel.fleet import (
    fit_many,
    fit_stacked,
    init_distributed,
    make_mesh,
)
from mcalf_tpu.parallel.results_io import fleet_summary, save_fleet_results

__all__ = [
    "fit_many",
    "fit_stacked",
    "make_mesh",
    "init_distributed",
    "fleet_summary",
    "save_fleet_results",
]
