from mcalf_tpu.sampler.nested import (
    NSConfig,
    NSResults,
    NSState,
    make_sampler,
    nested_sample,
)
from mcalf_tpu.sampler.results import (
    equal_weights_matrix,
    posterior_stats,
    resample_equal,
)

__all__ = [
    "NSConfig",
    "NSResults",
    "NSState",
    "make_sampler",
    "nested_sample",
    "equal_weights_matrix",
    "posterior_stats",
    "resample_equal",
]
