from mcalf_tpu.sampler.nested import (
    nested_sample_device,
    NSConfig,
    NSResults,
    NSState,
    finalize,
    init_state,
    is_done,
    make_sampler,
    nested_sample,
    run_steps,
    warmup_executables,
)
from mcalf_tpu.sampler.clusters import (
    ClusterReport,
    assign_clusters,
    posterior_cluster_report,
)
from mcalf_tpu.sampler.diagnostics import RankDiagnostic, insertion_rank_test
from mcalf_tpu.sampler.dynamic import (
    DynamicResults,
    dynamic_sample,
    posterior_ess,
)
from mcalf_tpu.sampler.merge import MergedRun, merge_results, nlive_of_logl
from mcalf_tpu.sampler.repeats import (
    ConvergedRun,
    LadderRung,
    converged_sample,
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
    "finalize",
    "init_state",
    "is_done",
    "warmup_executables",
    "make_sampler",
    "nested_sample",
    "nested_sample_device",
    "run_steps",
    "equal_weights_matrix",
    "posterior_stats",
    "resample_equal",
    "MergedRun",
    "merge_results",
    "nlive_of_logl",
    "RankDiagnostic",
    "insertion_rank_test",
    "ClusterReport",
    "assign_clusters",
    "posterior_cluster_report",
    "DynamicResults",
    "dynamic_sample",
    "posterior_ess",
    "ConvergedRun",
    "LadderRung",
    "converged_sample",
]
