from infodiffusion_tpu.metrics.disentanglement import (
    PredMetric,
    TADMetric,
    compute_dci,
    completeness,
    disentanglement,
)

__all__ = [
    "compute_dci",
    "disentanglement",
    "completeness",
    "PredMetric",
    "TADMetric",
]
