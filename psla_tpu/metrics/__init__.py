from psla_tpu.metrics.stats import (  # noqa: F401
    calculate_stats,
    d_prime,
    mean_average_precision,
)
