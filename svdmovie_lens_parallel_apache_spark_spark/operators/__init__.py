from .stats import error_metrics, keyed_stats  # noqa: F401
from .relational import anti_join, semi_join, topk_per_group  # noqa: F401
