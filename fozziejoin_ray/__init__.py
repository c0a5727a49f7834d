"""fozziejoin_ray — a Ray-Data-native record-linkage / fuzzy-join engine.

From-scratch re-expression of the query capabilities of
JonDDowns/fozziejoin (an R + Rust in-memory fuzzy-join package, reference
at /root/reference) as streaming Ray Data pipelines: blocking +
pairwise scoring + join-mode assembly + transitive clustering, over
Arrow batches, designed for multi-node scale.
"""

from .joins.asof import fuzzy_asof_join, fuzzy_temporal_asof_join  # noqa: F401
from .joins.hashjoin import hash_join  # noqa: F401
from .joins.interval_join import fuzzy_interval_join  # noqa: F401
from .joins.numeric_join import fuzzy_difference_join, fuzzy_distance_join  # noqa: F401
from .joins.regex_join import fuzzy_regex_join  # noqa: F401
from .joins.string_join import fuzzy_string_join  # noqa: F401
from .joins.temporal import fuzzy_temporal_interval_join, fuzzy_temporal_join  # noqa: F401

__all__ = [
    "fuzzy_string_join",
    "fuzzy_difference_join",
    "fuzzy_distance_join",
    "fuzzy_interval_join",
    "fuzzy_regex_join",
    "fuzzy_temporal_join",
    "fuzzy_temporal_interval_join",
    "fuzzy_asof_join",
    "fuzzy_temporal_asof_join",
    "hash_join",
]
__version__ = "0.1.0"
