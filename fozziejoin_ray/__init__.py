"""fozziejoin_ray — a Ray-Data-native record-linkage / fuzzy-join engine.

From-scratch re-expression of the query capabilities of
JonDDowns/fozziejoin (an R + Rust in-memory fuzzy-join package, reference
at /root/reference) as streaming Ray Data pipelines: blocking +
pairwise scoring + join-mode assembly + transitive clustering, over
Arrow batches, designed for multi-node scale.
"""

from .joins.string_join import fuzzy_string_join  # noqa: F401

__all__ = ["fuzzy_string_join"]
__version__ = "0.1.0"
