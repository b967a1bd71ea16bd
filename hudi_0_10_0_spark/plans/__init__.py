"""Planning layer: file-listing pruning decisions made before any scan.

Spark's Catalyst handles expression-level planning (pushdown, pruning,
join strategy) once a DataFrame exists; what a table format adds on top
is WHICH FILES the DataFrame reads. This package holds those pre-scan
decisions: predicate-tree evaluation against per-file column stats
(reference: ``sql/hudi/DataSkippingUtils.scala:49-229``), mirrored into
row-level Column filters for post-merge re-application.
"""

from .pruning import (
    prune_slices_by_stats,
    pred_to_column,
    pred_possible,
)

__all__ = ["prune_slices_by_stats", "pred_to_column", "pred_possible"]
