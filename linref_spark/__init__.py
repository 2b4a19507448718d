"""linref_spark — a from-scratch PySpark-native linear-referencing engine.

Re-creates the query semantics of ``tariqshihadah/linref`` (reference at
/root/reference, studied not ported) as distributed DataFrame operators:
route-keyed interval joins, closure-aware intersect/overlay, windowed event
engineering (dissolve/resegment/separate/integrate), weighted aggregation,
sliding-window distribute, numpy-kernel M-geometry UDFs, and deterministic
grid tiling for spatial joins — plus the web-scale text-pipeline operators
(dedup, language-ID, quality, ANN) the 100 TB target needs.
"""

from linref_spark.lrs import LRS, EVENT_ID
from linref_spark.frame import LinrefFrame, LinrefRelation, wrap
from linref_spark.interop import frame_from_wkb, frame_to_wkb
from linref_spark.options import get_default_lrs, options, set_default_lrs

__all__ = [
    "LRS", "EVENT_ID", "LinrefFrame", "LinrefRelation", "wrap",
    "options", "set_default_lrs", "get_default_lrs",
    "frame_from_wkb", "frame_to_wkb",
]
__version__ = "0.1.0"
