from .registry import SchemaRegistry
from .sensing import observe_shapes, infer_json_schema, classify_map_vs_struct
from .drift import detect_drift

__all__ = [
    "SchemaRegistry",
    "observe_shapes",
    "infer_json_schema",
    "classify_map_vs_struct",
    "detect_drift",
]
