from .registry import SchemaRegistry
from .sensing import observe_shapes, infer_json_schema, classify_map_vs_struct
from .drift import detect_drift
from .json_schema import to_json_schema, to_json_schema_string

__all__ = [
    "SchemaRegistry",
    "observe_shapes",
    "infer_json_schema",
    "classify_map_vs_struct",
    "detect_drift",
    "to_json_schema",
    "to_json_schema_string",
]
