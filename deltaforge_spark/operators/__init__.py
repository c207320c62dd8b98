from .filter import FilterSpec, compile_filter, apply_filter
from .flatten import flatten_events, flatten_struct_cols
from .outbox import OutboxSpec, outbox_transform
from .routing import compile_template, with_routing
from .synthetic import mark_synthetic
from .envelopes import envelope_native, envelope_debezium, envelope_cloudevents

__all__ = [
    "FilterSpec",
    "compile_filter",
    "apply_filter",
    "flatten_events",
    "flatten_struct_cols",
    "OutboxSpec",
    "outbox_transform",
    "compile_template",
    "with_routing",
    "mark_synthetic",
    "envelope_native",
    "envelope_debezium",
    "envelope_cloudevents",
]
