from .files import write_lake
from .dlq import split_dlq, write_dlq
from .foreach import CommitPolicy, SinkSpec, fan_out_batch, OffsetStore
from .kafka import kafka_payload

__all__ = [
    "write_lake",
    "split_dlq",
    "write_dlq",
    "CommitPolicy",
    "SinkSpec",
    "fan_out_batch",
    "OffsetStore",
    "kafka_payload",
]
