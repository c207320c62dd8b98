from .files import write_lake
from .rolling import RollingConfig, RollingLakeSink, should_roll
from .dlq import split_dlq, write_dlq
from .foreach import CommitPolicy, SinkSpec, fan_out_batch, OffsetStore
from .kafka import kafka_payload
from .kafka_eos import (
    FileTransactionalBroker,
    ProducerFencedError,
    SinkFatalError,
    SinkRetryableError,
    file_broker_producer_factory,
    write_kafka_eos,
)

__all__ = [
    "FileTransactionalBroker",
    "ProducerFencedError",
    "SinkFatalError",
    "SinkRetryableError",
    "file_broker_producer_factory",
    "write_kafka_eos",
    "write_lake",
    "RollingConfig",
    "RollingLakeSink",
    "should_roll",
    "split_dlq",
    "write_dlq",
    "CommitPolicy",
    "SinkSpec",
    "fan_out_batch",
    "OffsetStore",
    "kafka_payload",
]
