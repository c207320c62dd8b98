from .pipeline import StreamingPipeline, dedup_events
from .transactions import assemble_transactions, assembled_transactions_batch

__all__ = [
    "StreamingPipeline",
    "dedup_events",
    "assemble_transactions",
    "assembled_transactions_batch",
]
