from .pipeline import StreamingPipeline, dedup_events

__all__ = ["StreamingPipeline", "dedup_events"]
