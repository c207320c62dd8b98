from .snapshot import snapshot_events, read_table
from .changefeed import change_feed

__all__ = ["snapshot_events", "read_table", "change_feed"]
