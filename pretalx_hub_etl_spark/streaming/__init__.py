from .windows import late_filter, session_agg, sliding_agg, tumbling_agg

__all__ = ["late_filter", "session_agg", "sliding_agg", "tumbling_agg"]
