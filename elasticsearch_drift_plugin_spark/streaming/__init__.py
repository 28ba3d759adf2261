from .flow_sessions import flow_sessions_stream
from .proportional_sum_stream import proportional_sum_stream

__all__ = ["proportional_sum_stream", "flow_sessions_stream"]
