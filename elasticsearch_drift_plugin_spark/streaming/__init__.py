from .proportional_sum_stream import proportional_sum_stream

__all__ = ["proportional_sum_stream"]
