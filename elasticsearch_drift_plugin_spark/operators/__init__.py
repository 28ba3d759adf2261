from .proportional_sum import proportional_sum

__all__ = ["proportional_sum"]
