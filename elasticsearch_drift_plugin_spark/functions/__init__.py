from .time import floor_fixed_ms, to_epoch_ms
from .hashing import md5_hash60, HEX15_SQL_FN
from .vectors import cosine_sim, dot, l2_norm

__all__ = [
    "floor_fixed_ms",
    "to_epoch_ms",
    "md5_hash60",
    "HEX15_SQL_FN",
    "cosine_sim",
    "dot",
    "l2_norm",
]
