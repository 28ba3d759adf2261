from .inspect import (
    codegen_span_ids,
    explain_str,
    has_python_eval,
    hash_exchange_count,
    read_schema,
)

__all__ = [
    "explain_str",
    "codegen_span_ids",
    "has_python_eval",
    "hash_exchange_count",
    "read_schema",
]
