"""spark-drift: a PySpark-native analytics engine with the query and
data-processing capabilities of OpenNMS/elasticsearch-drift-plugin.

The reference system (see /root/reference, SURVEY.md) is an Elasticsearch
plugin implementing one aggregation operator, ``proportional_sum``: a
date-histogram over per-record time *ranges* where each record credits every
bucket it overlaps with a share of its value proportional to the time spent
in that bucket. This package re-expresses that operator — and the host-ES
surfaces it relies on, plus large-scale training-data-pipeline extensions —
as idiomatic PySpark: native DataFrame expressions compiled by Catalyst,
with Structured Streaming for continuous flow ingestion.

Public API
----------
- :func:`operators.proportional_sum.proportional_sum` — the core operator
  (plus :func:`keyed_json`, the keyed-output serving edge).
- :mod:`sources` — flow derivations, binary NetFlow v5/v9/IPFIX parsers
  (:func:`sources.parse_flows`), JSON parsing, and histogram sinks.
- :mod:`operators.dedup`, :mod:`operators.similarity`,
  :mod:`operators.text`, :mod:`operators.multimodal`,
  :mod:`operators.sessionize` — pipeline extensions.
- :mod:`streaming` — streaming proportional_sum and stateful flow
  sessionization.
"""

from .operators.proportional_sum import keyed_json, proportional_sum
from .params import PSumParams, parse_interval, parse_offset

__all__ = ["proportional_sum", "keyed_json", "PSumParams", "parse_interval", "parse_offset"]

__version__ = "0.1.0"
