from . import flows, netflow, sinks
from .flows import load_table, parse_flow_json
from .netflow import (
    ipfix_extract_templates,
    parse_ipfix,
    parse_flows,
    parse_netflow_v5,
    parse_netflow_v9,
)
from .sinks import read_histogram, write_histogram, write_histogram_stream

__all__ = [
    "flows",
    "netflow",
    "sinks",
    "read_histogram",
    "write_histogram",
    "write_histogram_stream",
    "load_table",
    "parse_flow_json",
    "parse_netflow_v5",
    "parse_flows",
    "parse_ipfix",
    "parse_netflow_v9",
    "ipfix_extract_templates",
]
