from . import flows, netflow
from .flows import load_table, parse_flow_json
from .netflow import ipfix_extract_templates, parse_ipfix, parse_netflow_v5

__all__ = [
    "flows",
    "netflow",
    "load_table",
    "parse_flow_json",
    "parse_netflow_v5",
    "parse_ipfix",
    "ipfix_extract_templates",
]
