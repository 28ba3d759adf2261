"""Golden-packet tests for the binary NetFlow v5 / IPFIX parsers.

Packets are hand-built with struct.pack from the public wire formats
(NetFlow v5 fixed layout; IPFIX per RFC 7011), so every asserted value is
independently derivable from the bytes.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from elasticsearch_drift_plugin_spark import proportional_sum
from elasticsearch_drift_plugin_spark.sources import netflow

BASE_SECS = 1_600_000_000


def v5_packet(records, sys_uptime=1000, unix_secs=BASE_SECS, unix_nsecs=500_000_000,
              sampling=0):
    hdr = struct.pack(
        ">HHIIIIBBH", 5, len(records), sys_uptime, unix_secs, unix_nsecs, 0, 0, 0,
        sampling,
    )
    recs = b""
    for r in records:
        recs += struct.pack(
            ">IIIHHIIIIHHBBBBHHBBH",
            r["src"], r["dst"], 0, 0, 0, r.get("pkts", 10), r["octets"],
            r["first"], r["last"], r.get("sport", 1234), r.get("dport", 80),
            0, 0, r.get("proto", 6), 0, 0, 0, 0, 0, 0,
        )
    return hdr + recs


def ip(a, b, c, d):
    return (a << 24) | (b << 16) | (c << 8) | d


def _raw(spark, payloads):
    return spark.createDataFrame([(p,) for p in payloads], "value binary")


def test_netflow_v5_golden(spark):
    pkt = v5_packet(
        [
            {"src": ip(10, 0, 0, 1), "dst": ip(192, 168, 1, 2), "octets": 350,
             "first": 2000, "last": 5000, "sport": 4242, "dport": 443},
            {"src": ip(172, 16, 0, 9), "dst": ip(10, 0, 0, 1), "octets": 120,
             "first": 2500, "last": 2500, "proto": 17},
        ],
        sampling=(1 << 14) | 5,  # mode=1, interval=5
    )
    rows = netflow.parse_netflow_v5(_raw(spark, [pkt])).orderBy("value").collect()
    assert len(rows) == 2
    base = BASE_SECS * 1000 + 500 - 1000  # secs*1e3 + nsecs/1e6 - sys_uptime
    r350 = rows[1]
    assert (r350["start_ms"], r350["end_ms"]) == (base + 2000, base + 5000)
    assert r350["value"] == 350.0
    assert r350["sampling"] == 5.0
    assert (r350["src_ip"], r350["dst_ip"]) == ("10.0.0.1", "192.168.1.2")
    assert (r350["src_port"], r350["dst_port"], r350["protocol"]) == (4242, 443, 6)
    r120 = rows[0]
    assert r120["start_ms"] == r120["end_ms"] == base + 2500
    assert r120["protocol"] == 17


def test_netflow_v5_unsampled_and_garbage(spark):
    good = v5_packet([{"src": 1, "dst": 2, "octets": 7, "first": 0, "last": 10}])
    truncated = good[:40]  # header + partial record: count clamps to 0
    v9 = struct.pack(">HH", 9, 1) + b"\x00" * 44
    rows = netflow.parse_netflow_v5(_raw(spark, [good, truncated, v9, b"\x01"])).collect()
    assert len(rows) == 1
    assert rows[0]["sampling"] is None  # interval 0 => unsampled => NULL


def test_netflow_v5_into_proportional_sum(spark):
    # flow covering [base+100, base+450) with 350 octets, interval 100 —
    # the reference README example riding on real v5 bytes end-to-end
    pkt = v5_packet(
        [{"src": 1, "dst": 2, "octets": 350, "first": 100, "last": 450}],
        sys_uptime=0, unix_secs=0, unix_nsecs=0,
    )
    flows = netflow.parse_netflow_v5(_raw(spark, [pkt]))
    out = proportional_sum(
        flows, "start_ms", "end_ms", "value", interval=100, start=0, end=500
    ).collect()
    assert [(r["key"], r["value"]) for r in out] == [
        (100, 100.0), (200, 100.0), (300, 100.0), (400, 50.0),
    ]


TEMPLATE = [(152, 8), (153, 8), (1, 4), (34, 4), (4, 1)]


def ipfix_template_set(tid=256, fields=TEMPLATE):
    body = struct.pack(">HH", tid, len(fields))
    for ie, flen in fields:
        body += struct.pack(">HH", ie, flen)
    return struct.pack(">HH", 2, 4 + len(body)) + body


def ipfix_data_set(records, tid=256):
    body = b""
    for start, end, octets, sampl, proto in records:
        body += struct.pack(">QQIIB", start, end, octets, sampl, proto)
    return struct.pack(">HH", tid, 4 + len(body)) + body


def ipfix_message(sets, domain=7):
    body = b"".join(sets)
    return struct.pack(">HHIII", 10, 16 + len(body), BASE_SECS, 0, domain) + body


def test_ipfix_same_message_template(spark):
    msg = ipfix_message(
        [
            ipfix_template_set(),
            ipfix_data_set([(1000, 4000, 350, 0, 6), (2000, 2000, 42, 8, 17)]),
        ]
    )
    rows = netflow.parse_ipfix(_raw(spark, [msg])).orderBy("value").collect()
    assert len(rows) == 2
    r = rows[1]
    assert (r["obs_domain"], r["template_id"]) == (7, 256)
    assert (r["start_ms"], r["end_ms"], r["value"]) == (1000, 4000, 350.0)
    assert r["sampling"] is None and r["protocol"] == 6
    assert rows[0]["sampling"] == 8.0


def test_ipfix_out_of_band_templates(spark):
    tmpl_msg = ipfix_message([ipfix_template_set()])
    data_msg = ipfix_message([ipfix_data_set([(5, 10, 99, 0, 1)])])
    # without the template the data set is unreadable
    assert netflow.parse_ipfix(_raw(spark, [data_msg])).count() == 0
    templates = netflow.ipfix_extract_templates(_raw(spark, [tmpl_msg]))
    assert templates == {(7, 256): TEMPLATE}
    rows = netflow.parse_ipfix(
        _raw(spark, [data_msg]), static_templates=templates
    ).collect()
    assert len(rows) == 1 and rows[0]["value"] == 99.0


def test_ipfix_ignores_non_ipfix(spark):
    assert netflow.parse_ipfix(_raw(spark, [b"", b"\x00\x05junk"])).count() == 0


# --- NetFlow v9 (RFC 3954): templated, sysuptime-relative times -----------

V9_TEMPLATE = [(8, 4), (12, 4), (1, 4), (22, 4), (21, 4), (4, 1)]


def v9_template_flowset(tid=260, fields=V9_TEMPLATE):
    body = struct.pack(">HH", tid, len(fields))
    for ft, flen in fields:
        body += struct.pack(">HH", ft, flen)
    return struct.pack(">HH", 0, 4 + len(body)) + body


def v9_data_flowset(records, tid=260, pad=0):
    body = b""
    for src, dst, octets, first, last, proto in records:
        body += struct.pack(">IIIIIB", src, dst, octets, first, last, proto)
    body += b"\x00" * pad
    return struct.pack(">HH", tid, 4 + len(body)) + body


def v9_packet(flowsets, sys_uptime=1000, unix_secs=BASE_SECS, source_id=3):
    body = b"".join(flowsets)
    return (
        struct.pack(">HHIIII", 9, len(flowsets), sys_uptime, unix_secs, 0, source_id)
        + body
    )


def test_netflow_v9_same_packet_template(spark):
    pkt = v9_packet(
        [
            v9_template_flowset(),
            # 4-byte padding after the records is legal in v9
            v9_data_flowset(
                [
                    (ip(10, 0, 0, 1), ip(10, 0, 0, 2), 350, 2000, 5000, 6),
                    (ip(10, 0, 0, 3), ip(10, 0, 0, 4), 42, 2500, 2500, 17),
                ],
                pad=2,
            ),
        ]
    )
    rows = netflow.parse_ipfix(_raw(spark, [pkt])).orderBy("value").collect()
    assert len(rows) == 2
    base = BASE_SECS * 1000 - 1000  # unix_secs*1e3 - sys_uptime
    r = rows[1]
    assert (r["obs_domain"], r["template_id"]) == (3, 260)
    assert (r["start_ms"], r["end_ms"]) == (base + 2000, base + 5000)
    assert (r["value"], r["protocol"], r["src_ip"]) == (350.0, 6, "10.0.0.1")
    assert rows[0]["start_ms"] == rows[0]["end_ms"] == base + 2500


def test_netflow_v9_out_of_band_template_and_psum(spark):
    tmpl_pkt = v9_packet([v9_template_flowset()])
    data_pkt = v9_packet(
        [v9_data_flowset([(1, 2, 350, 100, 450, 6)])], sys_uptime=0, unix_secs=0
    )
    templates = netflow.ipfix_extract_templates(_raw(spark, [tmpl_pkt]))
    assert templates == {(3, 260): V9_TEMPLATE}
    flows = netflow.parse_netflow_v9(_raw(spark, [data_pkt]), static_templates=templates)
    out = proportional_sum(
        flows, "start_ms", "end_ms", "value", interval=100, start=0, end=500
    ).collect()
    assert [(r["key"], r["value"]) for r in out] == [
        (100, 100.0), (200, 100.0), (300, 100.0), (400, 50.0),
    ]


def test_mixed_v9_v10_stream(spark):
    v10_msg = ipfix_message([ipfix_template_set(), ipfix_data_set([(7, 9, 11, 0, 1)])])
    v9_pkt = v9_packet(
        [v9_template_flowset(), v9_data_flowset([(1, 2, 22, 5, 6, 4)])],
        sys_uptime=0, unix_secs=0,
    )
    rows = netflow.parse_ipfix(_raw(spark, [v10_msg, v9_pkt])).orderBy("value").collect()
    assert [(r["value"], r["obs_domain"]) for r in rows] == [(11.0, 7), (22.0, 3)]


def test_ipfix_ipv6_addresses(spark):
    """IPFIX IEs 27/28 (IPv6 src/dst, 16 bytes) land in src_ip/dst_ip as
    RFC 5952 compressed text; IPv4 and IPv6 records coexist in one stream."""
    import ipaddress

    v6_fields = [(27, 16), (28, 16), (1, 4), (4, 1)]
    src = ipaddress.IPv6Address("2001:db8::1")
    dst = ipaddress.IPv6Address("fe80::dead:beef")
    rec = src.packed + dst.packed + struct.pack(">IB", 77, 6)
    dset = struct.pack(">HH", 310, 4 + len(rec)) + rec
    msg = ipfix_message([ipfix_template_set(tid=310, fields=v6_fields), dset])
    v4_msg = ipfix_message([ipfix_template_set(), ipfix_data_set([(1, 2, 11, 0, 17)])])
    rows = netflow.parse_ipfix(_raw(spark, [msg, v4_msg])).orderBy("value").collect()
    assert len(rows) == 2
    r6 = rows[1]
    assert (r6["src_ip"], r6["dst_ip"]) == ("2001:db8::1", "fe80::dead:beef")
    assert (r6["value"], r6["protocol"]) == (77.0, 6)
    assert rows[0]["value"] == 11.0  # v4 record unaffected


def test_ipfix_enterprise_ie_no_alias_and_alignment(spark):
    """An enterprise IE with low id 1 (0x8001 + PEN) must NOT be read as
    octetDeltaCount; its bytes are consumed so later standard fields stay
    aligned. Wire format per RFC 7011 §3.2: 0x8000|id, length, then PEN."""
    tid = 320
    body = struct.pack(">HH", tid, 3)
    body += struct.pack(">HHI", 0x8000 | 1, 4, 9999)  # enterprise "1", PEN 9999
    body += struct.pack(">HH", 1, 4)                  # real octetDeltaCount
    body += struct.pack(">HH", 4, 1)                  # protocol
    tset = struct.pack(">HH", 2, 4 + len(body)) + body
    rec = struct.pack(">IIB", 555, 350, 6)  # enterprise bytes, octets, proto
    dset = struct.pack(">HH", tid, 4 + len(rec)) + rec
    rows = netflow.parse_ipfix(_raw(spark, [ipfix_message([tset, dset])])).collect()
    assert len(rows) == 1
    assert (rows[0]["value"], rows[0]["protocol"]) == (350.0, 6)


def test_v9_vendor_type_out_of_band_no_enterprise_skip(spark):
    """v9 has no enterprise bit: a vendor field type >= 0x8000 in an
    out-of-band v9 template must parse as a plain (type, len) pair — no
    4-byte PEN skip — matching the in-band kernel."""
    fields = [(0x9999, 2), (1, 4), (22, 4), (21, 4), (4, 1)]
    tmpl_pkt = v9_packet([v9_template_flowset(tid=270, fields=fields)])
    templates = netflow.ipfix_extract_templates(_raw(spark, [tmpl_pkt]))
    assert templates == {(3, 270): fields}
    rec = struct.pack(">HIIIB", 0xABCD, 260, 100, 200, 17)
    dset = struct.pack(">HH", 270, 4 + len(rec)) + rec
    data_pkt = v9_packet([dset], sys_uptime=0, unix_secs=0)
    rows = netflow.parse_netflow_v9(
        _raw(spark, [data_pkt]), static_templates=templates
    ).collect()
    assert len(rows) == 1
    assert (rows[0]["value"], rows[0]["start_ms"], rows[0]["end_ms"], rows[0]["protocol"]) == (
        260.0, 100, 200, 17,
    )


def test_ipfix_variable_length_fields(spark):
    """RFC 7011 §7: a varlen IE (0xFFFF in the template, per-record length
    prefix) between numeric fields must be skipped with correct alignment —
    both the short form and the 255-marker long form."""
    fields = [(1, 4), (84, 0xFFFF), (4, 1)]  # octets, samplerName (varlen), proto
    tset = ipfix_template_set(tid=300, fields=fields)
    rec1 = struct.pack(">I", 111) + bytes([3]) + b"abc" + bytes([6])
    rec2 = struct.pack(">I", 222) + bytes([255]) + struct.pack(">H", 300) + b"x" * 300 + bytes([17])
    dset = struct.pack(">HH", 300, 4 + len(rec1) + len(rec2)) + rec1 + rec2
    msg = ipfix_message([tset, dset])
    rows = netflow.parse_ipfix(_raw(spark, [msg])).orderBy("value").collect()
    assert [(r["value"], r["protocol"]) for r in rows] == [(111.0, 6), (222.0, 17)]


def test_v9_options_sampling(spark):
    """v9 options flowset (id 1): scope SYSTEM + samplerId/algorithm/
    interval option fields; the options data record yields the exporter's
    sampling config (RFC 3954 §6.5.1 wire format)."""
    # template 400: scope len 4 (1 field), option len 12 (3 fields)
    tbody = struct.pack(">HHH", 400, 4, 12)
    tbody += struct.pack(">HH", 1, 4)    # scope: System (type 1), 4 bytes
    tbody += struct.pack(">HH", 48, 2)   # samplerId
    tbody += struct.pack(">HH", 35, 1)   # samplingAlgorithm
    tbody += struct.pack(">HH", 34, 4)   # samplingInterval
    tset = struct.pack(">HH", 1, 4 + len(tbody)) + tbody
    rec = struct.pack(">IHBI", 7, 3, 2, 100)  # scope=7, sampler 3, alg 2, ivl 100
    dset = struct.pack(">HH", 400, 4 + len(rec)) + rec
    pkt = v9_packet([tset, dset])
    rows = netflow.parse_options(_raw(spark, [pkt])).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["obs_domain"], r["template_id"]) == (3, 400)
    assert (r["scope_ie"], r["scope_value"]) == (1, 7)
    assert (r["sampler_id"], r["sampling_algorithm"], r["sampling_interval"]) == (3, 2, 100.0)


def test_ipfix_options_sampling_and_enrichment(spark):
    """IPFIX options template (set 3, scope-count form) + enrichment: flows
    whose data records carry no sampling IE inherit the options-declared
    interval per obs_domain via apply_options_sampling."""
    tbody = struct.pack(">HHH", 500, 3, 1)   # tid, 3 fields total, 1 scope
    tbody += struct.pack(">HH", 149, 4)      # scope: observationDomainId
    tbody += struct.pack(">HH", 50, 4)       # samplerRandomInterval
    tbody += struct.pack(">HH", 49, 1)       # samplerMode
    tset = struct.pack(">HH", 3, 4 + len(tbody)) + tbody
    rec = struct.pack(">IIB", 7, 64, 1)
    dset = struct.pack(">HH", 500, 4 + len(rec)) + rec
    opt_msg = ipfix_message([tset, dset])  # domain 7
    opts = netflow.parse_options(_raw(spark, [opt_msg]))
    r = opts.collect()[0]
    assert (r["obs_domain"], r["sampling_interval"], r["sampling_algorithm"]) == (7, 64.0, 1)

    # flow records WITHOUT an inline sampling IE (template omits IE 34)
    fields = [(152, 8), (153, 8), (1, 4), (4, 1)]
    frec = struct.pack(">QQIB", 1000, 2000, 350, 6)
    fdset = struct.pack(">HH", 320, 4 + len(frec)) + frec
    flow_msg = ipfix_message([ipfix_template_set(tid=320, fields=fields), fdset])
    flows = netflow.parse_ipfix(_raw(spark, [flow_msg]))
    enriched = netflow.apply_options_sampling(flows, opts).collect()
    assert len(enriched) == 1
    assert enriched[0]["sampling"] == 64.0
    assert enriched[0]["value"] == 350.0


def test_ipfix_sysuptime_times_resolve_via_options_clock(spark):
    """IPFIX records with v9-style FIRST/LAST_SWITCHED (22/21) have no
    header clock; they stay NULL until an options-delivered IE 160 boot
    clock (options_clock -> clock_by_domain) resolves them."""
    fields = [(22, 4), (21, 4), (1, 4), (4, 1)]
    rec = struct.pack(">IIIB", 5_000, 8_000, 42, 6)  # uptimes ms
    dset = struct.pack(">HH", 330, 4 + len(rec)) + rec
    flow_msg = ipfix_message([ipfix_template_set(tid=330, fields=fields), dset])

    # without a clock: value parses, times NULL
    rows = netflow.parse_ipfix(_raw(spark, [flow_msg])).collect()
    assert rows[0]["value"] == 42.0
    assert rows[0]["start_ms"] is None and rows[0]["end_ms"] is None

    # options message: scope + systemInitTimeMilliseconds (IE 160)
    boot = 1_600_000_000_000
    tbody = struct.pack(">HHH", 600, 2, 1)
    tbody += struct.pack(">HH", 149, 4)  # scope: observationDomainId
    tbody += struct.pack(">HH", 160, 8)  # systemInitTimeMilliseconds
    tset = struct.pack(">HH", 3, 4 + len(tbody)) + tbody
    orec = struct.pack(">IQ", 7, boot)
    odset = struct.pack(">HH", 600, 4 + len(orec)) + orec
    opts = netflow.parse_options(_raw(spark, [ipfix_message([tset, odset])]))
    clock = netflow.options_clock(opts)
    assert clock == {7: boot}

    rows = netflow.parse_ipfix(_raw(spark, [flow_msg]), clock_by_domain=clock).collect()
    assert (rows[0]["start_ms"], rows[0]["end_ms"]) == (boot + 5_000, boot + 8_000)


def test_parse_flows_mixed_versions(spark):
    v5 = v5_packet(
        [{"src": 1, "dst": 2, "octets": 100, "first": 0, "last": 10}],
        sys_uptime=0, unix_secs=0, unix_nsecs=0,
    )
    v9 = v9_packet(
        [v9_template_flowset(), v9_data_flowset([(3, 4, 200, 0, 20, 6)])],
        sys_uptime=0, unix_secs=0,
    )
    v10 = ipfix_message([ipfix_template_set(), ipfix_data_set([(0, 30, 300, 0, 17)])])
    flows = netflow.parse_flows(_raw(spark, [v5, v9, v10, b"junk"]))
    rows = flows.orderBy("value").collect()
    assert [(r["value"], r["end_ms"]) for r in rows] == [(100.0, 10), (200.0, 20), (300.0, 30)]
    assert flows.columns == list(netflow.FLOW_COLUMNS)
