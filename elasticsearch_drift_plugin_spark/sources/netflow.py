"""Binary NetFlow v5 / IPFIX record parsers (the ingestion edge of the
reference's north star: flow datagrams → the engine's flow schema
``[start_ms, end_ms, value(bytes), sampling]`` consumed by
``operators.proportional_sum`` — reference README.md:56-84 describes the
same fields arriving as ES documents via Logstash/filebeat).

Input convention: one datagram per row in a ``binary`` column — exactly what
``spark.readStream.format("kafka")`` delivers in ``value``, so both parsers
work unchanged over static and streaming DataFrames.

Design (Spark-first):

- **NetFlow v5** has a fixed 24-byte header + 48-byte records, so the whole
  parse is native column expressions — ``substring`` on binary, ``hex`` →
  ``conv`` for big-endian unsigned ints, ``explode(sequence)`` over the
  record count. Zero Python in the data path: whole-stage codegen applies,
  and the parse chains straight into the proportional_sum plan.
- **IPFIX (RFC 7011) and NetFlow v9 (RFC 3954)** are template-described: record layout is only known
  after reading template sets, so the data-record walk is genuinely
  imperative → Arrow-batched ``mapInPandas`` with a self-contained closure
  (no module refs — workers need no PYTHONPATH). Templates are taken from
  the same message (the common exporter pattern: template set precedes data
  sets). For exporters that ship templates in separate datagrams, use
  ``ipfix_extract_templates`` over the template stream and pass the result
  as ``static_templates`` — at scale that's a tiny broadcast dim table,
  never a shuffle of the flow stream.

At 100 TB both parsers are pure map-side row multiplications (datagram →
~30 flows): no shuffle, no state, arbitrary parallelism by input split.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# NetFlow v5 — native expressions only
# ---------------------------------------------------------------------------

V5_HEADER_LEN = 24
V5_RECORD_LEN = 48


def _be_uint(col: Column, pos: Column | int, nbytes: int) -> Column:
    """Big-endian unsigned int from ``nbytes`` at 1-indexed ``pos`` of a
    binary column — JVM-side via hex→conv (values ≤ 2^32 fit a long)."""
    p = F.lit(pos) if isinstance(pos, int) else pos
    return F.conv(F.hex(F.substring(col, p, nbytes)), 16, 10).cast("long")


def _ipv4_str(col: Column, pos: Column) -> Column:
    octets = [_be_uint(col, pos + o, 1).cast("string") for o in range(4)]
    return F.concat_ws(".", *octets)


def parse_netflow_v5(raw: DataFrame, payload_col: str = "value") -> DataFrame:
    """NetFlow v5 datagrams → one row per flow record, all native exprs.

    Output: flow_id-less flow rows with absolute epoch-ms times
    (``start_ms``/``end_ms``), ``value`` = dOctets as double, ``sampling`` =
    the header's 14-bit sampling interval (NULL when 0 = unsampled), plus
    the 5-tuple. Non-v5 or truncated datagrams yield no rows (count is
    clamped to what the payload actually holds).
    """
    b = F.col(payload_col)
    version = _be_uint(b, 1, 2)
    declared = _be_uint(b, 3, 2)
    capacity = (F.length(b) - V5_HEADER_LEN).cast("long") / F.lit(V5_RECORD_LEN)
    count = F.least(declared, capacity.cast("long"))
    sys_uptime = _be_uint(b, 5, 4)
    unix_secs = _be_uint(b, 9, 4)
    unix_nsecs = _be_uint(b, 13, 4)
    sampl = _be_uint(b, 23, 2) % 16384  # low 14 bits; high 2 bits = mode
    # sysuptime-relative → absolute epoch ms (integer math throughout)
    epoch_base = unix_secs * 1000 + F.floor(unix_nsecs / 1_000_000) - sys_uptime

    rows = raw.where((version == 5) & (count > 0)).select(
        b.alias("__p"),
        epoch_base.alias("__base"),
        F.when(sampl > 0, sampl.cast("double")).alias("sampling"),
        F.explode(F.sequence(F.lit(0), count - 1)).alias("__i"),
    )
    off = F.lit(V5_HEADER_LEN + 1) + F.col("__i") * V5_RECORD_LEN
    p = F.col("__p")
    return rows.select(
        (F.col("__base") + _be_uint(p, off + 24, 4)).alias("start_ms"),
        (F.col("__base") + _be_uint(p, off + 28, 4)).alias("end_ms"),
        _be_uint(p, off + 20, 4).cast("double").alias("value"),
        "sampling",
        _be_uint(p, off + 16, 4).alias("packets"),
        _ipv4_str(p, off).alias("src_ip"),
        _ipv4_str(p, off + 4).alias("dst_ip"),
        _be_uint(p, off + 32, 2).alias("src_port"),
        _be_uint(p, off + 34, 2).alias("dst_port"),
        _be_uint(p, off + 38, 1).alias("protocol"),
    )


# ---------------------------------------------------------------------------
# IPFIX (RFC 7011) — template-driven subset
# ---------------------------------------------------------------------------

# Information elements we materialize (RFC 7012 registry ids).
IE_OCTETS = 1
IE_PACKETS = 2
IE_PROTOCOL = 4
IE_SRC_PORT = 7
IE_SRC_IP4 = 8
IE_DST_PORT = 11
IE_DST_IP4 = 12
IE_SRC_IP6 = 27
IE_DST_IP6 = 28
IE_SAMPLING = 34
IE_START_MS = 152
IE_END_MS = 153

IPFIX_SCHEMA = (
    "obs_domain long, template_id long, start_ms long, end_ms long, "
    "value double, sampling double, packets long, src_ip string, "
    "dst_ip string, src_port long, dst_port long, protocol long"
)


def _make_ipfix_kernel(
    payload_col: str,
    static_templates: dict | None,
    clock_by_domain: dict | None = None,
):
    """Build the self-contained mapInPandas kernel. Everything the closure
    touches is a local or stdlib/pandas — cloudpickle ships it by value."""
    preloaded = {k: list(v) for k, v in (static_templates or {}).items()}
    clocks = {int(k): int(v) for k, v in (clock_by_domain or {}).items()}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import ipaddress as _ipaddress
        import struct as _struct

        cols = [
            "obs_domain", "template_id", "start_ms", "end_ms", "value",
            "sampling", "packets", "src_ip", "dst_ip", "src_port",
            "dst_port", "protocol",
        ]

        def parse_templates(buf, hdr_len, tset_id, dom, enterprise, templates):
            # one pass collecting template sets (IPFIX set 2 / v9 flowset 0)
            pos, end = hdr_len, len(buf)
            while pos + 4 <= end:
                set_id, set_len = _struct.unpack_from(">HH", buf, pos)
                if set_len < 4 or pos + set_len > end:
                    break
                if set_id == tset_id:
                    p, sl_end = pos + 4, pos + set_len
                    while p + 4 <= sl_end:
                        tid, nfields = _struct.unpack_from(">HH", buf, p)
                        p += 4
                        fields = []
                        ok = True
                        for _ in range(nfields):
                            if p + 4 > sl_end:
                                ok = False
                                break
                            ie, flen = _struct.unpack_from(">HH", buf, p)
                            p += 4
                            if enterprise and ie & 0x8000:
                                # IPFIX enterprise IE: 4-byte PEN follows.
                                # Qualify the id with the PEN so a private
                                # IE can never collide with a standard one
                                # (0x8001 is NOT octetDeltaCount); its bytes
                                # are still consumed for record alignment.
                                if p + 4 > sl_end:
                                    ok = False
                                    break
                                pen = _struct.unpack_from(">I", buf, p)[0]
                                p += 4
                                ie = (pen << 16) | (ie & 0x7FFF)
                            fields.append((ie, flen))
                        if ok and fields:
                            templates[(dom, tid)] = fields
                pos += set_len

        def uint(buf: bytes, pos: int, n: int) -> int:
            return int.from_bytes(buf[pos : pos + n], "big")

        def assign(row, ie, buf, fp, flen, up):
            if ie == 152:
                row["start_ms"] = uint(buf, fp, flen)
            elif ie == 153:
                row["end_ms"] = uint(buf, fp, flen)
            elif ie == 22:  # FIRST_SWITCHED (sysuptime ms)
                up[0] = uint(buf, fp, flen)
            elif ie == 21:  # LAST_SWITCHED (sysuptime ms)
                up[1] = uint(buf, fp, flen)
            elif ie == 1:
                row["value"] = float(uint(buf, fp, flen))
            elif ie == 2:
                row["packets"] = uint(buf, fp, flen)
            elif ie == 34:
                sv = uint(buf, fp, flen)
                row["sampling"] = float(sv) if sv else None
            elif ie == 8 and flen == 4:
                row["src_ip"] = ".".join(str(x) for x in buf[fp : fp + 4])
            elif ie == 12 and flen == 4:
                row["dst_ip"] = ".".join(str(x) for x in buf[fp : fp + 4])
            elif ie == 27 and flen == 16:  # sourceIPv6Address
                row["src_ip"] = str(_ipaddress.IPv6Address(bytes(buf[fp : fp + 16])))
            elif ie == 28 and flen == 16:  # destinationIPv6Address
                row["dst_ip"] = str(_ipaddress.IPv6Address(bytes(buf[fp : fp + 16])))
            elif ie == 7:
                row["src_port"] = uint(buf, fp, flen)
            elif ie == 11:
                row["dst_port"] = uint(buf, fp, flen)
            elif ie == 4:
                row["protocol"] = uint(buf, fp, flen)

        def parse_data(buf, hdr_len, dom, base_ms, templates, out):
            pos, end = hdr_len, len(buf)
            while pos + 4 <= end:
                set_id, set_len = _struct.unpack_from(">HH", buf, pos)
                if set_len < 4 or pos + set_len > end:
                    break
                tmpl = templates.get((dom, set_id)) if set_id >= 256 else None
                if tmpl:
                    # variable-length IEs (RFC 7011 §7): template length
                    # 0xFFFF ⇒ per-record length prefix (1 byte, or 255 +
                    # 2-byte form); records are walked field-by-field
                    min_len = sum(1 if fl == 0xFFFF else fl for _, fl in tmpl)
                    p, sl_end = pos + 4, pos + set_len
                    # trailing bytes shorter than a minimal record = padding
                    while min_len > 0 and p + min_len <= sl_end:
                        row = {c: None for c in cols}
                        row["obs_domain"], row["template_id"] = dom, set_id
                        up = [None, None]
                        fp = p
                        ok = True
                        for ie, flen in tmpl:
                            if flen == 0xFFFF:
                                if fp >= sl_end:
                                    ok = False
                                    break
                                vlen = buf[fp]
                                fp += 1
                                if vlen == 255:
                                    if fp + 2 > sl_end:
                                        ok = False
                                        break
                                    vlen = uint(buf, fp, 2)
                                    fp += 2
                            else:
                                vlen = flen
                            if fp + vlen > sl_end:
                                ok = False
                                break
                            assign(row, ie, buf, fp, vlen, up)
                            fp += vlen
                        if not ok or fp == p:
                            break
                        if row["start_ms"] is None and up[0] is not None and base_ms is not None:
                            row["start_ms"] = base_ms + up[0]
                        if row["end_ms"] is None and up[1] is not None and base_ms is not None:
                            row["end_ms"] = base_ms + up[1]
                        out.append(row)
                        p = fp
                pos += set_len

        for pdf in batches:
            out: list[dict] = []
            for payload in pdf[payload_col]:
                buf = bytes(payload)
                if len(buf) < 16:
                    continue
                version = _struct.unpack_from(">H", buf, 0)[0]
                if version == 10:
                    msg_len = _struct.unpack_from(">H", buf, 2)[0]
                    buf = buf[: min(msg_len, len(buf))]
                    hdr_len, tset_id, enterprise = 16, 2, True
                    dom = _struct.unpack_from(">I", buf, 12)[0]
                    # IPFIX has no header sysuptime; FIRST/LAST_SWITCHED
                    # resolve only against an options-delivered boot clock
                    # (IE 160 systemInitTimeMilliseconds, RFC 7011 §4)
                    base_ms = clocks.get(dom)
                elif version == 9:
                    if len(buf) < 20:
                        continue
                    hdr_len, tset_id, enterprise = 20, 0, False
                    sys_up, unix_secs = _struct.unpack_from(">II", buf, 4)
                    base_ms = unix_secs * 1000 - sys_up
                    dom = _struct.unpack_from(">I", buf, 16)[0]
                else:
                    continue
                templates = dict(preloaded)
                parse_templates(buf, hdr_len, tset_id, dom, enterprise, templates)
                parse_data(buf, hdr_len, dom, base_ms, templates, out)
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
                {c: [] for c in cols}
            )

    return kernel


def parse_ipfix(
    raw: DataFrame,
    payload_col: str = "value",
    static_templates: dict | None = None,
    clock_by_domain: dict | None = None,
) -> DataFrame:
    """IPFIX (RFC 7011) *and* NetFlow v9 (RFC 3954) messages → one row per
    data record (subset of RFC 7012 IEs / v9 field types, which share
    numbering by design). Version dispatch is per packet, so mixed v9/v10
    exporter streams parse in one pass.

    Addresses: IPv4 (IEs 8/12) and IPv6 (IEs 27/28, RFC 5952 compressed
    text) both land in ``src_ip``/``dst_ip`` — the flow schema is
    address-family-agnostic like the reference's ES mapping
    (README.md:58-84). IPFIX enterprise IEs (bit 0x8000 + PEN) are
    PEN-qualified internally so they never alias a standard IE; their bytes
    are consumed for alignment and the record still parses.

    Absolute times: IPFIX flowStart/EndMilliseconds (152/153) pass through;
    v9's sysuptime-relative FIRST/LAST_SWITCHED (22/21) resolve against the
    v9 header clock (unix_secs*1000 − sys_uptime).

    ``static_templates``: ``{(obs_domain, template_id): [(ie, len), ...]}``
    for exporters that send templates out-of-band; same-message templates
    always apply on top. ``clock_by_domain``: ``{obs_domain: boot epoch
    ms}`` (IE 160 via :func:`options_clock`) — IPFIX has no header
    sysuptime, so v9-style FIRST/LAST_SWITCHED in v10 records resolve only
    against this options-delivered clock (NULL otherwise). Streaming-safe
    (stateless per message).
    """
    kernel = _make_ipfix_kernel(payload_col, static_templates, clock_by_domain)
    return raw.mapInPandas(kernel, IPFIX_SCHEMA)


#: NetFlow v9 uses the same templated parser (per-packet version dispatch).
parse_netflow_v9 = parse_ipfix


def ipfix_extract_templates(raw: DataFrame, payload_col: str = "value") -> dict:
    """Collect template definitions from a (small) template stream into the
    ``static_templates`` dict. Driver-side by design: templates are an
    O(#exporters) dimension, not data."""
    out: dict = {}
    for row in raw.select(payload_col).collect():
        buf = bytes(row[0])
        if len(buf) < 16:
            continue
        version = struct.unpack_from(">H", buf, 0)[0]
        if version == 10:
            pos, tset_id, enterprise = 16, 2, True
            dom = struct.unpack_from(">I", buf, 12)[0]
        elif version == 9 and len(buf) >= 20:
            pos, tset_id, enterprise = 20, 0, False
            dom = struct.unpack_from(">I", buf, 16)[0]
        else:
            continue
        while pos + 4 <= len(buf):
            set_id, set_len = struct.unpack_from(">HH", buf, pos)
            if set_len < 4 or pos + set_len > len(buf):
                break
            if set_id == tset_id:
                p, sl_end = pos + 4, pos + set_len
                while p + 4 <= sl_end:
                    tid, nfields = struct.unpack_from(">HH", buf, p)
                    p += 4
                    fields = []
                    for _ in range(nfields):
                        if p + 4 > sl_end:
                            fields = []
                            break
                        ie, flen = struct.unpack_from(">HH", buf, p)
                        p += 4
                        # Enterprise bit is IPFIX-only (mirror the in-band
                        # kernel): v9 vendor types >= 0x8000 carry no PEN.
                        if enterprise and ie & 0x8000:
                            if p + 4 > sl_end:
                                fields = []
                                break
                            pen = struct.unpack_from(">I", buf, p)[0]
                            p += 4
                            ie = (pen << 16) | (ie & 0x7FFF)
                        fields.append((ie, flen))
                    if fields:
                        out[(dom, tid)] = fields
            pos += set_len
    return out


# ---------------------------------------------------------------------------
# Options templates (RFC 3954 §6.5.1 / RFC 7011 §3.4.2.2) — sampling config
# ---------------------------------------------------------------------------

#: Sampling-related IEs commonly delivered via options records.
IE_SAMPLING_INTERVAL = 34   # samplingInterval (also inline in data records)
IE_SAMPLING_ALGORITHM = 35  # samplingAlgorithm
IE_SAMPLER_ID = 48          # samplerId (v9 scope/option)
IE_SAMPLER_MODE = 49        # samplerMode
IE_SAMPLER_RANDOM_INTERVAL = 50  # samplerRandomInterval
IE_SYSTEM_INIT_MS = 160     # systemInitTimeMilliseconds (exporter boot clock)

OPTIONS_SCHEMA = (
    "obs_domain long, template_id long, scope_ie long, scope_value long, "
    "sampler_id long, sampling_algorithm long, sampling_interval double, "
    "system_init_ms long"
)


def parse_options(raw: DataFrame, payload_col: str = "value") -> DataFrame:
    """Options-data records (v9 flowset 1 / IPFIX set 3) → one typed row per
    record: exporter-level configuration such as the sampling interval that
    many deployments publish ONLY via options, never inline
    (``apply_options_sampling`` joins it back onto the flow rows).

    Same per-packet version dispatch as :func:`parse_ipfix`; scope fields
    are parsed (first scope's IE + integer value are materialized), option
    fields map IEs 34/35/48/49/50 into the fixed schema. Arrow-batched
    ``mapInPandas``; the closure is self-contained.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        cols = [
            "obs_domain", "template_id", "scope_ie", "scope_value",
            "sampler_id", "sampling_algorithm", "sampling_interval",
            "system_init_ms",
        ]

        def uint(buf, pos, n):
            return int.from_bytes(buf[pos : pos + n], "big")

        def parse_opt_templates(buf, hdr_len, oset_id, version, templates):
            pos, end = hdr_len, len(buf)
            while pos + 4 <= end:
                set_id, set_len = _struct.unpack_from(">HH", buf, pos)
                if set_len < 4 or pos + set_len > end:
                    break
                if set_id == oset_id:
                    p, sl_end = pos + 4, pos + set_len
                    while p + 6 <= sl_end:
                        if version == 10:
                            tid, nfields, nscope = _struct.unpack_from(">HHH", buf, p)
                            p += 6
                            counts = [(True, nscope), (False, nfields - nscope)]
                        else:
                            tid, scope_bytes, opt_bytes = _struct.unpack_from(
                                ">HHH", buf, p
                            )
                            p += 6
                            counts = [(True, scope_bytes // 4), (False, opt_bytes // 4)]
                        fields = []
                        ok = True
                        for is_scope, cnt in counts:
                            for _ in range(cnt):
                                if p + 4 > sl_end:
                                    ok = False
                                    break
                                ie, flen = _struct.unpack_from(">HH", buf, p)
                                p += 4
                                if version == 10 and ie & 0x8000:
                                    if p + 4 > sl_end:
                                        ok = False
                                        break
                                    pen = _struct.unpack_from(">I", buf, p)[0]
                                    p += 4
                                    ie = (pen << 16) | (ie & 0x7FFF)
                                fields.append((is_scope, ie, flen))
                            if not ok:
                                break
                        if ok and fields:
                            templates[tid] = fields
                        if not ok:
                            break
                pos += set_len

        def parse_opt_data(buf, hdr_len, dom, templates, out):
            pos, end = hdr_len, len(buf)
            while pos + 4 <= end:
                set_id, set_len = _struct.unpack_from(">HH", buf, pos)
                if set_len < 4 or pos + set_len > end:
                    break
                tmpl = templates.get(set_id) if set_id >= 256 else None
                if tmpl:
                    rec_len = sum(fl for _, _, fl in tmpl)
                    p, sl_end = pos + 4, pos + set_len
                    while rec_len > 0 and p + rec_len <= sl_end:
                        row = {c: None for c in cols}
                        row["obs_domain"], row["template_id"] = dom, set_id
                        fp = p
                        for is_scope, ie, flen in tmpl:
                            val = uint(buf, fp, flen)
                            if is_scope and row["scope_ie"] is None:
                                row["scope_ie"], row["scope_value"] = ie, val
                            elif not is_scope:
                                if ie == 34:
                                    row["sampling_interval"] = float(val)
                                elif ie == 50 and row["sampling_interval"] is None:
                                    row["sampling_interval"] = float(val)
                                elif ie == 35 or ie == 49:
                                    row["sampling_algorithm"] = val
                                elif ie == 48:
                                    row["sampler_id"] = val
                                elif ie == 160:
                                    row["system_init_ms"] = val
                            fp += flen
                        out.append(row)
                        p = fp
                pos += set_len

        for pdf in batches:
            out: list[dict] = []
            for payload in pdf[payload_col]:
                buf = bytes(payload)
                if len(buf) < 16:
                    continue
                version = _struct.unpack_from(">H", buf, 0)[0]
                if version == 10:
                    msg_len = _struct.unpack_from(">H", buf, 2)[0]
                    buf = buf[: min(msg_len, len(buf))]
                    hdr_len, oset_id = 16, 3
                    dom = _struct.unpack_from(">I", buf, 12)[0]
                elif version == 9 and len(buf) >= 20:
                    hdr_len, oset_id = 20, 1
                    dom = _struct.unpack_from(">I", buf, 16)[0]
                else:
                    continue
                templates: dict = {}
                parse_opt_templates(buf, hdr_len, oset_id, version, templates)
                parse_opt_data(buf, hdr_len, dom, templates, out)
            yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
                {c: [] for c in cols}
            )

    return raw.mapInPandas(kernel, OPTIONS_SCHEMA)


def options_clock(options: DataFrame) -> dict:
    """``{obs_domain: boot epoch ms}`` from options records carrying IE 160
    (systemInitTimeMilliseconds), latest per exporter — pass to
    :func:`parse_ipfix` as ``clock_by_domain``. Driver-side by design:
    O(#exporters) rows, the same dimension-table pattern as
    :func:`ipfix_extract_templates`."""
    rows = (
        options.where(F.col("system_init_ms").isNotNull())
        .groupBy("obs_domain")
        .agg(F.last("system_init_ms").alias("c"))
        .collect()
    )
    return {int(r["obs_domain"]): int(r["c"]) for r in rows}


def apply_options_sampling(flows: DataFrame, options: DataFrame) -> DataFrame:
    """Fill NULL ``sampling`` on parsed flow rows from the exporter's
    options-declared sampling interval (latest per obs_domain). The options
    table is O(#exporters) — broadcast, never a shuffle of the flows."""
    opt = (
        options.where(F.col("sampling_interval").isNotNull())
        .groupBy("obs_domain")
        .agg(F.last("sampling_interval").alias("__opt_sampling"))
    )
    return (
        flows.join(F.broadcast(opt), "obs_domain", "left")
        .withColumn(
            "sampling",
            F.when(
                F.col("sampling").isNull() & (F.col("__opt_sampling") > 0),
                F.col("__opt_sampling"),
            ).otherwise(F.col("sampling")),
        )
        .drop("__opt_sampling")
    )


# ---------------------------------------------------------------------------
# Unified entry: mixed-version exporter streams
# ---------------------------------------------------------------------------

FLOW_COLUMNS = (
    "start_ms", "end_ms", "value", "sampling", "packets",
    "src_ip", "dst_ip", "src_port", "dst_port", "protocol",
)


def parse_flows(
    raw: DataFrame,
    payload_col: str = "value",
    static_templates: dict | None = None,
) -> DataFrame:
    """Mixed NetFlow v5 / v9 / IPFIX datagram stream → one unified flow
    table (columns :data:`FLOW_COLUMNS`). The version is read per packet:
    v5 datagrams take the all-native expression path, templated versions go
    through the Arrow kernel; each parser sees only its packets (cheap
    2-byte predicate), and the union keeps both branches streaming-safe.
    """
    b = F.col(payload_col)
    version = _be_uint(b, 1, 2)
    v5 = parse_netflow_v5(raw.where(version == 5), payload_col).select(*FLOW_COLUMNS)
    templated = parse_ipfix(
        raw.where(version.isin(9, 10)), payload_col, static_templates
    ).select(*FLOW_COLUMNS)
    return v5.unionByName(templated)
