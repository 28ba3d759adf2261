"""ES ingest-pipeline processors compiled to Catalyst column transforms.

Host-ES surface: reference users front the drift index with ingest
pipelines (the ES `_ingest/pipeline` API — set/rename/convert/... run on
every document before indexing). The relational engine runs the same
processor chain as a SELECT rewrite: each processor is a pure column
expression, the whole pipeline is ONE projection Catalyst folds into the
scan — no UDFs, no Python, column pruning and pushdown intact. At
100 TB an ingest pipeline is exactly a map-stage projection; expressing
it as anything heavier (per-row scripting) would forfeit codegen.

Supported processors (the documented subset — each raises loudly beyond
it, naming the alternative):

- ``set`` — {"field", "value"} literal or {"copy_from": other};
  ``override: false`` keeps an existing non-null value.
- ``rename`` / ``remove`` — column rename / drop.
- ``convert`` — {"type": integer|long|float|double|string|boolean}
  (Spark ANSI casts: a bad value RAISES like ES's convert failure —
  ``ignore_failure: true`` nulls instead via try_cast).
- ``lowercase`` / ``uppercase`` / ``trim`` — string normalizers.
- ``gsub`` — {"pattern", "replacement"} regexp_replace.
- ``split`` — {"separator"} → array column.
- ``join`` — {"separator"} array → string.
- ``date`` — {"formats": [fmt], "target_field"} parse to timestamp
  (first matching format wins; unparsable → null, ES's on_failure-null
  idiom).
- ``json`` — {"field", "target_field", "schema"} parse a JSON string
  column (from_json; the engine needs the schema ES infers from
  mappings).
- ``script`` — the engine's SQL expression dialect via {"lang": "sql"}
  (Painless is out of scope engine-wide, SCOPE §D): {"target_field",
  "source"}.
- ``drop`` — {"if": <SQL predicate>} delete matching docs (ES drop
  processor; the condition dialect is SQL, same stance as `script`).

``if`` conditions on any processor gate it per document
(``F.when(cond, new).otherwise(old)``) — the SQL dialect again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONVERT = {
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}


def run_ingest_pipeline(df: DataFrame, processors: list[dict]) -> DataFrame:
    """Apply an ES ingest-pipeline processor list to a frame."""
    for proc in processors:
        if len(proc) != 1:
            raise ValueError(
                f"each processor must have exactly one type, got {proc!r}"
            )
        (kind, spec), = proc.items()
        cond = F.expr(spec["if"]) if "if" in spec else None

        def _apply(field, new_col):
            """Set ``field``, honoring a per-processor `if` condition."""
            if cond is not None:
                if field in df.columns:
                    return df.withColumn(
                        field, F.when(cond, new_col).otherwise(F.col(field))
                    )
                # new column: no otherwise → typed NULL in new_col's own
                # type (a hardcoded string NULL would coerce a numeric/
                # boolean set/script/convert target to string)
                return df.withColumn(field, F.when(cond, new_col))
            return df.withColumn(field, new_col)

        if kind == "set":
            field = spec["field"]
            new = (
                F.col(spec["copy_from"])
                if "copy_from" in spec
                else F.lit(spec["value"])
            )
            if spec.get("override", True) is False and field in df.columns:
                new = F.coalesce(F.col(field), new)
            df = _apply(field, new)
        elif kind == "rename":
            df = df.withColumnRenamed(spec["field"], spec["target_field"])
        elif kind == "remove":
            fields = spec["field"]
            fields = fields if isinstance(fields, list) else [fields]
            df = df.drop(*fields)
        elif kind == "convert":
            t = _CONVERT.get(spec["type"])
            if t is None:
                raise ValueError(
                    f"convert type {spec['type']!r} unsupported"
                    f" ({sorted(_CONVERT)})"
                )
            src = F.col(spec["field"])
            tgt = spec.get("target_field", spec["field"])
            new = (
                src.try_cast(t)
                if spec.get("ignore_failure")
                else src.cast(t)
            )
            df = _apply(tgt, new)
        elif kind in ("lowercase", "uppercase", "trim"):
            fn = {"lowercase": F.lower, "uppercase": F.upper,
                  "trim": F.trim}[kind]
            tgt = spec.get("target_field", spec["field"])
            df = _apply(tgt, fn(F.col(spec["field"])))
        elif kind == "gsub":
            tgt = spec.get("target_field", spec["field"])
            df = _apply(
                tgt,
                F.regexp_replace(
                    F.col(spec["field"]), spec["pattern"],
                    spec["replacement"],
                ),
            )
        elif kind == "split":
            tgt = spec.get("target_field", spec["field"])
            df = _apply(
                tgt, F.split(F.col(spec["field"]), spec["separator"])
            )
        elif kind == "join":
            tgt = spec.get("target_field", spec["field"])
            df = _apply(
                tgt,
                F.array_join(F.col(spec["field"]), spec["separator"]),
            )
        elif kind == "date":
            tgt = spec.get("target_field", "@timestamp")
            parsed = None
            for fmt in spec["formats"]:
                one = F.try_to_timestamp(
                    F.col(spec["field"]), F.lit(fmt)
                )
                parsed = one if parsed is None else F.coalesce(parsed, one)
            df = _apply(tgt, parsed)
        elif kind == "json":
            from pyspark.sql.types import _parse_datatype_string

            if "schema" not in spec:
                raise ValueError(
                    "json processor needs a schema (ES infers one from"
                    " the index mapping; the engine has no mapping) —"
                    ' e.g. schema: "a INT, b STRING"'
                )
            df = _apply(
                spec.get("target_field", spec["field"]),
                F.from_json(
                    F.col(spec["field"]),
                    _parse_datatype_string(spec["schema"]),
                ),
            )
        elif kind == "script":
            if str(spec.get("lang", "sql")).lower() != "sql":
                raise ValueError(
                    "script processor lang must be 'sql' (the engine's"
                    " expression dialect — Painless is out of scope,"
                    " SCOPE §D)"
                )
            df = _apply(spec["target_field"], F.expr(spec["source"]))
        elif kind == "drop":
            pred = F.expr(spec["if"]) if "if" in spec else F.lit(True)
            df = df.where(~F.coalesce(pred, F.lit(False)))
        else:
            raise ValueError(
                f"unsupported ingest processor {kind!r} (set/rename/"
                "remove/convert/lowercase/uppercase/trim/gsub/split/join/"
                "date/json/script/drop; grok/dissect: pre-extract with"
                " gsub+split or a runtime_mapping expression)"
            )
    return df
