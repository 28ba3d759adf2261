"""Training-set assembly operators: sequence packing and domain mixing —
the last mile of an LLM data pipeline, after dedup/quality/sampling
(north-star extensions alongside :mod:`corpus` / :mod:`dedup`).

**Sequence packing** (:func:`pack_sequences`): batch documents into
fixed-capacity training sequences (next-fit by doc order within each
domain) so short docs share a context window instead of wasting pad
tokens. Next-fit is inherently a sequential scan, so it runs as an
Arrow-batched ``applyInPandas`` per (domain) group — the packing loop
touches one group at a time and the groups pack in parallel. At 100 TB
you sub-shard the group key (``source, pmod(hash(doc_id), k)``) and pack
each shard independently: next-fit quality is unaffected (it never looks
back) and the state per task stays O(1). The DuckDB twin is a recursive
CTE stepping doc-by-doc — same rule, engine-checkable.

**Domain mixing** (:func:`domain_mix`): temperature-flattened sampling
rates per domain (the multilingual/data-mixing rule: p_s ∝ n_s^(1/T),
here T=2 via ``sqrt`` — the one power function IEEE 754 guarantees
correctly rounded, so both engines compute the identical value). All
downstream arithmetic is pure 64-bit integer:

    sq_q_s = floor(sqrt(n_s) · 1e6)          (exact in both engines)
    thr_s  = min(1e6, (1e6 · M · sq_q_s) div (Σ sq_q · n_s))
    keep   ⇔ md5_60(doc_id) mod 1e6 < thr_s

so the sampled set is deterministic, content-stable (ablation-safe,
like :func:`corpus.hash_sample`), and bit-identical across engines.
Map-only over the corpus: the per-domain threshold table is O(#domains)
rows, broadcast-joined; the predicate reaches the scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import HEX15_SQL_FN, md5_hash60
from ..sources.flows import load_table

QUANT = 1_000_000


# --------------------------------------------------------------------------
# sequence packing
# --------------------------------------------------------------------------

def pack_sequences(
    docs: DataFrame,
    capacity: int = 256,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(group, doc_id, n_tokens, seq_no, seq_offset): next-fit packing of
    documents into ``capacity``-token sequences, in ``id_col`` order within
    each ``group_col`` domain.

    Rule: a document joins the current sequence iff it fits in the
    remaining budget; otherwise it opens the next sequence. An empty
    sequence accepts any document (oversized docs get a sequence of their
    own rather than being dropped — truncation is the trainer's call).
    ``seq_offset`` is the token position where the doc starts."""
    cap = int(capacity)
    toks = docs.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_no, used = 0, 0
        seqs, offs = [], []
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if not first and used + n > cap:
                seq_no += 1
                used = 0
            seqs.append(seq_no)
            offs.append(used)
            used += n
            first = False
        pdf["seq_no"] = pd.Series(seqs, dtype="int64")
        pdf["seq_offset"] = pd.Series(offs, dtype="int64")
        return pdf

    out_schema = (
        "group string, doc_id long, n_tokens long, seq_no long, seq_offset long"
    )
    from ..sources.flows import pin_result

    # pin_result (r14): the packing kernel runs reduce-side feeding the
    # final sort; pin so the sampling pass does not re-run it.
    return pin_result(
        toks.groupBy("group").applyInPandas(_pack, schema=out_schema)
    ).orderBy("group", "doc_id")


def pack_sequences_sql(
    capacity: int = 256,
    group_col: str = "source",
    src: str = "documents",
) -> str:
    """Recursive-CTE twin: steps doc-by-doc per group applying the same
    next-fit rule (used + n <= capacity stays; else new sequence; the
    first doc of a group always enters sequence 0)."""
    cap = int(capacity)
    return f"""
WITH RECURSIVE d AS (
  SELECT {group_col} AS grp, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY doc_id) AS rn
  FROM {src}
),
pack AS (
  SELECT grp, doc_id, n, rn, CAST(0 AS BIGINT) AS seq_no, n AS used
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.grp, d.doc_id, d.n, d.rn,
         CASE WHEN p.used + d.n <= {cap} THEN p.seq_no ELSE p.seq_no + 1 END,
         CASE WHEN p.used + d.n <= {cap} THEN p.used + d.n ELSE d.n END
  FROM pack p JOIN d ON d.grp = p.grp AND d.rn = p.rn + 1
)
SELECT grp AS "group", doc_id, n AS n_tokens, seq_no, used - n AS seq_offset
FROM pack ORDER BY "group", doc_id
"""


def pack_sequences_sharded(
    docs: DataFrame,
    capacity: int = 256,
    n_shards: int = 4,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(group, shard, doc_id, n_tokens, seq_no, seq_offset): the hot-domain
    recipe SCALE.md documents, made real — sub-shard the pack key so one
    huge domain parallelizes across ``n_shards`` independent next-fit
    streams instead of serializing into a single Arrow task. Next-fit never
    looks back, so per-shard packing quality is identical; only sequence
    numbering becomes per-(group, shard) — trainers globalize it as
    ``seq_no * n_shards + shard``.

    The shard key is ``md5-hash(doc_id) % n_shards`` — content-independent,
    deterministic, and computable in the DuckDB twin (the same
    ``HEX15_SQL_FN`` discipline as the mix gate)."""
    cap = int(capacity)
    toks = docs.select(
        F.col(group_col).alias("group"),
        F.pmod(md5_hash60(F.col(id_col).cast("string")), F.lit(int(n_shards)))
        .cast("long")
        .alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_no, used = 0, 0
        seqs, offs = [], []
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if not first and used + n > cap:
                seq_no += 1
                used = 0
            seqs.append(seq_no)
            offs.append(used)
            used += n
            first = False
        pdf["seq_no"] = pd.Series(seqs, dtype="int64")
        pdf["seq_offset"] = pd.Series(offs, dtype="int64")
        return pdf

    out_schema = (
        "group string, shard long, doc_id long, n_tokens long, "
        "seq_no long, seq_offset long"
    )
    from ..sources.flows import pin_result

    # pin_result (r14): reduce-side packing kernel feeding the final sort.
    return pin_result(
        toks.groupBy("group", "shard").applyInPandas(_pack, schema=out_schema)
    ).orderBy("group", "shard", "doc_id")


def pack_sequences_sharded_sql(
    capacity: int = 256,
    n_shards: int = 4,
    group_col: str = "source",
    src: str = "documents",
) -> str:
    cap = int(capacity)
    h = HEX15_SQL_FN.format(expr="CAST(doc_id AS VARCHAR)")
    return f"""
WITH RECURSIVE d AS (
  SELECT {group_col} AS grp,
         CAST((({h}) % {int(n_shards)} + {int(n_shards)}) % {int(n_shards)}
              AS BIGINT) AS shard,
         doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY {group_col},
           (({h}) % {int(n_shards)} + {int(n_shards)}) % {int(n_shards)}
           ORDER BY doc_id) AS rn
  FROM {src}
),
pack AS (
  SELECT grp, shard, doc_id, n, rn, CAST(0 AS BIGINT) AS seq_no, n AS used
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.grp, d.shard, d.doc_id, d.n, d.rn,
         CASE WHEN p.used + d.n <= {cap} THEN p.seq_no ELSE p.seq_no + 1 END,
         CASE WHEN p.used + d.n <= {cap} THEN p.used + d.n ELSE d.n END
  FROM pack p JOIN d ON d.grp = p.grp AND d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT grp AS "group", shard, doc_id, n AS n_tokens, seq_no, used - n AS seq_offset
FROM pack ORDER BY "group", shard, doc_id
"""


# --------------------------------------------------------------------------
# document chunking (RAG / embedding prep)
# --------------------------------------------------------------------------

def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_no, n_tokens, chunk_text): sliding-window chunking —
    the standard RAG/embedding prep step. Chunk ``i`` covers tokens
    ``[i·stride, i·stride + chunk_tokens)``; ``stride < chunk_tokens``
    gives overlapping context. The last chunk may be short; chunk starts
    past the end emit nothing, but every doc yields ≥ 1 chunk.

    Map-only: token array materialized once per row, windows produced by
    ``explode(sequence(...))`` + ``slice`` — fan-out = ceil(n/stride),
    zero shuffle (the plan is scan → project → generate)."""
    c, s = int(chunk_tokens), int(stride)
    if not (0 < s <= c):
        raise ValueError(f"need 0 < stride <= chunk_tokens: {s}, {c}")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("__ts")
    )
    return (
        toks.select(
            "doc_id",
            F.explode(F.expr(f"sequence(0, CAST(floor((size(__ts) - 1) / {s}) AS BIGINT))")).alias(
                "chunk_no"
            ),
            "__ts",
        )
        .select(
            "doc_id",
            "chunk_no",
            F.expr(f"slice(__ts, chunk_no * {s} + 1, {c})").alias("__w"),
        )
        .select(
            "doc_id",
            "chunk_no",
            F.size("__w").cast("long").alias("n_tokens"),
            F.array_join("__w", " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_no")
    )


def chunk_documents_sql(
    chunk_tokens: int = 64, stride: int = 48, src: str = "documents"
) -> str:
    c, s = int(chunk_tokens), int(stride)
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM {src}),
w AS (
  SELECT doc_id, i AS chunk_no, ts[(i*{s}+1):(i*{s}+{c})] AS win
  FROM toks, LATERAL unnest(generate_series(
       0, CAST(floor((len(ts) - 1) / {s}) AS BIGINT))) AS t(i)
)
SELECT doc_id, chunk_no, CAST(len(win) AS BIGINT) AS n_tokens,
       array_to_string(win, ' ') AS chunk_text
FROM w ORDER BY doc_id, chunk_no
"""


# --------------------------------------------------------------------------
# domain mixing
# --------------------------------------------------------------------------

def _mix_thresholds(
    docs: DataFrame, target_docs: int, group_col: str,
    temperature: float = 2.0,
    weight_agg=None,
    weight_name: str = "n_docs",
) -> DataFrame:
    """(group, <weight_name>, thr_q): per-domain keep-threshold in 1e-6
    quanta, temperature-flattened toward a ``target_docs`` total — the
    T5/Llama mixing rule ``p_i ∝ n_i^(1/τ)``. τ=1 is proportional (no
    flattening), τ→∞ approaches uniform-per-domain; τ=2 (the default)
    keeps the exact ``sqrt`` path (correctly rounded in both engines —
    bit-parity with the historical twin), other τ use ``pow(n, 1/τ)``.

    ``weight_agg`` generalizes the per-domain weight: the default counts
    docs; :func:`mix_rates_tokens` sums tokens. The threshold product is
    computed in DECIMAL(38,0) — ``1e6 · budget · sq_q`` overflows BIGINT
    as soon as one domain holds ~4e5 weight at a 15k budget, silently
    under Spark's non-ANSI wraparound (the DuckDB twin uses HUGEINT)."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if weight_agg is None:
        weight_agg = F.count(F.lit(1))
    counts = docs.groupBy(F.col(group_col).alias("group")).agg(
        weight_agg.alias(weight_name)
    )
    w = (
        F.sqrt(F.col(weight_name))
        if temperature == 2.0
        else F.pow(F.col(weight_name), F.lit(1.0 / float(temperature)))
    )
    counts = counts.withColumn(
        "sq_q", F.floor(w * F.lit(float(QUANT))).cast("long")
    )
    total = counts.agg(F.sum("sq_q").alias("s_q"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "thr_q",
            F.least(
                F.lit(QUANT).cast("long"),
                F.expr(
                    f"CAST((CAST({QUANT} AS DECIMAL(38,0))"
                    f" * {int(target_docs)} * sq_q)"
                    f" div (CAST(s_q AS DECIMAL(38,0)) * {weight_name})"
                    " AS BIGINT)"
                ),
            ),
        )
        .select("group", weight_name, "thr_q")
    )


def domain_mix(
    docs: DataFrame,
    target_docs: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    temperature: float = 2.0,
) -> DataFrame:
    """(doc_id, group): the temperature-τ mixed sample — deterministic
    hash-gated rows under the per-domain thresholds. Rare domains are
    up-weighted (often to keep-all), head domains down-sampled."""
    thr = _mix_thresholds(docs, target_docs, group_col, temperature)
    h = F.pmod(md5_hash60(F.col(id_col).cast("string")), F.lit(QUANT))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("group"))
        .join(F.broadcast(thr), "group")
        .where(h < F.col("thr_q"))
        .select("doc_id", "group")
        .orderBy("doc_id")
    )


def mix_rates_tokens(
    docs: DataFrame,
    target_tokens: int,
    group_col: str = "source",
    temperature: float = 2.0,
) -> DataFrame:
    """(group, n_tokens, thr_q): token-budget mixing — the form real
    pretraining recipes use (the budget is a TOKEN count, not a doc
    count). Per-domain whitespace-token totals ``T_i`` replace doc
    counts in the same rule: keep-rate_i = min(1, B·w_i / (Σw · T_i))
    with ``w_i = T_i^(1/τ)``, so the EXPECTED kept-token total is the
    budget ``B`` (hash gating stays per-doc — deterministic, join-free
    replay). Delegates to :func:`_mix_thresholds` with a token-sum
    weight, so the quanta/overflow discipline cannot drift from the
    doc-count form."""
    return _mix_thresholds(
        docs, target_tokens, group_col, temperature,
        weight_agg=F.sum(F.size(F.split(F.col("text"), " ")).cast("long")),
        weight_name="n_tokens",
    ).orderBy("group")

def mix_rates_tokens_sql(
    target_tokens: int,
    group_col: str = "source",
    src: str = "documents",
    temperature: float = 2.0,
) -> str:
    w = (
        "SQRT(SUM(len(string_split(text, ' '))))"
        if temperature == 2.0
        else f"POW(SUM(len(string_split(text, ' '))), {1.0 / float(temperature)!r})"
    )
    return f"""
WITH counts AS (
  SELECT {group_col} AS grp,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(FLOOR({w} * {float(QUANT)}) AS BIGINT) AS sq_q
  FROM {src} GROUP BY {group_col}
)
SELECT grp AS "group", n_tokens,
       CAST(LEAST({QUANT}, (CAST({QUANT} AS HUGEINT) * {int(target_tokens)} * sq_q)
             // (CAST((SELECT SUM(sq_q) FROM counts) AS HUGEINT) * n_tokens)) AS BIGINT) AS thr_q
FROM counts ORDER BY "group"
"""


def mix_rates(
    docs: DataFrame, target_docs: int, group_col: str = "source",
    temperature: float = 2.0,
) -> DataFrame:
    """(group, n_docs, thr_q): the planned mixing table itself — what a
    pipeline records next to the run manifest."""
    return _mix_thresholds(
        docs, target_docs, group_col, temperature
    ).orderBy("group")


def _mix_cte(
    target_docs: int, group_col: str, src: str, temperature: float = 2.0
) -> str:
    w = (
        "SQRT(COUNT(*))"
        if temperature == 2.0
        else f"POW(COUNT(*), {1.0 / float(temperature)!r})"
    )
    return f"""
counts AS (
  SELECT {group_col} AS grp, COUNT(*) AS n_docs,
         CAST(FLOOR({w} * {float(QUANT)}) AS BIGINT) AS sq_q
  FROM {src} GROUP BY {group_col}
),
thr AS (
  SELECT grp, n_docs,
         CAST(LEAST({QUANT}, (CAST({QUANT} AS HUGEINT) * {int(target_docs)} * sq_q)
               // (CAST((SELECT SUM(sq_q) FROM counts) AS HUGEINT) * n_docs)) AS BIGINT) AS thr_q
  FROM counts
)"""


def domain_mix_sql(
    target_docs: int, group_col: str = "source", src: str = "documents"
) -> str:
    h = HEX15_SQL_FN.format(expr="CAST(doc_id AS VARCHAR)")
    return f"""
WITH {_mix_cte(target_docs, group_col, src)}
SELECT d.doc_id, d.{group_col} AS "group"
FROM {src} d JOIN thr ON thr.grp = d.{group_col}
WHERE ({h}) % {QUANT} < thr.thr_q
ORDER BY d.doc_id
"""


def mix_rates_sql(
    target_docs: int, group_col: str = "source", src: str = "documents",
    temperature: float = 2.0,
) -> str:
    return f"""
WITH {_mix_cte(target_docs, group_col, src, temperature)}
SELECT grp AS "group", n_docs, thr_q FROM thr ORDER BY "group"
"""


# --------------------------------------------------------------------------
# end-to-end curation pipeline (composition capstone)
# --------------------------------------------------------------------------

def curate_pipeline(
    docs: DataFrame,
    quality_min_q: int = 450_000,
    target_docs: int = 150,
    capacity: int = 256,
) -> DataFrame:
    """The whole curation chain as ONE composed plan: exact dedup (keep
    min doc_id per md5 digest) → quality gate (``text.quality_score`` ≥
    threshold) → temperature-2 domain mixing over the SURVIVORS →
    next-fit sequence packing. Returns the packed training manifest
    (group, doc_id, n_tokens, seq_no, seq_offset).

    This is the operator-composition proof: each stage is the same
    building block exposed individually, and Catalyst fuses the chain —
    dedup's digest groupBy and the quality projection share one scan; the
    mix threshold table is O(#domains) broadcast; only the pack step
    leaves SQL (Arrow next-fit per domain). The DuckDB twin composes the
    same stages as CTEs around the recursive pack."""
    from .text import quality_score

    keep = docs.groupBy(F.md5(F.col("text")).alias("__d")).agg(
        F.min("doc_id").alias("doc_id")
    )
    scored = quality_score(docs).select("doc_id", "score_q")
    surv = (
        docs.join(keep.select("doc_id"), "doc_id")
        .join(scored, "doc_id")
        .where(F.col("score_q") >= int(quality_min_q))
        .select("doc_id", "source", "text")
    )
    thr = _mix_thresholds(surv, target_docs, "source")
    h = F.pmod(md5_hash60(F.col("doc_id").cast("string")), F.lit(QUANT))
    mixed = (
        surv.join(F.broadcast(thr), surv["source"] == thr["group"])
        .where(h < F.col("thr_q"))
        .select("doc_id", "source", "text")
    )
    return pack_sequences(mixed, capacity=capacity)


def curate_pipeline_sql(
    quality_min_q: int = 450_000,
    target_docs: int = 150,
    capacity: int = 256,
    src: str = "documents",
) -> str:
    from .text import quality_sql

    cap = int(capacity)
    h = HEX15_SQL_FN.format(expr="CAST(doc_id AS VARCHAR)")
    return f"""
WITH RECURSIVE
keep AS (SELECT min(doc_id) AS doc_id FROM {src} GROUP BY md5(text)),
scored AS (SELECT doc_id, score_q FROM ({quality_sql()})),
surv AS (
  SELECT d.doc_id, d.source, d.text
  FROM {src} d JOIN keep USING (doc_id) JOIN scored USING (doc_id)
  WHERE scored.score_q >= {int(quality_min_q)}
),
counts AS (
  SELECT source AS grp, COUNT(*) AS n_docs,
         CAST(FLOOR(SQRT(COUNT(*)) * {float(QUANT)}) AS BIGINT) AS sq_q
  FROM surv GROUP BY source
),
thr AS (
  SELECT grp, CAST(LEAST({QUANT}, ({QUANT} * {int(target_docs)} * sq_q)
              // ((SELECT SUM(sq_q) FROM counts) * n_docs)) AS BIGINT) AS thr_q
  FROM counts
),
mixed AS (
  SELECT surv.* FROM surv JOIN thr ON thr.grp = surv.source
  WHERE ({h}) % {QUANT} < thr.thr_q
),
d AS (
  SELECT source AS grp, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM mixed
),
pack AS (
  SELECT grp, doc_id, n, rn, CAST(0 AS BIGINT) AS seq_no, n AS used
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.grp, d.doc_id, d.n, d.rn,
         CASE WHEN p.used + d.n <= {cap} THEN p.seq_no ELSE p.seq_no + 1 END,
         CASE WHEN p.used + d.n <= {cap} THEN p.used + d.n ELSE d.n END
  FROM pack p JOIN d ON d.grp = p.grp AND d.rn = p.rn + 1
)
SELECT grp AS "group", doc_id, n AS n_tokens, seq_no, used - n AS seq_offset
FROM pack ORDER BY "group", doc_id
"""


def curate_pipeline_clf(
    docs: DataFrame,
    clf_min_q: int = 390_000,
    target_docs: int = 150,
    capacity: int = 256,
) -> DataFrame:
    """:func:`curate_pipeline` with the TRAINED gate swapped in: exact
    dedup → ``corpus.quality_clf`` score gate (``clf_q ≥ clf_min_q``) →
    temperature-2 domain mixing → next-fit packing. The heuristic
    ``text.quality_score`` threshold becomes a learned
    looks-like-the-target-domain margin (GPT-3 / CCNet recipe) — the
    rest of the chain is byte-identical composition.

    The classifier trains and scores over the FULL input (labels =
    ``source = 'src0'``), and the gate is applied to the dedup
    survivors via an id join — so the SQL twin composes
    ``quality_clf_sql`` as one subquery CTE and the score table is
    computed once. At real scale ``quality_clf``'s enforced
    ``max_train_docs`` contract applies: train on ``corpus.hash_sample``
    and broadcast the frozen weights; here the registered fixture is
    sample-sized by construction."""
    from .corpus import quality_clf

    keep = docs.groupBy(F.md5(F.col("text")).alias("__d")).agg(
        F.min("doc_id").alias("doc_id")
    )
    scored = quality_clf(docs).select("doc_id", "clf_q")
    surv = (
        docs.join(keep.select("doc_id"), "doc_id")
        .join(scored, "doc_id")
        .where(F.col("clf_q") >= int(clf_min_q))
        .select("doc_id", "source", "text")
    )
    thr = _mix_thresholds(surv, target_docs, "source")
    h = F.pmod(md5_hash60(F.col("doc_id").cast("string")), F.lit(QUANT))
    mixed = (
        surv.join(F.broadcast(thr), surv["source"] == thr["group"])
        .where(h < F.col("thr_q"))
        .select("doc_id", "source", "text")
    )
    return pack_sequences(mixed, capacity=capacity)


def curate_pipeline_clf_sql(
    clf_min_q: int = 390_000,
    target_docs: int = 150,
    capacity: int = 256,
    src: str = "documents",
) -> str:
    from .corpus import quality_clf_sql

    cap = int(capacity)
    h = HEX15_SQL_FN.format(expr="CAST(doc_id AS VARCHAR)")
    return f"""
WITH RECURSIVE
keep AS (SELECT min(doc_id) AS doc_id FROM {src} GROUP BY md5(text)),
scored AS MATERIALIZED (SELECT doc_id, clf_q FROM ({quality_clf_sql(src=src)})),
surv AS (
  SELECT d.doc_id, d.source, d.text
  FROM {src} d JOIN keep USING (doc_id) JOIN scored USING (doc_id)
  WHERE scored.clf_q >= {int(clf_min_q)}
),
counts AS (
  SELECT source AS grp, COUNT(*) AS n_docs,
         CAST(FLOOR(SQRT(COUNT(*)) * {float(QUANT)}) AS BIGINT) AS sq_q
  FROM surv GROUP BY source
),
thr AS (
  SELECT grp, CAST(LEAST({QUANT}, ({QUANT} * {int(target_docs)} * sq_q)
              // ((SELECT SUM(sq_q) FROM counts) * n_docs)) AS BIGINT) AS thr_q
  FROM counts
),
mixed AS (
  SELECT surv.* FROM surv JOIN thr ON thr.grp = surv.source
  WHERE ({h}) % {QUANT} < thr.thr_q
),
d AS (
  SELECT source AS grp, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM mixed
),
pack AS (
  SELECT grp, doc_id, n, rn, CAST(0 AS BIGINT) AS seq_no, n AS used
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.grp, d.doc_id, d.n, d.rn,
         CASE WHEN p.used + d.n <= {cap} THEN p.seq_no ELSE p.seq_no + 1 END,
         CASE WHEN p.used + d.n <= {cap} THEN p.used + d.n ELSE d.n END
  FROM pack p JOIN d ON d.grp = p.grp AND d.rn = p.rn + 1
)
SELECT grp AS "group", doc_id, n AS n_tokens, seq_no, used - n AS seq_offset
FROM pack ORDER BY "group", doc_id
"""


# --------------------------------------------------------------------------
# epoch shard manifest
# --------------------------------------------------------------------------

def epoch_plan(
    docs: DataFrame,
    capacity: int = 256,
    seqs_per_shard: int = 8,
    group_col: str = "source",
) -> DataFrame:
    """(group, shard, n_seqs, n_docs, n_tokens, cum_tokens): the epoch
    manifest a training job consumes — packed sequences grouped into
    fixed-size shards per domain, with running token totals so a trainer
    can seek to any budget point ("resume at 2B tokens") without touching
    the data. Composes :func:`pack_sequences`; the manifest aggregation is
    result-sized (sequences, not docs) and the cumulative window runs per
    domain over shard rows only.
    """
    if seqs_per_shard < 1:
        raise ValueError("seqs_per_shard must be >= 1")
    packed = pack_sequences(docs, capacity=capacity, group_col=group_col)
    shard = (F.col("seq_no") / F.lit(seqs_per_shard)).cast("long").alias("shard")
    per = (
        packed.select("group", shard, "seq_no", "n_tokens")
        .groupBy("group", "shard")
        .agg(
            F.countDistinct("seq_no").alias("n_seqs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
    w = Window.partitionBy("group").orderBy("shard").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .orderBy("group", "shard")
    )


def epoch_plan_sql(
    capacity: int = 256, seqs_per_shard: int = 8
) -> str:
    return f"""
WITH packed AS ({pack_sequences_sql(capacity=capacity)}),
per AS (
  SELECT "group", seq_no // {seqs_per_shard} AS shard,
         COUNT(DISTINCT seq_no) AS n_seqs, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM packed GROUP BY "group", seq_no // {seqs_per_shard}
)
SELECT "group", CAST(shard AS BIGINT) AS shard, CAST(n_seqs AS BIGINT) AS n_seqs,
       CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
       CAST(SUM(n_tokens) OVER (PARTITION BY "group" ORDER BY shard
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
FROM per ORDER BY "group", shard
"""


# --------------------------------------------------------------------------
# train/val/test split assignment
# --------------------------------------------------------------------------

def split_assign(
    docs: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split-v1",
    splits: tuple = (("train", 0.90), ("val", 0.05), ("test", 0.05)),
) -> DataFrame:
    """(doc_id, split): deterministic, content-stable train/val/test
    assignment — ``md5_60(salt || '#' || id) mod 1e6`` against cumulative
    split thresholds. Properties a training pipeline needs:

    - reproducible on any engine at any parallelism (no RNG state);
    - stable under corpus growth: a doc's split never changes when other
      docs are added/removed (hash depends only on the doc id + salt);
    - re-splittable: changing ``salt`` draws an independent assignment
      (for cross-validation folds use ``salt=f"fold-{k}"``);
    - leak-auditable: membership is a pure function, so "which split was
      this doc in" is answerable later without storing the split table.

    Map-only, zero shuffle (the ``orderBy`` is the serving edge); the
    predicate evaluates in the scan projection at any scale. Splits must
    sum to 1 (validated) — the last split absorbs the rounding residue.
    """
    total = sum(r for _, r in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split rates must sum to 1, got {total}")
    h = F.pmod(
        md5_hash60(F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(QUANT),
    )
    acc = 0.0
    expr = None
    for name, rate in splits[:-1]:
        acc += rate
        cond = h < F.lit(int(round(acc * QUANT)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return docs.select(F.col(id_col), expr.alias("split")).orderBy(id_col)


def split_assign_sql(
    salt: str = "split-v1",
    splits: tuple = (("train", 0.90), ("val", 0.05), ("test", 0.05)),
) -> str:
    h = HEX15_SQL_FN.format(expr=f"'{salt}' || '#' || CAST(doc_id AS VARCHAR)")
    acc = 0.0
    whens = []
    for name, rate in splits[:-1]:
        acc += rate
        whens.append(f"WHEN ({h}) % {QUANT} < {int(round(acc * QUANT))} THEN '{name}'")
    return f"""
SELECT doc_id, CASE {' '.join(whens)} ELSE '{splits[-1][0]}' END AS split
FROM documents ORDER BY doc_id
"""


def pack_sequences_bfd(
    docs: DataFrame,
    capacity: int = 256,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(group, doc_id, n_tokens, seq_no, seq_offset): best-fit-decreasing
    packing — the quality counterpart to :func:`pack_sequences`'s next-fit:
    docs place largest-first into the open sequence with the LEAST
    remaining room that still fits (11/9·OPT+ worst case vs next-fit's
    2·OPT), buying fewer pad tokens at the cost of losing next-fit's
    stream-append property (BFD must see the whole group; next-fit never
    looks back — that is why next-fit remains the incremental default).

    Same Arrow per-group kernel shape as next-fit. The bin state is a
    list, but DuckDB's LIST-typed recursive CTEs can carry it, so the
    deterministic fold IS oracle-paired (:func:`pack_sequences_bfd_sql`
    replays the same largest-first best-fit rule step by step); pytest
    additionally pins the packing invariants (capacity respected, no doc
    lost, never more sequences than next-fit on the fixtures, >= the
    ceil(total/capacity) lower bound).
    """
    cap = int(capacity)
    toks = docs.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        used: list[int] = []
        seqs, offs = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            best, best_rem = -1, None
            for i, u in enumerate(used):
                rem = cap - u - n
                if rem >= 0 and (best_rem is None or rem < best_rem):
                    best, best_rem = i, rem
            if best < 0:
                used.append(0)
                best = len(used) - 1
            seqs.append(best)
            offs.append(used[best])
            used[best] += n
        pdf["seq_no"] = pd.Series(seqs, dtype="int64")
        pdf["seq_offset"] = pd.Series(offs, dtype="int64")
        return pdf

    out_schema = (
        "group string, doc_id long, n_tokens long, seq_no long, seq_offset long"
    )
    from ..sources.flows import pin_result

    # pin_result (r14): the packing kernel runs reduce-side feeding the
    # final sort; pin so the sampling pass does not re-run it.
    return pin_result(
        toks.groupBy("group").applyInPandas(_pack, schema=out_schema)
    ).orderBy("group", "doc_id")


def pack_sequences_bfd_sql(
    capacity: int = 256,
    group_col: str = "source",
    src: str = "documents",
) -> str:
    """DuckDB twin of :func:`pack_sequences_bfd`: the recursive CTE carries
    the open-bin load vector as a LIST column and replays the exact
    largest-first best-fit rule per step — rems = cap - used - n over the
    list, the winner is the FIRST index attaining the minimal non-negative
    remainder (``list_position`` returns the first occurrence, matching
    the kernel's strict `<` scan), else a new bin is appended."""
    cap = int(capacity)
    return f"""
WITH RECURSIVE d AS (
  SELECT {group_col} AS grp, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY {group_col}
                            ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS rn
  FROM {src}
),
pack AS (
  SELECT grp, doc_id, n, rn, CAST(0 AS BIGINT) AS seq_no,
         CAST(0 AS BIGINT) AS seq_offset, [n] AS used
  FROM d WHERE rn = 1
  UNION ALL
  SELECT s.grp, s.doc_id, s.n, s.rn,
         CASE WHEN s.best_rem IS NULL THEN CAST(len(s.used) AS BIGINT)
              ELSE CAST(s.best_idx - 1 AS BIGINT) END,
         CASE WHEN s.best_rem IS NULL THEN CAST(0 AS BIGINT)
              ELSE s.used[s.best_idx] END,
         CASE WHEN s.best_rem IS NULL THEN list_append(s.used, s.n)
              ELSE list_transform(s.used,
                   (x, i) -> CASE WHEN i = s.best_idx THEN x + s.n ELSE x END)
         END
  FROM (
    SELECT p.used, d.grp, d.doc_id, d.n, d.rn,
           list_aggregate(list_filter(
               list_transform(p.used, u -> {cap} - u - d.n),
               x -> x >= 0), 'min') AS best_rem,
           list_position(
               list_transform(p.used, u -> {cap} - u - d.n),
               list_aggregate(list_filter(
                   list_transform(p.used, u -> {cap} - u - d.n),
                   x -> x >= 0), 'min')) AS best_idx
    FROM pack p JOIN d ON d.grp = p.grp AND d.rn = p.rn + 1
  ) s
)
SELECT grp AS "group", doc_id, n AS n_tokens, seq_no, seq_offset
FROM pack ORDER BY "group", doc_id
"""


def shard_by_tokens(
    docs: DataFrame, n_shards: int = 4, text_col: str = "text"
) -> DataFrame:
    """(shard, n_docs, tokens, doc_ids_fp): token-balanced shard
    assignment — training shards must equalize TOKEN budgets, not doc
    counts (doc lengths are Zipf-ish, so count-balanced shards can be
    badly token-skewed). Rule: rank docs by token count desc (doc_id
    tie-break) and deal them round-robin — a deterministic, SQL-pairable
    stand-in for greedy lightest-bin assignment whose imbalance is
    bounded by one maximal document per lap.

    Output is the per-shard manifest (doc/token totals + an order-free
    md5-XOR fingerprint of the member ids, so two engines prove identical
    MEMBERSHIP, not just identical totals).

    Scale: the global rank is VALUE-partitioned, not task-partitioned —
    rank(doc) = (count of docs with strictly more tokens) + (row_number
    among same-count docs by doc_id). The per-value count table is tiny
    (distinct token counts ≪ corpus; its running-sum window is over that
    result-sized table) and broadcasts back; the per-value row_number
    windows partition by ``n_tokens`` (bounded by the largest
    equal-length cohort). No single-partition window over the corpus, and
    — unlike a ``repartitionByRange`` + ``spark_partition_id`` two-pass —
    no dependence on sampled range boundaries being identical across two
    evaluations of the same exchange (RangePartitioner samples, and
    recomputation under AQE/stage-retry may resample), so ranks are
    deterministic by construction.
    """
    toks = docs.select(
        F.col("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    cnts = toks.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("_cnt"))
    offsets = cnts.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy(F.col("n_tokens").desc()).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("n_tokens", "_offset")
    within = Window.partitionBy("n_tokens").orderBy("doc_id")
    ranked = (
        toks.join(F.broadcast(offsets), "n_tokens")
        .withColumn(
            "shard",
            F.pmod(
                F.col("_offset") + F.row_number().over(within) - 1,
                F.lit(int(n_shards)),
            ).cast("long"),
        )
    )
    return (
        ranked
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
            # XOR-fold of member-id hashes: order-free exact membership proof
            F.expr(
                "aggregate(collect_list("
                + "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
                + "), CAST(0 AS BIGINT), (a, x) -> a ^ x)"
            ).alias("doc_ids_fp"),
        )
        .orderBy("shard")
    )


def shard_by_tokens_sql(n_shards: int = 4) -> str:
    h = HEX15_SQL_FN.format(expr="CAST(doc_id AS VARCHAR)")
    return f"""
WITH ranked AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST((ROW_NUMBER() OVER (ORDER BY len(string_split(text, ' ')) DESC,
                                  doc_id) - 1) % {int(n_shards)} AS BIGINT) AS shard
  FROM documents
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
       CAST(bit_xor({h}) AS BIGINT) AS doc_ids_fp
FROM ranked GROUP BY shard ORDER BY shard
"""


def span_corruption(
    docs: DataFrame,
    block: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "t5-v1",
    span_min: int = 2,
    span_max: int = 4,
) -> DataFrame:
    """(doc_id, n_tokens, n_spans, n_masked, masked_fp): T5/UL2-style span
    corruption PLAN — which token positions each document masks — fully
    deterministic and content-stable, so the denoising objective is
    reproducible across pipeline reruns and engines.

    Rule (the SQL-pairable reformulation of iid span sampling): tokens
    partition into fixed blocks of ``block``; block ``b`` of doc ``d``
    draws one span from ``md5(salt#d#b)`` — length 2–4 (mean 3, i.e.
    ~15% noise at the default block of 20, the T5 operating point),
    start uniform over the feasible offsets; ``span_min``/``span_max``
    parameterize the denoiser family — the default is T5's R-denoiser
    operating point (~15% noise, mean span 3); UL2's X-denoiser is e.g.
    ``block=8, span_min=3, span_max=6`` (~55% noise, long spans) and its
    S-denoiser degenerates to one big block. No sequential dependency
    between blocks ⇒ one map-side explode + one aggregation, and the
    identical arithmetic runs in the DuckDB twin. ``masked_fp`` is the
    order-free XOR of per-masked-position hashes — exact MEMBERSHIP
    proof of the mask set, not just its size (the shard_by_tokens
    fingerprint discipline). Trailing partial blocks clip naturally
    (positions past n don't exist); a doc too short to mask fingerprints
    as 0.

    :func:`span_corruption_text` materializes the actual
    ``<extra_id_k>`` inputs/targets from the same rule (pytest-pinned;
    string assembly has no clean SQL twin, the plan columns here are the
    oracle-gated contract).
    """
    b, smin, smax = int(block), int(span_min), int(span_max)
    if not 1 <= smin <= smax < b:
        raise ValueError(f"need 1 <= span_min <= span_max < block, got {smin}/{smax}/{b}")
    n = F.size(F.split(F.col(text_col), " "))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.sequence(F.lit(0), n - 1)).alias("pos"),
    )
    blk = (F.col("pos") / b).cast("long")
    hb = md5_hash60(
        F.concat_ws("#", F.lit(salt), F.col("doc_id").cast("string"),
                    blk.cast("string"))
    )
    span_len = F.pmod(hb, F.lit(smax - smin + 1)) + smin
    start = F.pmod(F.shiftright(hb, 8), F.lit(b) - span_len + 1)
    off = F.pmod(F.col("pos"), F.lit(b))
    masked = (off >= start) & (off < start + span_len)
    hi = md5_hash60(
        F.concat_ws("#", F.col("doc_id").cast("string"),
                    F.col("pos").cast("string"))
    )
    return (
        base.select("doc_id", blk.alias("blk"), masked.alias("m"), hi.alias("hi"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct(F.when(F.col("m"), F.col("blk")))
            .cast("long").alias("n_spans"),
            F.sum(F.when(F.col("m"), 1).otherwise(0))
            .cast("long").alias("n_masked"),
            F.coalesce(
                F.expr("bit_xor(CASE WHEN m THEN hi END)"), F.lit(0)
            ).cast("long").alias("masked_fp"),
        )
        .orderBy("doc_id")
    )


def span_corruption_sql(
    block: int = 20, salt: str = "t5-v1", span_min: int = 2, span_max: int = 4
) -> str:
    b, smin, w = int(block), int(span_min), int(span_max) - int(span_min) + 1
    hb = HEX15_SQL_FN.format(
        expr=f"'{salt}' || '#' || CAST(doc_id AS VARCHAR) || '#' ||"
             " CAST(blk AS VARCHAR)"
    )
    hi = HEX15_SQL_FN.format(
        expr="CAST(doc_id AS VARCHAR) || '#' || CAST(pos AS VARCHAR)"
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(range(0, len(string_split(text, ' ')))) AS pos
  FROM documents
),
flagged AS (
  SELECT doc_id, pos, blk,
         (pos % {b}) >= start AND (pos % {b}) < start + span_len AS m
  FROM (
    SELECT doc_id, pos, blk,
           hv % {w} + {smin} AS span_len,
           (hv >> 8) % ({b} - (hv % {w} + {smin}) + 1) AS start
    FROM (SELECT doc_id, pos, pos // {b} AS blk, {hb} AS hv FROM toks)
  )
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT CASE WHEN m THEN blk END) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       CAST(COALESCE(bit_xor(CASE WHEN m THEN {hi} END), 0) AS BIGINT)
         AS masked_fp
FROM flagged GROUP BY doc_id ORDER BY doc_id
"""


def span_corruption_text(
    docs: DataFrame,
    block: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "t5-v1",
    span_min: int = 2,
    span_max: int = 4,
) -> DataFrame:
    """(doc_id, inputs, targets): the materialized T5 denoising pair —
    masked spans replaced by ``<extra_id_k>`` sentinels in ``inputs``,
    and ``targets`` = the sentinel-delimited masked spans (the exact T5
    target format, ending with the final sentinel). Same mask rule as
    :func:`span_corruption` (the Python kernel reproduces the md5
    arithmetic bit-for-bit; pytest pins the two agree). Arrow map-only."""
    import hashlib

    b, smin, w = int(block), int(span_min), int(span_max) - int(span_min) + 1

    def _mask_plan(doc_id: int, n: int):
        out = []
        for blk in range((n + b - 1) // b):
            hv = int(
                hashlib.md5(f"{salt}#{doc_id}#{blk}".encode()).hexdigest()[:15],
                16,
            )
            ln = hv % w + smin
            st = (hv >> 8) % (b - ln + 1)
            out.append((blk * b + st, ln))
        return out

    def fn(batches):
        for pdf in batches:
            inputs, targets = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = str(text).split(" ")
                n = len(toks)
                masked = [False] * n
                for st, ln in _mask_plan(int(doc_id), n):
                    for i in range(st, min(st + ln, n)):
                        masked[i] = True
                inp, tgt, k, i = [], [], 0, 0
                while i < n:
                    if masked[i]:
                        inp.append(f"<extra_id_{k}>")
                        tgt.append(f"<extra_id_{k}>")
                        while i < n and masked[i]:
                            tgt.append(toks[i])
                            i += 1
                        k += 1
                    else:
                        inp.append(toks[i])
                        i += 1
                tgt.append(f"<extra_id_{k}>")
                inputs.append(" ".join(inp))
                targets.append(" ".join(tgt))
            out = pdf[[id_col]].copy()
            out.columns = ["doc_id"]
            out["inputs"] = inputs
            out["targets"] = targets
            yield out

    return docs.mapInPandas(
        fn, "doc_id long, inputs string, targets string"
    ).orderBy("doc_id")


def negative_samples(
    docs: DataFrame, k: int = 4, n_buckets: int = 32, salt: str = "neg-v1"
) -> DataFrame:
    """(doc_id, neg_rank, neg_id): deterministic negative sampling for
    contrastive objectives — each document draws up to ``k`` negatives by
    rendezvous hashing: documents bucket by a salted md5, each bucket
    elects its min-id representative, and doc ``d``'s i-th negative is the
    representative of bucket ``(h(d) + i) mod n_buckets``. Content-stable
    (adding documents only perturbs the buckets they land in), salt-
    redrawable, and bit-identical across engines/runs — the property that
    makes contrastive pairs reproducible across pipeline reruns.

    Scale: one bucket-rep aggregation (``n_buckets`` output rows,
    broadcast) + a map-side k-explode and equi-join — the corpus is never
    self-joined. Emits up to ``k`` rows per doc: an empty bucket or a
    self-draw yields no row (documented, not padded).
    """
    b = F.pmod(
        md5_hash60(F.concat(F.lit(salt + "#"), F.col("doc_id").cast("string"))),
        F.lit(int(n_buckets)),
    )
    reps = (
        docs.select(b.alias("bucket"), "doc_id")
        .groupBy("bucket")
        .agg(F.min("doc_id").alias("neg_id"))
    )
    spine = docs.select("doc_id", b.alias("hb")).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("neg_rank"),
        "hb",
    ).select(
        "doc_id",
        F.col("neg_rank").cast("long").alias("neg_rank"),
        F.pmod(F.col("hb") + F.col("neg_rank"), F.lit(int(n_buckets))).alias("bucket"),
    )
    return (
        spine.join(F.broadcast(reps), "bucket")
        .where(F.col("neg_id") != F.col("doc_id"))
        .select("doc_id", "neg_rank", "neg_id")
        .orderBy("doc_id", "neg_rank")
    )


def negative_samples_sql(
    k: int = 4, n_buckets: int = 32, salt: str = "neg-v1"
) -> str:
    h = HEX15_SQL_FN.format(expr=f"'{salt}#' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH hashed AS (
  SELECT doc_id, CAST(({h}) % {int(n_buckets)} AS BIGINT) AS hb FROM documents
),
reps AS (SELECT hb AS bucket, MIN(doc_id) AS neg_id FROM hashed GROUP BY hb),
spine AS (
  SELECT doc_id, CAST(i AS BIGINT) AS neg_rank,
         (hb + i) % {int(n_buckets)} AS bucket
  FROM hashed, (SELECT unnest(range(1, {int(k) + 1})) AS i)
)
SELECT s.doc_id, s.neg_rank, r.neg_id
FROM spine s JOIN reps r USING (bucket)
WHERE r.neg_id <> s.doc_id
ORDER BY s.doc_id, s.neg_rank
"""


def curriculum_order(docs: DataFrame, salt: str = "curr-v1") -> DataFrame:
    """(stage, doc_id, score_q, shuf_q): curriculum staging — quality-score
    quartile bins (stage 1 = best quarter first, the easy→hard ordering
    curriculum-training recipes feed the data loader) plus a deterministic
    salted-hash intra-stage shuffle key. Sorting the output by
    ``(stage, shuf_q, doc_id)`` IS the epoch order; changing ``salt``
    reshuffles within stages without touching stage assignment
    (ablation-safe, like :func:`corpus.hash_sample`).

    Scale: stages come from VALUE thresholds (the three exact quartiles of
    the score distribution — an O(1)-row aggregate, broadcast), not from an
    equal-count NTILE, so assignment is map-only: no corpus-wide window, no
    single-partition sort. The final orderBy is a distributed range sort.
    At 100 TB the exact percentile swaps for ``percentile_approx`` exactly
    as :func:`stats.value_quantiles_approx` documents.
    """
    from .text import quality_score

    scored = quality_score(docs).select("doc_id", "score_q")
    thr = scored.agg(F.expr("percentile(score_q, array(0.75, 0.5, 0.25))").alias("t"))
    shuf = md5_hash60(
        F.concat(F.lit(salt + "#"), F.col("doc_id").cast("string"))
    ) % F.lit(1_000_000)
    return (
        scored.crossJoin(F.broadcast(thr))
        .select(
            F.when(F.col("score_q") >= F.col("t")[0], 1)
            .when(F.col("score_q") >= F.col("t")[1], 2)
            .when(F.col("score_q") >= F.col("t")[2], 3)
            .otherwise(4)
            .cast("long")
            .alias("stage"),
            "doc_id",
            "score_q",
            shuf.cast("long").alias("shuf_q"),
        )
        .orderBy("stage", "shuf_q", "doc_id")
    )


def curriculum_sql(quality_inner: str, salt: str = "curr-v1") -> str:
    h = HEX15_SQL_FN.format(expr=f"'{salt}#' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH scored AS (SELECT doc_id, score_q FROM ({quality_inner})),
thr AS (SELECT quantile_cont(score_q, [0.75, 0.5, 0.25]) AS t FROM scored)
SELECT CAST(CASE WHEN score_q >= t[1] THEN 1
                 WHEN score_q >= t[2] THEN 2
                 WHEN score_q >= t[3] THEN 3
                 ELSE 4 END AS BIGINT) AS stage,
       doc_id, score_q,
       CAST(({h}) % 1000000 AS BIGINT) AS shuf_q
FROM scored, thr ORDER BY stage, shuf_q, doc_id
"""


# --------------------------------------------------------------------------
# driver-contract registry
# --------------------------------------------------------------------------

def hard_negatives(
    emb: DataFrame,
    anchor_pred: str = "vec_id % 100 = 0",
    k: int = 5,
    id_col: str = "vec_id",
    label_col: str = "label",
    max_pairs: int = 50_000_000,
) -> DataFrame:
    """(anchor_id, neg_id, score_q, rank): contrastive hard-negative
    mining — for each anchor, the ``k`` most cosine-similar corpus
    vectors with a DIFFERENT label (the near-miss negatives a
    contrastive/embedding trainer wants next to each positive).

    Scale design: the anchor batch is broadcast (mining runs in
    bounded batches — the anchor side is the mini-batch, never the
    corpus), the corpus scans ONCE, scores quantize to integer 1e-6 and
    rank with a per-anchor window (anchor-batch-sized state). Like
    :func:`~.similarity.cosine_topk`, the pair count is guarded up
    front: all-pairs mining on an unbounded corpus raises naming the
    IVF route (mine within probed cells via
    ``similarity.ivf_topk`` + a label filter) rather than silently
    launching a 100 TB cross product.
    """
    from .similarity import MAX_BRUTE_PAIRS  # noqa: F401  (same class)
    from ..functions.vectors import dot, l2_norm

    anchors = emb.where(anchor_pred)
    n_a, n_c = anchors.count(), emb.count()
    if n_a * n_c > max_pairs:
        raise ValueError(
            f"hard_negatives would score {n_a} x {n_c} pairs"
            f" (> max_pairs={max_pairs}); mine in smaller anchor"
            " batches, or pre-prune candidates with similarity.ivf_topk"
            " and filter labels on the probed cells"
        )

    def _v(col):
        return F.transform(F.col(col), lambda x: x.cast("double"))

    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("__alabel"),
        _v("embedding").alias("av"),
    ).withColumn("an", l2_norm(F.col("av")))
    c = emb.select(
        F.col(id_col).alias("neg_id"),
        F.col(label_col).alias("__clabel"),
        _v("embedding").alias("cv"),
    ).withColumn("cn", l2_norm(F.col("cv")))
    score = dot(F.col("av"), F.col("cv")) / (F.col("an") * F.col("cn"))
    pairs = (
        c.join(
            F.broadcast(a),
            (F.col("anchor_id") != F.col("neg_id"))
            & (F.col("__alabel") != F.col("__clabel")),
        )
        .select(
            "anchor_id",
            "neg_id",
            F.floor(score * F.lit(1e6)).cast("long").alias("score_q"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("score_q").desc(), F.col("neg_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("anchor_id", "rank")
    )


HARD_NEGATIVES_SQL = """
WITH a AS (
  SELECT vec_id AS anchor_id, label AS alabel,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS av
  FROM embeddings WHERE vec_id % 100 = 0
),
c AS (
  SELECT vec_id AS neg_id, label AS clabel,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
),
pairs AS (
  SELECT a.anchor_id, c.neg_id,
         CAST(FLOOR(
           list_dot_product(a.av, c.cv)
           / (sqrt(list_dot_product(a.av, a.av))
              * sqrt(list_dot_product(c.cv, c.cv))) * 1e6) AS BIGINT)
           AS score_q
  FROM c JOIN a ON a.anchor_id != c.neg_id AND a.alabel != c.clabel
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                               ORDER BY score_q DESC, neg_id ASC) AS rank
  FROM pairs
)
SELECT anchor_id, neg_id, score_q, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5 ORDER BY anchor_id, rank
"""


def queries() -> dict:
    return {
        "train_pack_sequences": lambda s, d: pack_sequences(
            load_table(s, d, "documents"), capacity=256
        ),
        "train_pack_sharded": lambda s, d: pack_sequences_sharded(
            load_table(s, d, "documents"), capacity=256, n_shards=4
        ),
        "train_domain_mix": lambda s, d: domain_mix(
            load_table(s, d, "documents"), target_docs=250
        ),
        "train_mix_tokens": lambda s, d: mix_rates_tokens(
            load_table(s, d, "documents"), target_tokens=15_000
        ),
        "train_mix_rates_t4": lambda s, d: mix_rates(
            load_table(s, d, "documents"), target_docs=250, temperature=4.0
        ),
        "train_mix_rates": lambda s, d: mix_rates(
            load_table(s, d, "documents"), target_docs=250
        ),
        "train_chunk_docs": lambda s, d: chunk_documents(
            load_table(s, d, "documents"), chunk_tokens=64, stride=48
        ),
        "train_curate_pipeline": lambda s, d: curate_pipeline(
            load_table(s, d, "documents")
        ),
        # the same chain gated by the in-engine TRAINED classifier
        "train_hard_negatives": lambda s, d: hard_negatives(
            load_table(s, d, "embeddings")
        ),
        "train_curate_clf": lambda s, d: curate_pipeline_clf(
            load_table(s, d, "documents")
        ),
        "train_split_assign": lambda s, d: split_assign(
            load_table(s, d, "documents")
        ),
        "train_epoch_plan": lambda s, d: epoch_plan(
            load_table(s, d, "documents"), capacity=256, seqs_per_shard=8
        ),
        "train_curriculum": lambda s, d: curriculum_order(
            load_table(s, d, "documents")
        ),
        # list-valued bin state, carried by a LIST-typed recursive CTE =>
        # oracle-paired (pack_sequences_bfd_sql)
        "train_pack_bfd": lambda s, d: pack_sequences_bfd(
            load_table(s, d, "documents"), capacity=256
        ),
        "train_neg_samples": lambda s, d: negative_samples(
            load_table(s, d, "documents")
        ),
        # T5/UL2 denoising: the deterministic span-corruption PLAN
        # (membership-fingerprinted mask sets; the materialized
        # <extra_id_k> pair is pytest-pinned via span_corruption_text)
        "train_span_corruption": lambda s, d: span_corruption(
            load_table(s, d, "documents")
        ),
        # UL2 X-denoiser operating point: short blocks, long spans (~55%
        # noise) — same plan machinery, different severity
        "train_span_ul2x": lambda s, d: span_corruption(
            load_table(s, d, "documents"), block=8, span_min=3, span_max=6,
            salt="ul2x-v1",
        ),
        "train_shard_by_tokens": lambda s, d: shard_by_tokens(
            load_table(s, d, "documents")
        ),
    }


def oracle_sql() -> dict:
    return {
        "train_pack_sequences": pack_sequences_sql(capacity=256),
        "train_pack_bfd": pack_sequences_bfd_sql(capacity=256),
        "train_pack_sharded": pack_sequences_sharded_sql(capacity=256, n_shards=4),
        "train_domain_mix": domain_mix_sql(target_docs=250),
        "train_mix_rates": mix_rates_sql(target_docs=250),
        "train_mix_rates_t4": mix_rates_sql(target_docs=250, temperature=4.0),
        "train_mix_tokens": mix_rates_tokens_sql(target_tokens=15_000),
        "train_chunk_docs": chunk_documents_sql(chunk_tokens=64, stride=48),
        "train_curate_pipeline": curate_pipeline_sql(),
        "train_hard_negatives": HARD_NEGATIVES_SQL,
        "train_curate_clf": curate_pipeline_clf_sql(),
        "train_split_assign": split_assign_sql(),
        "train_epoch_plan": epoch_plan_sql(capacity=256, seqs_per_shard=8),
        "train_curriculum": _curriculum_oracle(),
        "train_neg_samples": negative_samples_sql(),
        "train_span_corruption": span_corruption_sql(),
        "train_span_ul2x": span_corruption_sql(
            block=8, span_min=3, span_max=6, salt="ul2x-v1"
        ),
        "train_shard_by_tokens": shard_by_tokens_sql(),
    }


def _curriculum_oracle() -> str:
    from .text import quality_sql

    return curriculum_sql(quality_sql())
