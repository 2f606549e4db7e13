"""Stage B — deterministic mention/triple extraction (SURVEY.md §2.10 X1).

The reference sends each whole document to an LLM and parses a
structured ``PaperSchema`` back (reference extract.py:48-60,
core.py:5-34). Our engine replaces that with a deterministic grammar
(ontology.py) and provides TWO interchangeable execution engines:

- ``engine="arrow"`` (default, per BASELINE.json input_hint:
  "vectorized pandas/Arrow UDF stages ... no per-row Python"):
  ``mapInPandas`` over Arrow batches; all parsing via vectorized
  ``Series.str.extractall`` — one regex pass per batch, no Python
  loop over rows.
- ``engine="sql"``: pure JVM column expressions
  (``split``/``posexplode``/``regexp_extract_all``/``arrays_zip``) —
  zero Python crossing, fully inside WholeStageCodegen. Used as the
  performance alternative; tests assert both engines agree exactly.

Output tables: ``triples_raw`` (conv_id, chain_id, chain_title,
edge_idx, subj, pred, obj, description, edge_confidence) — the
exploded analog of ``PaperSchema.logical_chains[].edges[]`` with W2
intra-chain order preserved via ``edge_idx`` — and ``nodes_raw``
(the analog of ``PaperSchema.nodes``).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ontology import (
    CONFIDENCE_WORDS,
    EDGE_PHRASES,
    LIFECYCLE_WORDS,
    MATURITY_WORDS,
)
from ..schemas import MENTIONS, NODES_RAW, TRIPLES_RAW

# ---- grammar regexes (co-designed with datagen via ontology templates) ----
_PHRASE_ALT = "|".join(
    re.escape(p) for p in sorted(EDGE_PHRASES, key=len, reverse=True)
)
_CONF_ALT = "|".join(
    re.escape(w) for w in sorted(CONFIDENCE_WORDS, key=len, reverse=True)
)
_LIFE_ALT = "|".join(re.escape(w) for w in sorted(LIFECYCLE_WORDS, key=len, reverse=True))
_MAT_ALT = "|".join(re.escape(w) for w in sorted(MATURITY_WORDS, key=len, reverse=True))

EDGE_RE = (
    r"Evidence shows that \[([^\]]*)\] (" + _PHRASE_ALT + r") \[([^\]]*)\]"
    r" with (" + _CONF_ALT + r") confidence because ([^.]*)\."
)
CHAIN_RE = r"Logical chain <([^>]*)> proceeds as follows\."
CONCEPT_RE = (
    r"Concept \[([^\]]*)\] \(category: ([^;)]*); aka: ([^)]*)\)"
    r" is defined as ([^.]*)\."
)
INTERVENTION_RE = (
    r"Intervention \[([^\]]*)\] \(lifecycle: (" + _LIFE_ALT + r");"
    r" maturity: (" + _MAT_ALT + r"); aka: ([^)]*)\) is defined as ([^.]*)\."
)
MENTION_RE = r"\[([^\]]*)\]"


def _split_aliases(s: pd.Series) -> pd.Series:
    """Vectorized alias split: '.str.split' for the whole batch; the
    rare degenerate rows ('none' marker, empty fragments from adjacent
    separators) are patched by mask, so the hot path has no per-row
    lambda (input_hint: "no per-row Python")."""
    out = s.str.split(" / ")
    none_mask = s.eq("none")
    if none_mask.any():
        out.loc[none_mask] = pd.Series(
            [[]] * int(none_mask.sum()), index=out.index[none_mask]
        )
    dirty = ~none_mask & (
        s.eq("")
        | s.str.startswith(" / ")
        | s.str.endswith(" / ")
        | s.str.contains(" /  / ", regex=False)
    )
    if dirty.any():
        out.loc[dirty] = out.loc[dirty].map(lambda xs: [x for x in xs if x])
    return out


# =========================== arrow engine ===================================

def _triples_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # Combined alternation: chain markers and edges extracted in one
    # extractall pass so textual interleaving (match order) assigns
    # edges to chains — no per-row Python.
    combined = f"(?:{CHAIN_RE})|(?:{EDGE_RE})"
    cols = ["chain_title_m", "subj", "phrase", "conf_word", "description"]
    for pdf in batches:
        if len(pdf) == 0:
            continue
        m = pdf["doc_text"].str.extractall(combined)
        m.columns = ["chain_title_m", "subj", "phrase", "obj", "conf_word", "description"]
        if len(m) == 0:
            continue
        m = m.reset_index().rename(columns={"level_0": "row"})
        is_chain = m["chain_title_m"].notna()
        m["chain_id"] = is_chain.groupby(m["row"]).cumsum().astype("int32") - 1
        m["chain_title"] = m["chain_title_m"].groupby(m["row"]).ffill()
        # edges before any chain marker are malformed per PaperSchema
        # (edges exist only inside logical_chains, reference
        # core.py:25-34) — dropped, matching the sql engine
        edges = m[~is_chain & (m["chain_id"] >= 0)].copy()
        if len(edges) == 0:
            continue
        edges["edge_idx"] = edges.groupby(["row", "chain_id"]).cumcount().astype("int32")
        edges["conv_id"] = pdf["conv_id"].iloc[edges["row"].to_numpy()].to_numpy()
        edges["pred"] = edges["phrase"].map(EDGE_PHRASES)
        edges["edge_confidence"] = (
            edges["conf_word"].map(CONFIDENCE_WORDS).astype("int32")
        )
        yield edges[[
            "conv_id", "chain_id", "chain_title", "edge_idx",
            "subj", "pred", "obj", "description", "edge_confidence",
        ]]


def _nodes_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        out = []
        c = pdf["doc_text"].str.extractall(CONCEPT_RE)
        if len(c):
            c.columns = ["name", "concept_category", "aka", "description"]
            c = c.reset_index().rename(columns={"level_0": "row"})
            c["type"] = "concept"
            c["intervention_lifecycle"] = pd.array([None] * len(c), dtype="Int32")
            c["intervention_maturity"] = pd.array([None] * len(c), dtype="Int32")
            out.append(c)
        i = pdf["doc_text"].str.extractall(INTERVENTION_RE)
        if len(i):
            i.columns = ["name", "life_word", "mat_word", "aka", "description"]
            i = i.reset_index().rename(columns={"level_0": "row"})
            i["type"] = "intervention"
            i["concept_category"] = None
            i["intervention_lifecycle"] = (
                i["life_word"].map(LIFECYCLE_WORDS).astype("Int32")
            )
            i["intervention_maturity"] = i["mat_word"].map(MATURITY_WORDS).astype("Int32")
            out.append(i)
        if not out:
            continue
        n = pd.concat(out, ignore_index=True)
        n["conv_id"] = pdf["conv_id"].iloc[n["row"].to_numpy()].to_numpy()
        n["aliases"] = _split_aliases(n["aka"])
        n["concept_category"] = n.get("concept_category")
        yield n[[
            "conv_id", "name", "aliases", "type", "description",
            "concept_category", "intervention_lifecycle", "intervention_maturity",
        ]]


# =========================== sql engine =====================================

def _map_expr(d: dict) -> F.Column:
    pairs = []
    for k, v in d.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def _extract_field(chunk, pattern: str, idx: int) -> F.Column:
    return F.regexp_extract_all(chunk, F.lit(pattern), idx)


def extract_triples_sql(documents: DataFrame) -> DataFrame:
    """JVM-only triple extraction: split doc on chain markers →
    posexplode chunks (chain_id) → ONE regexp_extract_all pass pulls
    whole edge sentences → posexplode (edge_idx) → per-field
    regexp_extract on the ~100-char sentence.

    Single-pass design: field extraction used to be five
    regexp_extract_all passes over the full chunk; extracting the
    whole match (group 0) once and field-parsing the short sentences
    cuts regex bytes scanned ~3× (measured ~1.9× wall on the
    4.2M-turn corpus)."""
    chunks = documents.select(
        "conv_id",
        F.posexplode(F.split(F.col("doc_text"), r"Logical chain <")).alias(
            "chain_pos", "chunk"
        ),
    ).filter(F.col("chain_pos") >= 1)  # chunk 0 = preamble before first chain

    chunk = F.col("chunk")
    sentences = chunks.select(
        "conv_id",
        (F.col("chain_pos") - 1).cast("int").alias("chain_id"),
        F.regexp_extract(chunk, r"^([^>]*)> proceeds as follows\.", 1).alias("chain_title"),
        F.posexplode(
            F.regexp_extract_all(chunk, F.lit(EDGE_RE), 0)
        ).alias("edge_idx", "sent"),
    )
    sent = F.col("sent")
    return sentences.select(
        "conv_id",
        "chain_id",
        "chain_title",
        F.col("edge_idx").cast("int").alias("edge_idx"),
        F.regexp_extract(sent, EDGE_RE, 1).alias("subj"),
        F.element_at(
            _map_expr(EDGE_PHRASES), F.regexp_extract(sent, EDGE_RE, 2)
        ).alias("pred"),
        F.regexp_extract(sent, EDGE_RE, 3).alias("obj"),
        F.regexp_extract(sent, EDGE_RE, 5).alias("description"),
        F.element_at(
            _map_expr(CONFIDENCE_WORDS), F.regexp_extract(sent, EDGE_RE, 4)
        )
        .cast("int")
        .alias("edge_confidence"),
    )


def extract_nodes_sql(documents: DataFrame) -> DataFrame:
    doc = F.col("doc_text")

    def aliases_col(raw):
        return F.when(raw == "none", F.array().cast("array<string>")).otherwise(
            F.filter(F.split(raw, r" / "), lambda x: F.length(x) > 0)
        )

    concepts = (
        documents.select(
            "conv_id",
            F.explode(
                F.arrays_zip(
                    _extract_field(doc, CONCEPT_RE, 1).alias("name"),
                    _extract_field(doc, CONCEPT_RE, 2).alias("category"),
                    _extract_field(doc, CONCEPT_RE, 3).alias("aka"),
                    _extract_field(doc, CONCEPT_RE, 4).alias("description"),
                )
            ).alias("n"),
        )
        .select(
            "conv_id",
            F.col("n.name").alias("name"),
            aliases_col(F.col("n.aka")).alias("aliases"),
            F.lit("concept").alias("type"),
            F.col("n.description").alias("description"),
            F.col("n.category").alias("concept_category"),
            F.lit(None).cast("int").alias("intervention_lifecycle"),
            F.lit(None).cast("int").alias("intervention_maturity"),
        )
    )
    interventions = (
        documents.select(
            "conv_id",
            F.explode(
                F.arrays_zip(
                    _extract_field(doc, INTERVENTION_RE, 1).alias("name"),
                    _extract_field(doc, INTERVENTION_RE, 2).alias("life_word"),
                    _extract_field(doc, INTERVENTION_RE, 3).alias("mat_word"),
                    _extract_field(doc, INTERVENTION_RE, 4).alias("aka"),
                    _extract_field(doc, INTERVENTION_RE, 5).alias("description"),
                )
            ).alias("n"),
        )
        .select(
            "conv_id",
            F.col("n.name").alias("name"),
            aliases_col(F.col("n.aka")).alias("aliases"),
            F.lit("intervention").alias("type"),
            F.col("n.description").alias("description"),
            F.lit(None).cast("string").alias("concept_category"),
            F.element_at(_map_expr(LIFECYCLE_WORDS), F.col("n.life_word"))
            .cast("int")
            .alias("intervention_lifecycle"),
            F.element_at(_map_expr(MATURITY_WORDS), F.col("n.mat_word"))
            .cast("int")
            .alias("intervention_maturity"),
        )
    )
    return concepts.unionByName(interventions)


# =========================== public API =====================================

def extract_triples(documents: DataFrame, engine: str = "arrow") -> DataFrame:
    if engine == "sql":
        return extract_triples_sql(documents)
    return documents.select("conv_id", "doc_text").mapInPandas(
        _triples_batches, schema=TRIPLES_RAW
    )


def extract_nodes(documents: DataFrame, engine: str = "arrow") -> DataFrame:
    if engine == "sql":
        return extract_nodes_sql(documents)
    return documents.select("conv_id", "doc_text").mapInPandas(
        _nodes_batches, schema=NODES_RAW
    )


# Per-row mention+span extraction, entirely JVM-side: one aggregate
# over split('[') parts carries a running character offset (each part
# k ≥ 1 starts at Σ len(parts[j<k]) + k separator chars), so spans
# come out of the same pass that finds the mentions — no second scan,
# no Python. span_start = 0-based offset of the mention's first char;
# span_end = exclusive end: substring(doc_text, span_start+1,
# span_end-span_start) == mention (mentions-table contract,
# SURVEY.md:169; reference highlights/attribution consumers).
_MENTION_SPANS_EXPR = r"""
transform(
  filter(
    aggregate(
      split(doc_text, '\\['),
      named_struct(
        'acc', cast(array() as array<struct<p:string,off:int>>),
        'pos', 0,
        'k', 0),
      (s, p) -> named_struct(
        'acc', if(s.k = 0, s.acc,
                  array_append(s.acc, named_struct('p', p, 'off', s.pos))),
        'pos', cast(s.pos + length(p) + 1 as int),
        'k', s.k + 1),
      s -> s.acc),
    x -> instr(x.p, ']') > 0),
  x -> named_struct(
    'mention', substring(x.p, 1, instr(x.p, ']') - 1),
    'span_start', x.off,
    'span_end', cast(x.off + instr(x.p, ']') - 1 as int))
)
"""


def extract_mentions(documents: DataFrame) -> DataFrame:
    """Mention detection: every bracket-delimited node reference with
    its character span (0-based start, exclusive end), computed
    JVM-side in one pass over the split parts."""
    return documents.select(
        "conv_id",
        F.posexplode(F.expr(_MENTION_SPANS_EXPR)).alias("m_idx", "m"),
    ).select(
        "conv_id",
        F.col("m.mention").alias("mention"),
        F.lit("node_ref").alias("mtype"),
        F.col("m.span_start").alias("span_start"),
        F.col("m.span_end").alias("span_end"),
    )
