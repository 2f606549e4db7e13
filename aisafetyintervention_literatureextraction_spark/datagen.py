"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Generates the ``transcripts`` input table per BASELINE.json's
``input_hint`` schema with:

- extraction-grammar sentences (ontology.py templates) so expected
  triples are derivable in closed form;
- rows emitted in a seeded SHUFFLED order (tests prove order
  independence);
- ≥1 hot conversation (skew: ≥100× median turns);
- one conversation with a duplicate ``(conv_id, turn_idx)`` and one
  with a turn-index gap (quarantine path);
- alias-variant node declarations across conversations so the
  canonicalization stage has true merge targets
  (ontology.CANONICAL_ALIASES);
- the reference's golden paper graph (9 nodes / 4 chains / 8 edges,
  reference src/prompt/schemas/output_sample.json) rendered as one
  fixture conversation — the P/R ≥ 0.95 gate is measured against it.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from .ontology import (
    CANONICAL_ALIASES,
    CHAIN_TMPL,
    CONCEPT_CATEGORIES,
    CONCEPT_DECL_TMPL,
    CONFIDENCE_WORDS,
    EDGE_PHRASES,
    EDGE_TMPL,
    INTERVENTION_DECL_TMPL,
    LIFECYCLE_WORDS,
    MATURITY_WORDS,
)

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


@dataclass
class ExpectedGraph:
    """Closed-form expected extraction output for a generated corpus."""

    nodes: list[dict] = field(default_factory=list)    # conv_id, name, type, ...
    triples: list[dict] = field(default_factory=list)  # conv_id, subj, pred, obj, conf


# --- the reference golden sample (FIXTURES.md §4) --------------------------
# (subj, pred, obj, edge_confidence) of output_sample.json:94-171
GOLDEN_TRIPLES = [
    ("emergent deception abilities in state-of-the-art LLMs", "leads_to",
     "potential for models to bypass human monitoring and alignment", 2),
    ("potential for models to bypass human monitoring and alignment", "mitigated_by",
     "implement standardized deception-evaluation suite during pre-deployment testing", 2),
    ("chain-of-thought prompting amplifies deception performance", "leads_to",
     "potential for models to bypass human monitoring and alignment", 3),
    ("chain-of-thought prompting amplifies deception performance", "mitigated_by",
     "restrict or obfuscate chain-of-thought outputs in deployed systems", 2),
    ("Machiavellianism-inducing prompts increase propensity to deceive", "leads_to",
     "potential for models to bypass human monitoring and alignment", 3),
    ("Machiavellianism-inducing prompts increase propensity to deceive", "mitigated_by",
     "detect and neutralise Machiavellian-style prompt patterns at runtime", 3),
    ("model scale correlates with deception capability", "leads_to",
     "future larger models likely to possess stronger deceptive strategies", 3),
    ("future larger models likely to possess stronger deceptive strategies", "addressed_by",
     "fine-tune models with anti-deception objectives and datasets", 2),
]

# name -> (type, category_or_None, lifecycle_or_None, maturity_or_None)
GOLDEN_NODES = {
    "emergent deception abilities in state-of-the-art LLMs": ("concept", "Finding", None, None),
    "potential for models to bypass human monitoring and alignment": ("concept", "Risk", None, None),
    "implement standardized deception-evaluation suite during pre-deployment testing":
        ("intervention", None, 4, 2),
    "chain-of-thought prompting amplifies deception performance": ("concept", "Finding", None, None),
    "restrict or obfuscate chain-of-thought outputs in deployed systems": ("intervention", None, 5, 2),
    "Machiavellianism-inducing prompts increase propensity to deceive": ("concept", "Finding", None, None),
    "detect and neutralise Machiavellian-style prompt patterns at runtime": ("intervention", None, 5, 2),
    "model scale correlates with deception capability": ("concept", "Observation", None, None),
    "future larger models likely to possess stronger deceptive strategies": ("concept", "Threat", None, None),
    "fine-tune models with anti-deception objectives and datasets": ("intervention", None, 2, 1),
}

_CONF_WORD = {v: k for k, v in CONFIDENCE_WORDS.items()}
_LIFE_WORD = {v: k for k, v in LIFECYCLE_WORDS.items()}
_MAT_WORD = {v: k for k, v in MATURITY_WORDS.items()}

FILLER = (
    "the paper then discusses broader context and experimental setup details "
    "including datasets models baselines and ablations"
).split()


def _decl_sentence(name, ntype, category, lifecycle, maturity, aliases, desc):
    aka = " / ".join(aliases) if aliases else "none"
    if ntype == "concept":
        return CONCEPT_DECL_TMPL.format(
            name=name, category=category or "Finding", aliases=aka, description=desc
        )
    return INTERVENTION_DECL_TMPL.format(
        name=name,
        lifecycle=_LIFE_WORD[lifecycle or 6],
        maturity=_MAT_WORD[maturity or 1],
        aliases=aka,
        description=desc,
    )


def _edge_sentence(subj, pred, obj, conf, desc):
    phrase = {v: k for k, v in EDGE_PHRASES.items()}[pred]
    return EDGE_TMPL.format(
        subj=subj, phrase=phrase, obj=obj, confidence=_CONF_WORD[conf], description=desc
    )


def _conversation_rows(conv_id: str, sentences: list[str], rng: random.Random):
    """Turn a sentence list into transcript rows: one sentence per turn,
    roles cycling user/assistant/tool, ts monotone with turn_idx."""
    rows = []
    t0 = EPOCH + timedelta(seconds=rng.randrange(0, 10_000_000))
    roles = ["user", "assistant", "tool"]
    for i, s in enumerate(sentences):
        rows.append({
            "conv_id": conv_id,
            "turn_idx": i,
            "role": roles[i % 3],
            "text": s,
            "tool": "search" if i % 3 == 2 else None,
            "ts": t0 + timedelta(seconds=7 * i),
        })
    return rows


def generate_corpus(
    n_convs: int = 60,
    seed: int = 7,
    hot_conv_turns: int = 1200,
    with_quarantine: bool = True,
) -> tuple[list[dict], ExpectedGraph]:
    """Build (shuffled transcript rows, expected extraction output)."""
    rng = random.Random(seed)
    expected = ExpectedGraph()
    all_rows: list[dict] = []

    # ---- conv 0: the reference golden paper --------------------------------
    conv = "conv_golden"
    sents: list[str] = []
    for name, (ntype, cat, life, mat) in GOLDEN_NODES.items():
        sents.append(_decl_sentence(name, ntype, cat, life, mat,
                                    [f"{name} variant", f"{name} alt form"],
                                    f"technical description of {name}"))
        expected.nodes.append({
            "conv_id": conv, "name": name, "type": ntype,
            "concept_category": cat,
            "intervention_lifecycle": life, "intervention_maturity": mat,
        })
    chain_bounds = [(0, 2), (2, 4), (4, 6), (6, 8)]
    for ci, (lo, hi) in enumerate(chain_bounds):
        sents.append(CHAIN_TMPL.format(title=f"golden chain {ci}"))
        for subj, pred, obj, conf in GOLDEN_TRIPLES[lo:hi]:
            sents.append(_edge_sentence(subj, pred, obj, conf, "as reported"))
            expected.triples.append({
                "conv_id": conv, "subj": subj, "pred": pred, "obj": obj,
                "edge_confidence": conf,
            })
    all_rows += _conversation_rows(conv, sents, rng)

    # ---- alias-cluster conversations (canonicalization targets) ------------
    canon_items = sorted(CANONICAL_ALIASES.items())
    for i, (canon, aliases) in enumerate(canon_items):
        variants = [canon] + aliases
        for j, variant in enumerate(variants):
            conv = f"conv_alias_{i}_{j}"
            sents = [
                _decl_sentence(variant, "concept", "Method", None, None,
                               [a for a in variants if a != variant][:2],
                               f"shared description of {canon}"),
                CHAIN_TMPL.format(title=f"alias chain {i} {j}"),
                _edge_sentence(variant, "enables", f"safety application {i}", 3,
                               "cluster edge"),
            ]
            expected.nodes.append({
                "conv_id": conv, "name": variant, "type": "concept",
                "concept_category": "Method",
                "intervention_lifecycle": None, "intervention_maturity": None,
            })
            expected.triples.append({
                "conv_id": conv, "subj": variant, "pred": "enables",
                "obj": f"safety application {i}", "edge_confidence": 3,
            })
            all_rows += _conversation_rows(conv, sents, rng)

    # ---- bulk synthetic conversations ---------------------------------------
    preds = sorted(EDGE_PHRASES.values())
    for k in range(n_convs):
        conv = f"conv_{k:05d}"
        n_chains = 1 + rng.randrange(3)
        sents = []
        for c in range(n_chains):
            # names carry one distinct compound token (snake_case per C9)
            # so unrelated bulk nodes never exceed the merge threshold
            subj = f"finding_{k}_{c} about {rng.choice(FILLER)}"
            mid = f"risk_{k}_{c} of {rng.choice(FILLER)}"
            fix = f"apply mitigation_{k}_{c} with {rng.choice(FILLER)}"
            cat = rng.choice(CONCEPT_CATEGORIES)
            life = 1 + rng.randrange(6)
            mat = 1 + rng.randrange(4)
            sents.append(_decl_sentence(subj, "concept", cat, None, None, [], f"desc of {subj}"))
            sents.append(_decl_sentence(mid, "concept", "Risk", None, None, [], f"desc of {mid}"))
            sents.append(_decl_sentence(fix, "intervention", None, life, mat, [], f"desc of {fix}"))
            for nm, ty, cc, ll, mm in [
                (subj, "concept", cat, None, None),
                (mid, "concept", "Risk", None, None),
                (fix, "intervention", None, life, mat),
            ]:
                expected.nodes.append({
                    "conv_id": conv, "name": nm, "type": ty, "concept_category": cc,
                    "intervention_lifecycle": ll, "intervention_maturity": mm,
                })
            sents.append(CHAIN_TMPL.format(title=f"chain {k} {c}"))
            p1 = rng.choice(["leads_to", "causes", "contributes_to"])
            p2 = rng.choice(["mitigated_by", "addressed_by", "resolved_by"])
            c1, c2 = 1 + rng.randrange(5), 1 + rng.randrange(5)
            sents.append(_edge_sentence(subj, p1, mid, c1, "first hop"))
            sents.append(_edge_sentence(mid, p2, fix, c2, "second hop"))
            expected.triples.append({"conv_id": conv, "subj": subj, "pred": p1,
                                     "obj": mid, "edge_confidence": c1})
            expected.triples.append({"conv_id": conv, "subj": mid, "pred": p2,
                                     "obj": fix, "edge_confidence": c2})
            # occasional extra predicate variety
            if rng.random() < 0.3:
                p3 = rng.choice(preds)
                c3 = 1 + rng.randrange(5)
                sents.append(_edge_sentence(fix, p3, subj, c3, "loop note"))
                expected.triples.append({"conv_id": conv, "subj": fix, "pred": p3,
                                         "obj": subj, "edge_confidence": c3})
        # filler turns so docs aren't pure grammar
        for _ in range(rng.randrange(4)):
            sents.append("Background: " + " ".join(rng.choice(FILLER) for _ in range(12)) + ".")
        all_rows += _conversation_rows(conv, sents, rng)

    # ---- hot conversation (skew) --------------------------------------------
    conv = "conv_hot"
    sents = []
    for h in range(hot_conv_turns):
        sents.append("Hot filler turn %06d: " % h
                     + " ".join(rng.choice(FILLER) for _ in range(10)) + ".")
    sents.append(CHAIN_TMPL.format(title="hot chain"))
    sents.append(_edge_sentence("hot finding", "leads_to", "hot risk", 4, "hot edge"))
    expected.triples.append({"conv_id": conv, "subj": "hot finding", "pred": "leads_to",
                             "obj": "hot risk", "edge_confidence": 4})
    all_rows += _conversation_rows(conv, sents, rng)

    # ---- quarantine conversations: duplicate turn_idx + gap ----------------
    if with_quarantine:
        dup_rows = _conversation_rows(
            "conv_dup", ["sentence a.", "sentence b.", "sentence c."], rng
        )
        clone = dict(dup_rows[1])
        clone["text"] = "conflicting duplicate of b."
        dup_rows.append(clone)  # same (conv_id, turn_idx=1), different text
        all_rows += dup_rows

        gap_rows = _conversation_rows(
            "conv_gap", ["g0.", "g1.", "g2.", "g3."], rng
        )
        gap_rows = [r for r in gap_rows if r["turn_idx"] != 2]  # hole at 2
        all_rows += gap_rows

    rng.shuffle(all_rows)  # prove order-independence
    return all_rows, expected


def corpus_df(spark, **kwargs):
    """Materialize the corpus as a DataFrame with the TRANSCRIPTS schema."""
    from .schemas import TRANSCRIPTS

    rows, expected = generate_corpus(**kwargs)
    df = spark.createDataFrame(rows, schema=TRANSCRIPTS)
    return df, expected
