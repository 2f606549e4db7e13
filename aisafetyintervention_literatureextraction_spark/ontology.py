"""Controlled vocabularies, attribute scales, and the extraction grammar.

The reference's extraction is an LLM prompt; its *contract* is the
ontology + attribute scales + output schema (reference
``prompts.py:6-42``, ``final_primary_prompt.py:59-127``,
``core.py:5-34``). Our engine replaces the LLM with a deterministic
pattern grammar: the synthetic corpus generator emits sentences in
this grammar and the extractor parses them back — the grammar IS the
fixture contract (SURVEY.md §7 "fixtures as the contract").
"""

from __future__ import annotations

# --- Variant-B controlled vocabulary (reference prompts.py:6-23, 25-42) ---
NODE_TYPES = [
    "ASSUMPTION", "BEHAVIOR", "BENCHMARK", "CLAIM", "CONCEPT", "DATASET",
    "METRIC", "METHOD", "MITIGATION", "MODEL", "PROMPT_TECHNIQUE",
    "PROTOCOL", "RESULT", "RISK_TYPE", "TASK", "THREAT",
]

EDGE_TYPES = [
    "ASSUMES", "CAUSES", "CHANGES", "CORRELATES_WITH", "DERIVES_FROM",
    "ENABLES", "EVALUATES_ON", "EVIDENCES", "EXPLAINS", "IDENTIFIES",
    "IMPROVES_OVER", "MITIGATES", "PREVENTS", "PROPOSES", "REPORTS",
    "VARIES_WITH",
]

# --- Variant-A relationship verb families (final_primary_prompt.py:59-67) ---
# phrase (as it appears in document text) -> canonical predicate verb
EDGE_PHRASES: dict[str, str] = {
    # causal
    "causes": "causes",
    "produces": "produces",
    "triggers": "triggers",
    "contributes to": "contributes_to",
    "leads to": "leads_to",
    # conditional
    "requires": "requires",
    "depends on": "depends_on",
    "implies": "implies",
    "enables": "enables",
    # sequential
    "follows": "follows",
    "precedes": "precedes",
    "builds upon": "builds_upon",
    # refinement
    "is refined by": "refined_by",
    "is specified by": "specified_by",
    "is detailed by": "detailed_by",
    # solution
    "is addressed by": "addressed_by",
    "is mitigated by": "mitigated_by",
    "is resolved by": "resolved_by",
    "is protected against by": "protected_against_by",
    "is implemented by": "implemented_by",
    # correlation
    "correlates with": "correlates_with",
    "is associated with": "associated_with",
}

# --- Attribute scales (final_primary_prompt.py:70-104) ---
# word marker (in text) -> edge_confidence 1-5
CONFIDENCE_WORDS: dict[str, int] = {
    "speculative": 1,
    "weak support": 2,
    "medium support": 3,
    "strong support": 4,
    "validated": 5,
}

# word marker -> intervention_lifecycle 1-6
LIFECYCLE_WORDS: dict[str, int] = {
    "pre-training": 1,
    "fine-tuning": 2,
    "rlhf": 3,
    "pre-deployment testing": 4,
    "deployment": 5,
    "other": 6,
}

# word marker -> intervention_maturity 1-4
MATURITY_WORDS: dict[str, int] = {
    "foundational": 1,
    "experimental": 2,
    "prototype": 3,
    "operational": 4,
}

# concept categories (final_primary_prompt.py:106-127) — open set; examples
CONCEPT_CATEGORIES = [
    "Assumption", "Claim", "Data", "Evidence", "Finding", "Method",
    "Metric", "Model", "Observation", "Opportunity", "Principle",
    "Problem", "Result", "Risk", "Theoretical Framework", "Threat",
    "Validation",
]

# --- Canonical alias table (prompt normalization rules,
# EXTRACTION_PROMPT_TEMPLATE "RLHF -> Reinforcement Learning from Human
# Feedback", prompts.py:94) — used by canonicalization fixtures.
CANONICAL_ALIASES: dict[str, list[str]] = {
    "rlhf": ["reinforcement learning from human feedback", "rl from human feedback"],
    "chain_of_thought": ["cot", "chain of thought prompting", "step-by-step reasoning"],
    "constitutional_ai": ["cai", "constitutional training"],
    "red_teaming": ["red team evaluation", "adversarial probing"],
    "reward_hacking": ["specification gaming", "reward gaming"],
    "truthfulqa": ["truthful qa benchmark"],
    "gpt-3": ["gpt3", "gpt-3 variants"],
    "adversarial_robustness": ["robustness to adversarial examples"],
    "interpretability": ["mechanistic interpretability", "model transparency"],
    "scalable_oversight": ["oversight at scale", "recursive reward modeling"],
}

# --- Grammar sentence shapes -------------------------------------------------
# Concept declaration:
#   Concept <name> (category: <cat>; aka: <alias1> / <alias2>) is defined as <desc>.
# Intervention declaration:
#   Intervention <name> (lifecycle: <word>; maturity: <word>; aka: ...) is defined as <desc>.
# Chain marker:
#   Logical chain <title> proceeds as follows.
# Edge:
#   Evidence shows that [<subj>] <edge-phrase> [<obj>] with <confidence-word>
#   confidence because <description>.
#
# Square brackets delimit node names (robust vectorized parsing); the
# extractor regexes live in operators/extraction.py and the renderer in
# datagen.py — both import THIS module so they cannot drift.

CONCEPT_DECL_TMPL = "Concept [{name}] (category: {category}; aka: {aliases}) is defined as {description}."
INTERVENTION_DECL_TMPL = (
    "Intervention [{name}] (lifecycle: {lifecycle}; maturity: {maturity}; aka: {aliases})"
    " is defined as {description}."
)
CHAIN_TMPL = "Logical chain <{title}> proceeds as follows."
EDGE_TMPL = (
    "Evidence shows that [{subj}] {phrase} [{obj}] with {confidence} confidence"
    " because {description}."
)
