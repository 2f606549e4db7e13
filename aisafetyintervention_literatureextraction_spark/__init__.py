"""PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the capabilities of
``jonpsy/AISafetyIntervention_LiteratureExtraction`` (reference at
``/root/reference``, read-only) on idiomatic PySpark:

- **Stage A — reassembly**: window-over-``(conv_id, turn_idx)`` turns →
  stably-ordered documents (analog of "one PDF = one document",
  reference ``extract.py:62-85``).
- **Stage B — extraction**: vectorized pandas/Arrow UDF mention
  detection + triple extraction into ``(subj, pred, obj)`` rows
  (analog of the LLM structured-output map, ``extract.py:48-60``).
- **Stage C — canonicalization**: TF-IDF + MinHash-LSH blocking +
  iterative hash-join connected components (replaces embedding +
  usearch KNN + pairwise merge, ``merge.py:72-116``,
  ``db.py:106-155``).
- **Stage D — materialization**: dedup + upsert into ``kg_nodes`` /
  ``kg_edges`` tables (replaces FalkorDB Cypher MERGE,
  ``db.py:34-54``).

All stages are pure ``DataFrame → DataFrame`` functions, checkpointed
per-partition with lineage + metrics so a killed run resumes without
recomputation.
"""

__version__ = "0.1.0"
