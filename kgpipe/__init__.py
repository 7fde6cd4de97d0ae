"""kgpipe — a PySpark-native knowledge-graph construction pipeline.

From-scratch re-expression of the capabilities of
UCDenver-ccp/ccp-nlp-pipelines (reference at /root/reference, studied for
behavior only): dictionary-based concept recognition over conversation
transcripts, entity-link disambiguation, canonicalization, triple
materialization into partitioned tables, lineage-tracked resumable runs,
and span-level evaluation — all declared with the DataFrame API so Catalyst
plans the physical execution; Python appears only inside Arrow-batched
pandas UDFs (the trie scanner).
"""

__version__ = "0.4.0"
