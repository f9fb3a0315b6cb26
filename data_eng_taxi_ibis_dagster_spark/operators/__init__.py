"""Composable DataFrame operators.

Relational helpers the stock API lacks a single call for (as-of join,
bucketized band join) plus the LLM-data-pipeline operator set mandated
by the north star: dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard), embedding similarity search, text analysis, and multimodal
column handling. All hot paths are built-in column expressions
(JVM-side, whole-stage codegen); Python appears only in the multimodal
mapInPandas plumbing where per-payload decoding is inherently opaque.
"""
