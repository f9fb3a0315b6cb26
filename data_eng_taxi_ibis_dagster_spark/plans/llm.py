"""LLM-data-pipeline query plans (E9–E13): dedup, similarity search,
text analysis, multimodal columns. Filled in operator-by-operator; see
operators.dedup / operators.similarity / operators.text.
"""
