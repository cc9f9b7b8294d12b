"""LLM-data-pipeline operators (SURVEY §2.H: H7-H10 + dedup/similarity/
multimodal/text-analysis extensions).

Filled in milestone M4.
"""
