"""LLM-training-data pipeline operators (SURVEY.md §2.4, BASELINE.json
north star) — dedup families, similarity search, text analysis, and
multimodal column plumbing over the documents/embeddings fixtures.

Not present in the reference (a batch SQL connector); these are the
extensions that make the engine useful for 100-TB corpus preparation.
Design rule: everything is DataFrame-native (explode/join/agg +
higher-order functions); Python appears only as Arrow-batched pandas
UDFs in the multimodal decode path, and O(n²) brute force is always
paired with a bucketed/LSH scale path.
"""
