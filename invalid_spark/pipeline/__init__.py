"""Training-data pipeline operators over document / embedding tables.

These generalize the validation engine (rule checks over an
image+caption table) to the operations a 100 TB training-data
pipeline runs alongside validation: text quality analysis,
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine), and similarity search. All operators are pure
DataFrame compositions — built-in functions only, no Python in the
hot path — so Catalyst/AQE plan them (predicate pushdown, partial
aggregation, broadcast/skew-join) exactly like the core checks.
"""
