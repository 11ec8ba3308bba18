"""Scalar/column function library + LLM-data-pipeline operators.

The reference has no scalar-function library (record logic is arbitrary
Python lambdas, SURVEY §2.8); this package provides the Column-first
equivalents plus the beyond-reference operators a large-scale training-data
pipeline needs: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity search, text analysis, and multimodal column
plumbing.
"""
