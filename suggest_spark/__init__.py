"""suggest_spark — a PySpark-native approximate-string-matching / record-linkage engine.

A from-scratch re-expression of the capabilities of suggest-go/suggest
(character n-gram inverted indexing, count/length filtering, top-k
approximate string matching under Jaccard/Cosine/Dice/Overlap/Exact
n-gram set similarity) as declarative Spark DataFrame plans, extended
with web-scale record linkage: prefix-filtered blocking, batched
pairwise scoring, and iterative connected-components clustering.

Reference semantics are documented per-module with file:line citations
into /root/reference (read-only); no reference code is used.
"""

__version__ = "0.1.0"
