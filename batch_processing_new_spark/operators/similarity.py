"""Similarity search over embeddings: brute-force cosine top-k + LSH.
(Filled in after the relational core is green.)"""

from __future__ import annotations
