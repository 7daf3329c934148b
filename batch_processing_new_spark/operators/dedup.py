"""Deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.
(Filled in after the relational core is green.)"""

from __future__ import annotations
