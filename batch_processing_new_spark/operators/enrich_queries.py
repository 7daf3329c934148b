"""Registry queries for the enrichment operator (reference's core op).
(Filled in after the relational core is green.)"""

from __future__ import annotations
