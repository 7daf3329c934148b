"""Text analysis: token counting, quality scoring, language-ID heuristic,
document fingerprinting. (Filled in after the relational core is green.)"""

from __future__ import annotations
