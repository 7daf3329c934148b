"""Structured Streaming queries (file-replay of events).
(Filled in after the relational core is green.)"""

from __future__ import annotations
