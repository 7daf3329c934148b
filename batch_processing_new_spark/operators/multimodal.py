"""Multimodal columns: binary payloads + typed metadata, stubbed decode.
(Filled in after the relational core is green.)"""

from __future__ import annotations
