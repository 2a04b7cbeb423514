"""Multimodal-column plumbing (SURVEY.md §2 B28) — wave-2 placeholder.

Will carry: binary payload columns + typed metadata structs, decode /
feature-extract / resize / frame-sample as Arrow-batched ``mapInPandas``
stages (decode stubbed — no image/audio libs in this container).
"""

QUERIES: dict = {}
ORACLES: dict = {}
