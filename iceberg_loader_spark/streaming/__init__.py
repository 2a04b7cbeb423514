"""Structured Streaming operators (SURVEY.md §2 B20–B23) — wave-2.

Batch-equivalent oracle queries (tumbling/sliding/session windows on
``events``) will register here; the true streaming execution paths live in
``streaming/windows.py`` and are exercised by tests.
"""

QUERIES: dict = {}
ORACLES: dict = {}
