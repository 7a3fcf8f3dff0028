"""Structured failure taxonomy.

Mirrors the reference's runtime failure modes (``Bad records`` raise in
``modules/auto_loader_steps.py:431-432``, ``TABLE_OR_VIEW_NOT_FOUND``
probe in ``notebooks/Data Ingestion Helper.py:150-153``) as typed
exceptions instead of string matching.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for engine failures."""


class BadRecordsError(EngineError):
    """Corrupt rows detected in a batch; the batch was quarantined."""

    def __init__(self, n_bad: int, quarantine_path: str):
        self.n_bad = n_bad
        self.quarantine_path = quarantine_path
        super().__init__(f"Bad records: {n_bad} corrupt row(s) quarantined at {quarantine_path}")


class TableNotFoundError(EngineError):
    """Managed table missing (reference: TABLE_OR_VIEW_NOT_FOUND probe)."""


class SpecValidationError(EngineError):
    """Ingestion spec failed JSON-Schema / semantic validation."""


class StreamRestartRequired(EngineError):
    """Schema drift detected mid-stream: the epoch is aborted BEFORE its
    commit so the restarted stream reprocesses the same files with the
    evolved schema (the reference's cloudFiles ``addNewColumns`` mode
    fails-then-restarts the same way, modules/auto_loader_steps.py:90)."""

    def __init__(self, header_id: int, new_columns: list[str]):
        self.header_id = header_id
        self.new_columns = new_columns
        super().__init__(
            f"schema drift on header {header_id}: new columns {new_columns}; restart the stream"
        )


class DuplicateHeaderError(SpecValidationError):
    """HeaderID uniqueness violated (reference: modules/insert_config.py:94-120)."""


class ConstraintViolationError(EngineError):
    """A write would violate a table CHECK constraint."""

    def __init__(self, table: str, violations: dict[str, int]):
        self.table = table
        self.violations = violations
        detail = ", ".join(f"{k}: {v} rows" for k, v in violations.items())
        super().__init__(f"{table}: CHECK constraint violation ({detail})")


class ConcurrentWriteError(EngineError):
    """A copy-on-write commit raced another writer (pointer moved)."""

    def __init__(self, table: str, expected: str, actual: str):
        self.table, self.expected, self.actual = table, expected, actual
        super().__init__(
            f"{table}: concurrent write detected (image computed from "
            f"{expected}, pointer now {actual}); recompute and retry"
        )
