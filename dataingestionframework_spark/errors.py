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


class DuplicateHeaderError(SpecValidationError):
    """HeaderID uniqueness violated (reference: modules/insert_config.py:94-120)."""
