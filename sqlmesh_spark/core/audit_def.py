"""Standalone audits — audits that are project artifacts in their own
right, not attachments to a model.

Reference: sqlmesh/core/audit/definition.py:157 (StandaloneAudit — a
_Node with its own query, depends_on, and schedule; :189 validates that
standalone audits cannot be blocking). They live in the project's
``audits/`` directory as ``AUDIT (...)`` headers followed by a query that
returns VIOLATION rows; the scheduler runs them after their upstream
models and reports (never blocks on) failures.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from sqlmesh_spark.core.model import (
    _find_close,
    _parse_props,
    _unquote,
    extract_depends_on,
)

_AUDIT_RE = re.compile(r"\bAUDIT\s*\(", re.IGNORECASE)


@dataclass
class StandaloneAudit:
    name: str
    query: str  # returns violation rows; empty result = pass
    depends_on: frozenset[str] = frozenset()
    # definition.py:189 — standalone audits CANNOT be blocking.
    blocking: bool = field(default=False, init=False)


def parse_audit_text(text: str) -> StandaloneAudit:
    m = _AUDIT_RE.search(text)
    if not m:
        raise ValueError("no AUDIT(...) header found")
    open_idx = text.index("(", m.start())
    close_idx = _find_close(text, open_idx)
    props = _parse_props(text[open_idx + 1 : close_idx])
    if "name" not in props:
        raise ValueError("AUDIT header requires name")
    if _unquote(props.get("blocking", "false")).lower() in ("true", "1"):
        raise ValueError(
            f"standalone audits cannot be blocking: {props['name']!r} "
            "(audit/definition.py:189)"
        )
    query = text[close_idx + 1 :].lstrip(" \t\n;").rstrip().rstrip(";")
    return StandaloneAudit(
        name=props["name"].strip().lower(),
        query=query,
        depends_on=extract_depends_on(query),
    )


def parse_audit_file(path: str) -> StandaloneAudit:
    with open(path) as f:
        return parse_audit_text(f.read())
