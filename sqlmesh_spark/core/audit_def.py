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


@dataclass
class ModelAuditDef:
    """Custom model audit (audit/definition.py:121 ModelAudit): a named,
    parameterized violation query attached to models via
    ``audits (name(arg = val))``. ``@this_model`` binds the audited
    relation; args/defaults bind @vars. Blocking by default, overridable
    per attachment."""

    name: str
    query: str
    defaults: dict[str, str] = field(default_factory=dict)
    blocking: bool = True


def parse_audit_text(text: str):
    m = _AUDIT_RE.search(text)
    if not m:
        raise ValueError("no AUDIT(...) header found")
    open_idx = text.index("(", m.start())
    close_idx = _find_close(text, open_idx)
    props = _parse_props(text[open_idx + 1 : close_idx])
    if "name" not in props:
        raise ValueError("AUDIT header requires name")
    query = text[close_idx + 1 :].lstrip(" \t\n;").rstrip().rstrip(";")
    name = props["name"].strip().lower()
    blocking = _unquote(props.get("blocking", "")).lower() in ("true", "1")
    if _unquote(props.get("standalone", "false")).lower() in ("true", "1"):
        if blocking:
            raise ValueError(
                f"standalone audits cannot be blocking: {name!r} "
                "(audit/definition.py:189)"
            )
        return StandaloneAudit(
            name=name, query=query, depends_on=extract_depends_on(query)
        )
    if "blocking" in props and not blocking:
        default_blocking = False
    else:
        default_blocking = True
    defaults = {}
    if "defaults" in props:
        from sqlmesh_spark.core.model import _parse_tuple

        for kv in _parse_tuple(props["defaults"]):
            k, _, v = kv.partition("=")
            # Raw token (quotes intact) — same contract as model-level audit
            # args: 'foo' is a string literal, bare foo a column reference.
            defaults[k.strip().lower()] = v.strip()
    return ModelAuditDef(
        name=name, query=query, defaults=defaults, blocking=default_blocking
    )


def parse_audit_file(path: str) -> StandaloneAudit:
    with open(path) as f:
        return parse_audit_text(f.read())
