"""DuckDB regexp call handlers (regexp_matches / regexp_extract /
regexp_full_match), split out of ``duckdb_fns.py`` in round 11 —
bodies verbatim, same ``read == "duckdb"`` dispatch gate (pinned by
``tests/test_transpile.py::test_duckdb_split_dispatch_gates_round11``).
The named-group ``regexp_extract(s, p, [names])`` STRUCT form is new in
round 11 (the round-10 SPARK_ERR tier).
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _call_arg_spans,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _spark_string_literal,
    convert_posix_classes,
    convert_regex_literal,
)


def call_handlers(ctx) -> "int | None":
    """DuckDB regexp handlers (pre-split bodies verbatim); duckdb-read
    only — dispatched behind a read gate in standard.call_handlers."""
    toks, edits = ctx.toks, ctx.edits
    sql, read = ctx.sql, ctx.read
    i, name = ctx.i, ctx.name
    start = ctx.start
    _arg_text = ctx.arg_text
    n = len(toks)
    _unused = (sql, read, n)

    if name == "regexp_matches":
        # 3-arg form: duckdb options have no Spark argument — inline
        # the ones with exact Java-regex flag equivalents ('i', 's';
        # 'c' is the case-sensitive default) into the pattern. The
        # bare rename previously emitted an invalid 3-arg regexp_like.
        # 'g' is duckdb-rejected for regexp_matches; 'l'/'m'/'n'/'p'
        # have RE2-specific semantics with no exact Java flag — loud.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 3:
            if not (
                spans[2][0] == spans[2][1]
                and toks[spans[2][0]][0] == "string"
                and spans[1][0] == spans[1][1]
                and toks[spans[1][0]][0] == "string"
            ):
                raise TranspileError(
                    "duckdb regexp_matches(s, pat, options) needs "
                    "literal pattern and options to transpile"
                )
            flags = _literal_content(toks[spans[2][0]][1], "duckdb")
            if not set(flags) <= {"i", "c", "s"} or (
                "i" in flags and "c" in flags
            ):
                raise TranspileError(
                    f"duckdb regexp_matches option '{flags}' has no "
                    "exact Java-regex flag; only 'i'/'c'/'s' transpile"
                )
            pat = convert_regex_literal(convert_posix_classes(
                _literal_content(toks[spans[1][0]][1], "duckdb")
            ), "duckdb")
            prefix = "".join(f for f in ("i", "s") if f in flags)
            if prefix:
                pat = f"(?{prefix})" + pat
            edits.append(
                (start, toks[close][3],
                 f"regexp_like(({_arg_text(spans[0])}), "
                 f"{_spark_string_literal(pat, 'duckdb')})")
            )
            return close + 1
    if name == "regexp_extract":
        # literal group index BEYOND the pattern's group count: duck
        # returns '' (pinned live); Spark raises REGEX_GROUP_INDEX
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 3
            and spans[1][0] == spans[1][1]
            and toks[spans[1][0]][0] == "string"
            and spans[2][0] == spans[2][1]
            and toks[spans[2][0]][0] == "number"
        ):
            from sqlmesh_spark.core.dialects.postgres_calls import (
                _count_capture_groups,
            )
            pat_ = _literal_content(toks[spans[1][0]][1], "duckdb")
            if int(toks[spans[2][0]][1]) > _count_capture_groups(pat_):
                # NULL source still yields NULL, not '' (NULL sweep)
                s0_ = _arg_text(spans[0])
                edits.append(
                    (start, toks[close][3],
                     f"IF(({s0_}) IS NULL, NULL, '')")
                )
                return close + 1
        if (
            len(spans) == 3
            and spans[1][0] == spans[1][1]
            and toks[spans[1][0]][0] == "string"
            and spans[2][0] == spans[2][1]
            and toks[spans[2][0]][0] in _NAME_KINDS
            and toks[spans[2][0]][1].upper() == "NULL"
        ):
            # duck returns '' for a literal-NULL group index (pinned
            # live); Spark returns NULL
            s0_ = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"IF(({s0_}) IS NULL, NULL, '')")
            )
            return close + 1
        if (
            len(spans) == 3
            and toks[spans[2][0]][0] == "op"
            and toks[spans[2][0]][1] == "["
        ):
            # named-group LIST form (round 11; previously a Spark
            # arg-type error): duck returns a STRUCT keyed by the
            # given names, taking the FIRST len(names) capture groups
            # (['x'] over 2 groups is legal — pinned live); MORE names
            # than groups is a duck binder error → loud. A NULL source
            # gives a NULL struct (not a struct of NULLs) → IF-guard.
            if not (
                spans[1][0] == spans[1][1]
                and toks[spans[1][0]][0] == "string"
            ):
                raise TranspileError(
                    "regexp_extract with a group-name list needs a "
                    "literal pattern to transpile"
                )
            names_ = []
            for j in range(spans[2][0] + 1, spans[2][1] + 1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "string":
                    names_.append(_literal_content(t_, "duckdb"))
                elif not (k_ == "op" and t_ in (",", "]")):
                    raise TranspileError(
                        "regexp_extract group names must be string "
                        "literals"
                    )
            from sqlmesh_spark.core.dialects.postgres_calls import (
                _count_capture_groups,
            )
            pat_raw = _literal_content(toks[spans[1][0]][1], "duckdb")
            # Java spells named groups (?<n>...), not RE2's (?P<n>...)
            # — extraction is by INDEX so the names only need to parse
            pat_ = convert_regex_literal(convert_posix_classes(
                pat_raw.replace("(?P<", "(?<")
            ), "duckdb")
            if not names_:
                raise TranspileError(
                    "regexp_extract group-name list must not be empty"
                )
            if len(names_) > _count_capture_groups(pat_raw):
                raise TranspileError(
                    "regexp_extract: more group names than capture "
                    "groups (duckdb rejects this too)"
                )
            s0_ = _arg_text(spans[0])
            lit = _spark_string_literal(pat_, "duckdb")
            fields = ", ".join(
                f"{_spark_string_literal(nm, 'duckdb')}, "
                f"regexp_extract(({s0_}), {lit}, {gi + 1})"
                for gi, nm in enumerate(names_)
            )
            edits.append(
                (start, toks[close][3],
                 f"IF(({s0_}) IS NULL, NULL, named_struct({fields}))")
            )
            return close + 1

    if name == "regexp_full_match":
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 2
            and spans[1][0] == spans[1][1]
            and toks[spans[1][0]][0] == "string"
        ):
            pat = convert_regex_literal(convert_posix_classes(
                _literal_content(toks[spans[1][0]][1], "duckdb")
            ), "duckdb")
            # \z, not $: RE2 full-match is absolute end-of-text, while
            # Java $ also matches before a final newline (pinned live)
            lit = _spark_string_literal(f"^(?:{pat})\\z", "duckdb")
            edits.append(
                (start, toks[close][3],
                 f"(({_arg_text(spans[0])}) RLIKE {lit})")
            )
            return close + 1
        raise TranspileError(
            "regexp_full_match needs a literal pattern to transpile"
        )

    return None
