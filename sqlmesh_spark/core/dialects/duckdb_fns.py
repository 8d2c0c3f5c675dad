"""DuckDB-specific call/token handlers (round 8, each found by
adversarially probing the duckdb module — the parity oracle engine —
with shapes outside the fuzz corpus; semantics pinned in
tests/test_dialect_fuzz.py).

call_handlers: map(keys, values) → map_from_arrays (Spark's map() is
VARIADIC k1,v1,... — the 2-list call builds a one-entry map of lists,
a silent wrong shape), try_cast string→int rounding, in-aggregate
ORDER BY (drop for order-insensitive aggregates, min_by/max_by for
first/last), struct_pack named args, list_* helpers, time_bucket (shared
date_bin emission in standard.py), isinf/isfinite, xor, to_base, epoch_ns, regexp_full_match.
token_handlers moved to ``duckdb_tokens.py`` in the round-11 split
(struct/MAP literals, underscore digit-groups, sampling clauses,
FROM-first statements, typed literals, the statement-tier louds).
ref: the reference's example projects are duckdb-dialect models
(sqlmesh/core/config, examples/sushi), making this the most-read
dialect in practice."""

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

#: order-INSENSITIVE aggregates: an in-args ORDER BY changes nothing
#: about the value — duckdb allows the clause on every aggregate,
#: Spark's grammar rejects it, so it drops
_ORDER_INSENSITIVE_AGGS = frozenset((
    "sum", "avg", "count", "min", "max", "bool_and", "bool_or",
    "bit_and", "bit_or", "bit_xor", "stddev", "stddev_pop",
    "stddev_samp", "var_pop", "var_samp", "variance", "product",
))

_INT_TYPES = {
    "tinyint": "TINYINT", "int1": "TINYINT",
    "smallint": "SMALLINT", "int2": "SMALLINT",
    "int": "INT", "int4": "INT", "integer": "INT", "signed": "BIGINT",
    "bigint": "BIGINT", "int8": "BIGINT",
}


def _find_depth0_order(toks, s0: int, s1: int) -> "int | None":
    """Index of a depth-0 ORDER (followed by BY) inside span s0..s1."""
    depth = 0
    for j in range(s0, s1 + 1):
        k_, t_ = toks[j][0], toks[j][1]
        if k_ == "op" and t_ in ("(", "["):
            depth += 1
        elif k_ == "op" and t_ in (")", "]"):
            depth -= 1
        elif (
            depth == 0 and k_ in _NAME_KINDS and t_.upper() == "ORDER"
            and j + 1 <= s1
            and toks[j + 1][0] in _NAME_KINDS
            and toks[j + 1][1].upper() == "BY"
        ):
            return j
    return None


def _brace_unbalanced(toks, span) -> bool:
    """True when an argument span has unbalanced {}: a duck map/struct
    literal's top-level commas (map {'a':1,'b':2}) split _call_arg_spans
    (which only tracks parens/brackets) mid-literal.  Handlers defer on
    such spans — the {}-literal token handler rewrites the literal this
    pass and the next fixpoint read sees balanced map(...) calls."""
    depth = 0
    for j in range(span[0], span[1] + 1):
        if toks[j][0] == "op":
            if toks[j][1] == "{":
                depth += 1
            elif toks[j][1] == "}":
                depth -= 1
    return depth != 0


def call_handlers(ctx) -> "int | None":
    """DuckDB fidelity call handlers; every branch is duckdb-read-only
    (dispatched behind a read gate in standard.call_handlers)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read = ctx.sql, ctx.read
    i, name = ctx.i, ctx.name
    start = ctx.start
    _arg_text = ctx.arg_text
    first_pass = ctx.first_pass
    n = len(toks)
    _unused = (read, n)


    if name == "try_cast" and first_pass:
        # first-pass only: the coalesce emission itself contains
        # try_cast calls that must not recurse
        # duckdb try_cast('3.9' AS INT) parses the numeric then ROUNDS
        # (half-away: '2.5'→3, '-2.5'→-3); Spark's returns NULL for
        # any non-integral string. Two branches: the direct cast keeps
        # big integers exact, the DOUBLE round-trip catches decimal
        # strings; garbage is NULL through both.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            s0, s1 = spans[0]
            as_idx = None
            depth = 0
            for j in range(s0, s1 + 1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ in ("(", "["):
                    depth += 1
                elif k_ == "op" and t_ in (")", "]"):
                    depth -= 1
                elif depth == 0 and k_ in _NAME_KINDS and t_.upper() == "AS":
                    as_idx = j
            if (
                as_idx is not None
                and as_idx + 1 == s1
                and toks[s1][0] in _NAME_KINDS
                and toks[s1][1].lower() in _INT_TYPES
            ):
                x_ = sql[toks[s0][2]: toks[as_idx][2]].rstrip()
                if "try_cast" in x_.lower():
                    # our own emission on a re-read (or a user-nested
                    # try_cast, whose inner result is already
                    # integral) — no rounding is lost by skipping
                    return None
                t_spark = _INT_TYPES[toks[s1][1].lower()]
                # DECIMAL(38,9), not DOUBLE: exact for every int64
                # (a DOUBLE round-trip would corrupt
                # 9007199254740993) while still parsing and rounding
                # fractional strings; Spark round() on decimals is
                # half-away like duckdb ('-2.5' -> -3)
                edits.append(
                    (start, toks[close][3],
                     f"try_cast(round(try_cast(({x_}) AS "
                     f"DECIMAL(38,9))) AS {t_spark})")
                )
                return close + 1

    if name in _ORDER_INSENSITIVE_AGGS or name in (
        "first", "last", "arbitrary", "any_value",
    ):
        # duckdb allows ORDER BY inside EVERY aggregate call; Spark's
        # grammar rejects it. Order-insensitive aggregates drop the
        # clause; first/last with a single sort key become
        # min_by/max_by (DESC swaps); multi-key sorts are loud.
        spans, close = _call_arg_spans(toks, i + 1)
        if spans:
            # a multi-key ORDER BY's comma splits the clause across
            # argument spans — the ORDER BY owns everything from its
            # keyword to the closing paren
            ob = _find_depth0_order(toks, spans[0][0], spans[0][1])
            if ob is not None:
                multi_key = len(spans) > 1
                if name in _ORDER_INSENSITIVE_AGGS:
                    edits.append(
                        (toks[ob - 1][3] if ob > spans[0][0]
                         else toks[ob][2],
                         toks[spans[-1][1]][3], "")
                    )
                    return close + 1
                if multi_key:
                    raise TranspileError(
                        f"duckdb {name}(x ORDER BY multiple keys) has "
                        "no single min_by/max_by rewrite; sort with a "
                        "struct key"
                    )
                key_first = ob + 2
                key_last = spans[0][1]
                # consume an optional NULLS FIRST|LAST tail BEFORE the
                # ASC/DESC check (round-9 ADVICE: the unconsumed tail
                # leaked into min_by((x), (y NULLS LAST)) — invalid
                # Spark — and hid a preceding DESC). NULLS LAST is
                # duckdb's default null order, so it maps like the bare
                # form; NULLS FIRST would make first()/last() pick a
                # NULL-keyed row, which min_by/max_by (null-ignoring)
                # cannot express — loud.
                if (
                    key_last >= key_first + 1
                    and toks[key_last - 1][0] in _NAME_KINDS
                    and toks[key_last - 1][1].upper() == "NULLS"
                    and toks[key_last][0] in _NAME_KINDS
                    and toks[key_last][1].upper() in ("FIRST", "LAST")
                ):
                    if toks[key_last][1].upper() == "FIRST":
                        raise TranspileError(
                            f"duckdb {name}(x ORDER BY y NULLS FIRST) "
                            "selects a NULL-keyed row when one exists; "
                            "Spark's min_by/max_by ignore NULL keys — "
                            "no faithful rewrite"
                        )
                    key_last -= 2
                desc = False
                if (
                    toks[key_last][0] in _NAME_KINDS
                    and toks[key_last][1].upper() in ("ASC", "DESC")
                ):
                    desc = toks[key_last][1].upper() == "DESC"
                    key_last -= 1
                key_text = sql[toks[key_first][2]: toks[key_last][3]]
                if "," in key_text:
                    raise TranspileError(
                        f"duckdb {name}(x ORDER BY multiple keys) has "
                        "no single min_by/max_by rewrite; sort with a "
                        "struct key"
                    )
                val_text = sql[toks[spans[0][0]][2]: toks[ob][2]].rstrip()
                fn = ("max_by" if (name == "last") != desc else "min_by")
                # the key wrap is an IDENTITY (a NULL key stays NULL)
                # serving as the IF marker: duck first/last KEEP rows
                # with NULL values, so the round-10 max_by NULL-skip
                # handler must not re-wrap this emission (user-written
                # duck max_by/arg_max skip them — different contract)
                edits.append(
                    (start, toks[close][3],
                     f"{fn}(({val_text}), IF(({key_text}) IS NULL, "
                     f"NULL, ({key_text})))")
                )
                return close + 1






    if name == "split_part":
        # duckdb split_part with an EMPTY separator splits per
        # CHARACTER ('a|b|c','',2 → '|'), where pg (and Spark) treat
        # the whole string as one field; out-of-range indexes are ''.
        # try_element_at handles negatives-from-the-end like duck.
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 3
            and spans[1][0] == spans[1][1]
            and toks[spans[1][0]][0] == "string"
            and _literal_content(toks[spans[1][0]][1], "duckdb") == ""
        ):
            s_, n_3 = _arg_text(spans[0]), _arg_text(spans[2])
            edits.append(
                (start, toks[close][3],
                 f"coalesce(try_element_at(split(({s_}), ''), "
                 f"({n_3})), '')")
            )
            return close + 1

    if name == "approx_quantile":
        # duck approx_quantile (t-digest) → Spark approx_percentile
        # (GK sketch): same APPROXIMATE-quantile contract, different
        # algorithms — per-value parity is not promisable (documented
        # tolerance class, like the GK/HLL sketch operators); scalar
        # and array-of-fractions forms both exist on both sides.
        # Previously an UNRESOLVED_ROUTINE passthrough.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            edits.append(
                (start, toks[close][3],
                 f"approx_percentile(({_arg_text(spans[0])}), "
                 f"({_arg_text(spans[1])}))")
            )
            return close + 1
        raise TranspileError(
            "duckdb approx_quantile takes (value, quantile[s])"
        )
    if name == "reservoir_quantile":
        raise TranspileError(
            "duckdb reservoir_quantile (sampled quantile) has no "
            "Spark analog; use approx_quantile → approx_percentile "
            "or percentile_disc"
        )

    if name in ("unicode", "ord"):
        # duck unicode(s) / its ord alias: first code point, -1 for
        # the EMPTY string, NULL for NULL (pinned live, round 11).
        # Spark's ascii is the code-point function (ascii('λ') = 955)
        # but returns 0 on ''. Previously UNRESOLVED_ROUTINE
        # passthroughs.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 1:
            raise TranspileError(f"duckdb {name} takes 1 argument")
        x_ = _arg_text(spans[0])
        edits.append(
            (start, toks[close][3],
             f"IF(({x_}) = '', -1, ascii(({x_})))")
        )
        return close + 1

    if name in ("list_count", "array_count"):
        # duck list_count(l): non-NULL element count (list_count([1,
        # NULL, 3]) = 2, [] = 0, NULL list = NULL — pinned live;
        # previously an unresolved passthrough). size(NULL) is NULL
        # under Spark 3+ defaults, matching the NULL-list edge.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"size(filter(({x_}), _lc -> _lc IS NOT NULL))")
            )
            return close + 1

    if name == "to_timestamp":
        # duck to_timestamp(secs) — DOUBLE epoch seconds, fraction
        # kept (to_timestamp(1700000000.25) carries .25s — pinned
        # live). Spark's same-named function happens to accept
        # integer seconds but parses via its format machinery —
        # timestamp_seconds is the exact form.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3], f"timestamp_seconds(({x_}))")
            )
            return close + 1

    if name == "format":
        # duck fmt-'{}' formatting (round 11, pinned live): '{}'
        # sequential, '{N}' 0-BASED positional (repeats legal),
        # '{:spec}' with a width/.prec/type tail, '{{'/'}}' literal
        # braces, NULL argument → NULL result. Rewritten into duck
        # PRINTF-style text and re-spliced as printf(...) — the
        # printf handler on the next fixpoint pass adds the
        # NULL-guard struct bind and the %f DOUBLE casts. Positional
        # directives reorder the spliced argument list statically (a
        # repeated '{0}' references its expression twice — fine for
        # columns/literals). fill/align/sign specs stay loud.
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            not spans
            or spans[0][0] != spans[0][1]
            or toks[spans[0][0]][0] != "string"
        ):
            raise TranspileError(
                "duckdb format() needs a literal fmt string to "
                "transpile"
            )
        fc = _literal_content(toks[spans[0][0]][1], "duckdb")
        out_parts = []
        arg_order = []
        seq = 0
        pos = 0
        saw_pos = saw_seq = False
        while pos < len(fc):
            ch = fc[pos]
            if fc[pos:pos + 2] == "{{":
                out_parts.append("{"); pos += 2; continue
            if fc[pos:pos + 2] == "}}":
                out_parts.append("}"); pos += 2; continue
            if ch == "%":
                out_parts.append("%%"); pos += 1; continue
            if ch != "{":
                out_parts.append(ch); pos += 1; continue
            end_b = fc.find("}", pos)
            if end_b < 0:
                raise TranspileError(
                    "duckdb format(): unbalanced '{' in fmt string"
                )
            body = fc[pos + 1:end_b]
            idx_s, _, spec = body.partition(":")
            if idx_s.isdigit():
                argix = int(idx_s); saw_pos = True
            elif idx_s == "":
                argix = seq; seq += 1; saw_seq = True
            # (float-literal args to untyped fields checked below,
            # after the spec parse)
            else:
                raise TranspileError(
                    f"duckdb format() field {{{body}}} has no Spark "
                    "rewrite"
                )
            m_sp = re.fullmatch(
                r"(\d*)(\.\d+)?([dxXofeEgGs]?)", spec
            )
            if not m_sp:
                raise TranspileError(
                    f"duckdb format() spec {{{body}}} (fill/align/"
                    "sign forms) has no Spark rewrite"
                )
            width, prec, typ = m_sp.groups()
            if width and typ == "":
                # fmt width-only alignment is ARG-TYPE-dependent
                # (strings left, numbers right — pinned live);
                # printf cannot reproduce it without the type
                raise TranspileError(
                    f"duckdb format() width field {{{body}}} aligns "
                    "by argument type; add an explicit type ('10d', "
                    "'10s') to transpile"
                )
            if typ in ("g", "G"):
                raise TranspileError(
                    "duckdb format() {:g} is C shortest-form; Java's "
                    "%g always prints the precision digits — use "
                    "{:e} or {:f} explicitly"
                )
            if typ in ("", "s") and 0 <= argix < len(spans) - 1:
                asp = spans[1 + argix]
                if (
                    asp[0] == asp[1]
                    and toks[asp[0]][0] == "number"
                    and any(c in toks[asp[0]][1] for c in ".eE")
                ):
                    # fmt renders floats/decimals SHORTEST-form via
                    # double ('{}' of 1.50 is '1.5', of 1e-5 is
                    # '1e-05') where Spark's %s prints Java
                    # toString ('1.50', '1.0E-5') — the float→text
                    # rendering seam; loud for statically visible
                    # literals, float COLUMNS stay invisible (same
                    # residual as the pg float::text loud)
                    raise TranspileError(
                        "duckdb format() '{}' of a float/decimal "
                        "literal renders shortest-form (1.5 for "
                        "1.50); Spark's %s keeps Java rendering — "
                        "format explicitly with {:.Nf}"
                    )
            if typ == "s" and width:
                # fmt left-aligns strings; printf's %Ns right-aligns
                out_parts.append("%-" + width + (prec or "") + "s")
            else:
                out_parts.append(
                    "%" + width + (prec or "") + (typ or "s")
                )
            arg_order.append(argix)
            pos = end_b + 1
        if saw_pos and saw_seq:
            raise TranspileError(
                "duckdb format() mixing '{}' and '{N}' fields has "
                "no static rewrite; use one style"
            )
        if arg_order and (
            max(arg_order) >= len(spans) - 1
        ):
            raise TranspileError(
                "duckdb format(): field index exceeds the argument "
                "count"
            )
        new_fmt = _spark_string_literal("".join(out_parts), "duckdb")
        args_txt = "".join(
            f", ({_arg_text(spans[1 + ix])})" for ix in arg_order
        )
        edits.append(
            (start, toks[close][3], f"printf({new_fmt}{args_txt})")
        )
        return close + 1

    if name == "printf":
        # duckdb printf returns NULL when ANY argument is NULL; Spark's
        # printf renders 'null' into the string (probe: printf('%s-%s',
        # 'a', NULL) = NULL vs 'a-null'). Bind args once in a struct and
        # NULL-guard; the `_pf` lambda var marks our own emission so
        # re-reads skip (args are _pf._pN dotted idents).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) >= 2:
            own = all(
                sp[1] == sp[0] + 2
                and toks[sp[0]][0] in _NAME_KINDS
                and toks[sp[0]][1] == "_pf"
                and toks[sp[0] + 1][0] == "op" and toks[sp[0] + 1][1] == "."
                for sp in spans[1:]
            )
            if not own:
                fmt = _arg_text(spans[0])
                # float-directive args cast to DOUBLE (round 11): a
                # DECIMAL literal/column through Spark's %f dies at
                # RUNTIME with a bare Java IllegalFormatConversion
                # ('f != Decimal') — duck's printf formats decimals
                # fine. Only resolvable for a LITERAL format string
                # whose directive count matches the arg count;
                # integer directives stay uncast (%d of a decimal is
                # duck-rejected — pinned ENGINE_ERR).
                convs = None
                if (
                    spans[0][0] == spans[0][1]
                    and toks[spans[0][0]][0] == "string"
                ):
                    fc = _literal_content(toks[spans[0][0]][1], "duckdb")
                    convs = [
                        m.group(1)
                        for m in re.finditer(
                            r"%[-+ #0']*\d*(?:\.\d+)?([a-zA-Z])",
                            fc.replace("%%", ""),
                        )
                    ]
                    if any(c in ("g", "G") for c in convs):
                        # C %g prints shortest-form ('1e-05'); Java's
                        # %g ALWAYS prints the precision digits
                        # ('1.00000e-05') — pinned live, round 11
                        raise TranspileError(
                            "duckdb printf %g is C shortest-form; "
                            "Java's %g always prints the precision "
                            "digits — use %e or %f explicitly"
                        )
                    if len(convs) != len(spans) - 1:
                        convs = None
                def _bind(k, sp):
                    a_ = _arg_text(sp)
                    if convs is not None and convs[k] in "feEgG":
                        return f"(CAST(({a_}) AS DOUBLE)) AS _p{k}"
                    return f"({a_}) AS _p{k}"
                binds = ", ".join(
                    _bind(k, sp) for k, sp in enumerate(spans[1:])
                )
                guard = " OR ".join(
                    f"_pf._p{k} IS NULL" for k in range(len(spans) - 1)
                )
                vals = ", ".join(
                    f"_pf._p{k}" for k in range(len(spans) - 1)
                )
                edits.append(
                    (start, toks[close][3],
                     f"element_at(transform(array(struct({binds})), "
                     f"_pf -> CASE WHEN {guard} THEN NULL ELSE "
                     f"printf(({fmt}), {vals}) END), 1)")
                )
                return close + 1

    if name == "hash":
        # probe-verified silent divergence: duckdb hash(42) =
        # 7199933130570745587 (64-bit internal hash), Spark hash(42) =
        # 29417773 (32-bit Murmur3) — same name, DIFFERENT algorithm,
        # and hash values feed bucketing/sampling/fingerprint logic.
        # No faithful mapping exists; loud with guidance.
        raise TranspileError(
            "duckdb hash() is a 64-bit engine-internal hash with no "
            "Spark equivalent (Spark hash() is 32-bit Murmur3 — same "
            "name, different values); use xxhash64()/md5() on both "
            "sides and re-pin expectations"
        )





    if name == "columns":
        # COLUMNS('regex') / COLUMNS(*) star expressions need the
        # table's column list, which a textual transpiler doesn't have
        raise TranspileError(
            "duckdb COLUMNS(...) dynamic column selection has no "
            "Spark star modifier; list the columns explicitly"
        )







    # (duck 2-arg reduce — seeded with the first element — is mapped in
    # duckdb_hofs.py since round 11, dispatched ahead of this module)

    # ---- round-10 same-name collision sweep (duck ∩ Spark names with
    # different semantics, found by mechanically probing every shared
    # catalog signature — the hash()/element_at class)

    if name in ("max_by", "min_by", "arg_max", "arg_min"):
        # duck SKIPS rows whose VALUE argument is NULL (max_by over
        # (1,2),(NULL,4) = 1 — pinned live); Spark's max_by keeps them
        # (returns NULL here). NULLing the ordering key for NULL-value
        # rows makes Spark ignore them identically (both engines
        # already ignore NULL keys). IF-first-token marker keeps
        # re-reads inert. duck's arg_max_null (which KEEPS NULLs —
        # Spark's exact behavior) is loud below rather than risking
        # this handler re-wrapping its plain emission.
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 2
            and not (
                toks[spans[1][0]][0] in _NAME_KINDS
                and toks[spans[1][0]][1].upper() == "IF"
            )
        ):
            a_, b_ = _arg_text(spans[0]), _arg_text(spans[1])
            fn2 = "max_by" if name in ("max_by", "arg_max") else "min_by"
            edits.append(
                (start, toks[close][3],
                 f"{fn2}(({a_}), IF(({a_}) IS NULL, NULL, ({b_})))")
            )
            return close + 1



    if name in ("to_years", "to_months", "to_quarters", "to_decades",
                "to_centuries", "to_millennia", "to_days", "to_weeks",
                "to_hours", "to_minutes", "to_seconds",
                "to_milliseconds", "to_microseconds"):
        # duck's interval constructors (to_days(3) = INTERVAL 3 DAY —
        # round-10 duck-only-name sweep; previously unresolved) map to
        # Spark's typed interval builders: year-month units through
        # make_ym_interval, day-time through make_dt_interval (both
        # accept expressions; sub-second units scale into the seconds
        # argument).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = f"({_arg_text(spans[0])})"
            ym = {"to_years": f"make_ym_interval({x_})",
                  "to_decades": f"make_ym_interval({x_} * 10)",
                  "to_centuries": f"make_ym_interval({x_} * 100)",
                  "to_millennia": f"make_ym_interval({x_} * 1000)",
                  "to_months": f"make_ym_interval(0, {x_})",
                  "to_quarters": f"make_ym_interval(0, {x_} * 3)"}
            dt = {"to_days": f"make_dt_interval({x_})",
                  "to_weeks": f"make_dt_interval({x_} * 7)",
                  "to_hours": f"make_dt_interval(0, {x_})",
                  "to_minutes": f"make_dt_interval(0, 0, {x_})",
                  "to_seconds": f"make_dt_interval(0, 0, 0, {x_})",
                  "to_milliseconds":
                      f"make_dt_interval(0, 0, 0, {x_} / 1000)",
                  "to_microseconds":
                      f"make_dt_interval(0, 0, 0, {x_} / 1000000)"}
            repl = ym.get(name) or dt.get(name)
            edits.append((start, toks[close][3], repl))
            return close + 1

    if name in ("arg_max_null", "arg_min_null"):
        raise TranspileError(
            f"duckdb {name} KEEPS NULL values — that is exactly Spark "
            f"{'max_by' if 'max' in name else 'min_by'}; spell it that "
            "way (duck max_by/arg_max skip NULLs and are rewritten)"
        )

    if name in ("max_by", "min_by", "arg_max", "arg_min", "min", "max"):
        # duck's top-N aggregate forms — min(x, n) / arg_min(a, v, n) —
        # return a LIST of the n extreme values; Spark's min/min_by are
        # fixed-arity and the blanket arg_min → min_by rename would
        # otherwise ship an invalid 3-arg min_by (round-11 probe).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == (3 if name not in ("min", "max") else 2):
            raise TranspileError(
                f"duckdb top-N {name}(..., n) returns a LIST of the n "
                "extreme values; Spark has no top-N aggregate — spell "
                "it slice(sort_array(collect_list(struct(key, val))), "
                "1, n) and project the value field"
            )

    if name in ("kurtosis_pop", "sem", "product", "fsum", "kahan_sum",
                "sumkahan", "favg"):
        # round-11 duck statistical-aggregate tier, each pinned live:
        #   kurtosis_pop  — POPULATION excess kurtosis, which is
        #                   exactly Spark's kurtosis() (-0.7696 on
        #                   [1,2,3,10] both engines); the try_divide
        #                   identity wrap is the marker that keeps the
        #                   duck sample-kurtosis correction handler
        #                   (standard.py) off the emission on re-reads
        #   sem           — standard error of the mean over the
        #                   POPULATION stddev (sem([1,2,3,10]) =
        #                   1.7678 = stddev_pop/sqrt(n), NOT
        #                   stddev_samp; single row → 0.0, empty →
        #                   NULL, matched by try_divide's NULL on
        #                   sqrt(0))
        #   product       — NULL-skipping product, DOUBLE result,
        #                   empty/all-NULL → NULL, zero keeps the SIGN
        #                   of the remaining factors (2.5*0*-4 = -0.0
        #                   pinned); exp/ln with a count_if sign+zero
        #                   guard — last-ulp rounding class, same
        #                   posture as the kurtosis corrections
        #   fsum/kahan_sum/sumkahan/favg — Kahan-compensated sum/avg;
        #                   plain sum/avg over DOUBLE is the same
        #                   value class (fsum of INTs is DOUBLE 3.0,
        #                   pinned — hence the cast)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = f"({_arg_text(spans[0])})"
            # a trailing FILTER (WHERE pred) folds into the argument
            # as IF(pred, x, NULL) — these emissions are multi-
            # aggregate CASE/try_divide compositions a syntactic
            # FILTER cannot attach to (wave-64 composition find);
            # every inner aggregate skips the introduced NULLs,
            # which IS the row-filter semantics
            fend = close
            if (
                close + 2 < len(toks)
                and toks[close + 1][0] in _NAME_KINDS
                and toks[close + 1][1].upper() == "FILTER"
                and toks[close + 2][0] == "op"
                and toks[close + 2][1] == "("
            ):
                fspans, fclose = _call_arg_spans(toks, close + 2)
                f0 = fspans[0][0] if fspans else None
                if (
                    len(fspans) == 1
                    and toks[f0][0] in _NAME_KINDS
                    and toks[f0][1].upper() == "WHERE"
                ):
                    pred = _arg_text((f0 + 1, fspans[0][1]))
                    x_ = f"(IF(({pred}), {x_}, NULL))"
                    fend = fclose
            close = fend
            if name == "kurtosis_pop":
                repl = f"try_divide(kurtosis({x_}), 1.0)"
            elif name == "sem":
                repl = f"try_divide(stddev_pop({x_}), sqrt(count({x_})))"
            elif name == "product":
                sign_ = (f"IF(pmod(count_if({x_} < 0), 2) = 1, "
                         "-1.0D, 1.0D)")
                repl = (
                    f"(CASE WHEN count({x_}) = 0 THEN "
                    "CAST(NULL AS DOUBLE) "
                    f"WHEN count_if({x_} = 0) > 0 THEN 0.0D * {sign_} "
                    f"ELSE exp(sum(ln(abs(CAST({x_} AS DOUBLE))))) "
                    f"* {sign_} END)"
                )
            elif name == "favg":
                repl = f"avg(CAST({x_} AS DOUBLE))"
            else:
                repl = f"sum(CAST({x_} AS DOUBLE))"
            edits.append((start, toks[close][3], repl))
            return close + 1

    if name in ("least", "greatest"):
        # duck accepts ONE argument (identity); Spark requires > 1
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1 and not _brace_unbalanced(toks, spans[0]):
            edits.append(
                (start, toks[close][3], f"({_arg_text(spans[0])})")
            )
            return close + 1

    if name in ("to_binary", "bin"):
        # duck to_binary IS bin (number → binary-digit STRING,
        # to_binary(3) = '11'); Spark's to_binary(3) is the BYTES
        # b'\x03' — a silent type+value change. For VARCHAR input duck
        # renders the UTF-8 bytes as one long bit string (pinned:
        # bin('aB cd') = '01100001…'), which Spark's bin (bigint cast)
        # cannot express — statically-string args are loud; column
        # args of string type fail loudly downstream under ANSI.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            if (
                spans[0][0] == spans[0][1]
                and toks[spans[0][0]][0] == "string"
            ):
                raise TranspileError(
                    f"duckdb {name}(varchar) renders the UTF-8 bytes "
                    "as a bit string; Spark's bin is numeric-only — "
                    "no faithful rewrite"
                )
            if name == "to_binary":
                edits.append((start, toks[i][3], "bin"))
                return i + 1

    if name == "make_timestamp":
        # 1-arg duck make_timestamp(micros) == Spark timestamp_micros
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            edits.append(
                (start, toks[close][3],
                 f"timestamp_micros(({_arg_text(spans[0])}))")
            )
            return close + 1

    if name == "make_time":
        raise TranspileError(
            "duckdb make_time builds a TIME value; Spark has no TIME "
            "type — store seconds-since-midnight or a timestamp"
        )

    if name in ("encode", "decode"):
        # duck 1-arg encode(varchar)→blob / decode(blob)→varchar are
        # UTF-8 conversions; Spark's 2-arg forms match with an
        # explicit charset. (2-arg calls are already Spark-shaped.)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            edits.append(
                (start, toks[close][3],
                 f"{name}(({_arg_text(spans[0])}), 'UTF-8')")
            )
            return close + 1

    if name == "repeat":
        # duck repeat over a BLOB returns a BLOB; Spark's repeat
        # coerces binary to STRING — a silent type change for
        # statically-binary args (round-10 sweep)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_txt = _arg_text(spans[0]).lower()
            if a_txt.endswith(("::blob", "::binary")):
                raise TranspileError(
                    "duckdb repeat(blob, n) returns BINARY; Spark's "
                    "repeat returns STRING — concat the blob "
                    "explicitly or repeat before encoding"
                )

    if name in ("length", "len"):
        # duck length/len of a LIST is its cardinality; Spark's length
        # is string/binary-only. Statically-visible list operands
        # (array literal or constructor) emit size(); column args stay
        # (strings are the common case and a list column fails loudly).
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 1
            and toks[spans[0][0]][0] == "op"
            and toks[spans[0][0]][1] == "["
        ) or (
            len(spans) == 1
            and toks[spans[0][0]][0] in _NAME_KINDS
            and toks[spans[0][0]][1].lower() in (
                "array", "list_value", "list_sort", "list_distinct",
                "string_split", "string_to_array", "split",
            )
        ):
            edits.append(
                (start, toks[close][3],
                 f"size(({_arg_text(spans[0])}))")
            )
            return close + 1

    if name in ("year", "month", "day", "hour", "minute", "second",
                "quarter", "weekday", "dayofmonth", "dayofweek",
                "millisecond", "microsecond", "century", "decade",
                "millennium", "epoch"):
        # field functions over INTERVAL LITERAL operands (year(INTERVAL
        # 26 MONTH) = 2 — pinned live) have no Spark form (Spark's
        # extract rejects intervals for these spellings); statically
        # evaluate through the shared interval-parts machinery — both
        # the INTERVAL '2 days' and INTERVAL 2 DAY spellings. Only
        # fires when the argument STARTS with the INTERVAL keyword
        # (date/timestamp args pass through to Spark's builtins).
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 1
            and toks[spans[0][0]][0] in _NAME_KINDS
            and toks[spans[0][0]][1].upper() == "INTERVAL"
        ):
            from sqlmesh_spark.core.dialects.standard_edges import (
                _pg_interval_field,
            )
            from sqlmesh_spark.core.transpile_text import (
                _pg_interval_parts,
            )

            s0, s1 = spans[0]
            if s1 == s0 + 1 and toks[s1][0] == "string":
                lit = _literal_content(toks[s1][1], "duckdb")
            else:
                lit = sql[toks[s0][3]: toks[s1][3]].strip()
            parts = _pg_interval_parts(lit.lower())
            val = (
                _pg_interval_field(name, parts)
                if parts is not None else None
            )
            if val is None:
                raise TranspileError(
                    f"duckdb {name}(INTERVAL {lit!r}) is not "
                    "statically evaluable; use day-time units"
                )
            edits.append((start, toks[close][3], repr(val)))
            return close + 1


    if name in ("split", "string_split", "str_split"):
        # duck's NULL separator leaves the string UNSPLIT (split('aB',
        # NULL) = ['aB']; NULL source stays NULL — pinned live, NULL
        # sweep); Spark's split returns NULL. Literal-NULL separators
        # rewrite; NULL separator VALUES in columns are statically
        # invisible (documented). NOTE: pg string_to_array's NULL
        # separator splits per CHARACTER — different engine, different
        # handler.
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 2
            and spans[1][0] == spans[1][1]
            and toks[spans[1][0]][0] in _NAME_KINDS
            and toks[spans[1][0]][1].upper() == "NULL"
        ):
            s0_ = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"IF(({s0_}) IS NULL, NULL, array(({s0_})))")
            )
            return close + 1

    if name == "isnan":
        # duck isnan(NULL) is NULL; Spark's is false (round-10 NULL
        # sweep). Skip args already CAST(... AS DOUBLE) — that shape
        # is this handler's own emission (and isfinite's), keeping
        # fixpoint re-reads inert.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1 and not (
            toks[spans[0][0]][0] in _NAME_KINDS
            and toks[spans[0][0]][1].upper() == "CAST"
        ):
            x_ = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"(CASE WHEN ({x_}) IS NULL THEN NULL ELSE "
                 f"isnan(CAST(({x_}) AS DOUBLE)) END)")
            )
            return close + 1

    if name in ("century", "decade", "millennium", "isoyear",
                "yearofweek", "isodow", "julian"):
        # duckdb exposes the date-part fields as FUNCTIONS too; route
        # through the shared field templates. (dayofyear is NOT routed:
        # its template spells dayofyear() — Spark's identical builtin —
        # and routing it re-dispatched forever; round-10 sweep)
        from sqlmesh_spark.core.dialects.standard_edges import (
            _DP_FIELD_TEMPLATES,
        )
        tmpl = _DP_FIELD_TEMPLATES.get(name)
        if tmpl is not None:
            spans, close = _call_arg_spans(toks, i + 1)
            if len(spans) == 1:
                edits.append(
                    (start, toks[close][3],
                     tmpl.format(x=f"({_arg_text(spans[0])})"))
                )
                return close + 1


    if name in ("date_part", "datepart"):
        # duckdb's LIST-of-parts form returns a STRUCT of fields —
        # loud before Spark's non-foldable-argument error
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 2
            and toks[spans[0][0]][0] == "op"
            and toks[spans[0][0]][1] == "["
        ):
            raise TranspileError(
                "duckdb date_part([...parts], x) returns a STRUCT of "
                "fields; extract each field with its own date_part"
            )

    if name in ("isinf", "isfinite"):
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = _arg_text(spans[0])
            if name == "isinf":
                repl = (
                    f"(abs(CAST(({x_}) AS DOUBLE)) = "
                    f"CAST('Infinity' AS DOUBLE))"
                )
            else:
                repl = (
                    f"(CASE WHEN ({x_}) IS NULL THEN NULL ELSE "
                    f"NOT (isnan(CAST(({x_}) AS DOUBLE)) OR "
                    f"abs(CAST(({x_}) AS DOUBLE)) = "
                    f"CAST('Infinity' AS DOUBLE)) END)"
                )
            edits.append((start, toks[close][3], repl))
            return close + 1

    if name == "xor":
        # single-evaluation and/or/not composition (emitting Spark's
        # `^` would be re-read as duckdb POWER on the next pass)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, b_ = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"element_at(transform(array(struct(({a_}) AS _x, "
                 f"({b_}) AS _y)), _t -> (_t._x | _t._y) & "
                 f"~ (_t._x & _t._y)), 1)")
            )
            return close + 1

    if name == "to_base":
        # to_base(x, radix[, min_length]) — UPPERCASE digits, exactly
        # Spark's conv(x, 10, radix); min_length zero-pads
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) in (2, 3):
            x_, r_ = _arg_text(spans[0]), _arg_text(spans[1])
            repl = f"conv(({x_}), 10, ({r_}))"
            if len(spans) == 3:
                repl = f"lpad({repl}, ({_arg_text(spans[2])}), '0')"
            edits.append((start, toks[close][3], repl))
            return close + 1

    if name == "epoch_ns":
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            edits.append(
                (start, toks[close][3],
                 f"(unix_micros(CAST(({_arg_text(spans[0])}) AS "
                 f"TIMESTAMP)) * 1000)")
            )
            return close + 1

    if name == "yearweek":
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = f"({_arg_text(spans[0])})"
            edits.append(
                (start, toks[close][3],
                 f"CAST(extract(YEAROFWEEK FROM {x_}) * 100 + "
                 f"weekofyear({x_}) AS BIGINT)")
            )
            return close + 1


    if name in ("add", "subtract", "multiply"):
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1 and name in ("add", "subtract"):
            # 1-arg duck forms are identity / negation (pinned live)
            sign = "" if name == "add" else "-"
            edits.append(
                (start, toks[close][3],
                 f"({sign}({_arg_text(spans[0])}))")
            )
            return close + 1
        if len(spans) == 2:
            op = {"add": "+", "subtract": "-", "multiply": "*"}[name]

            def _starts(sp, kw):
                return (
                    toks[sp[0]][0] in _NAME_KINDS
                    and toks[sp[0]][1].upper() == kw
                )
            # the paren-wrapped emission hides the operands from the
            # DATE-typed token handlers (round-10 duck-only sweep), so
            # the date seams re-apply here: DATE - DATE is INTEGER
            # days; DATE ± INTERVAL promotes to TIMESTAMP
            if (
                name == "subtract"
                and _starts(spans[0], "DATE")
                and _starts(spans[1], "DATE")
            ):
                edits.append(
                    (start, toks[close][3],
                     f"datediff({_arg_text(spans[0])}, "
                     f"{_arg_text(spans[1])})")
                )
                return close + 1
            a_, b_ = _arg_text(spans[0]), _arg_text(spans[1])
            if name in ("add", "subtract") and (
                _starts(spans[0], "DATE") and _starts(spans[1], "INTERVAL")
            ):
                a_ = f"CAST({a_} AS TIMESTAMP)"
            elif name == "add" and (
                _starts(spans[0], "INTERVAL") and _starts(spans[1], "DATE")
            ):
                b_ = f"CAST({b_} AS TIMESTAMP)"
            edits.append(
                (start, toks[close][3], f"(({a_}) {op} ({b_}))")
            )
            return close + 1





    if name in ("list_slice", "array_slice"):
        # 1-based INCLUSIVE bounds, negatives from the end, clamping.
        # Literal same-sign bounds rewrite (length = e - b + 1 and
        # Spark slice clamps + shares the negative-start meaning);
        # mixed-sign or dynamic bounds have no one-expression rewrite.
        # A statically-STRING first argument (round 10: duck slices
        # VARCHAR with the same semantics — array_slice('hello', 2, 4)
        # = 'ell' pinned live) emits substring, which shares the clamp
        # AND the negative-start meaning; Spark's slice() is
        # array-only and was a type error here.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 3:
            def _lit_int(sp):
                s0, s1 = sp
                if s0 == s1 and toks[s0][0] == "number":
                    return int(toks[s0][1])
                if (
                    s1 == s0 + 1
                    and toks[s0][0] == "op" and toks[s0][1] == "-"
                    and toks[s1][0] == "number"
                ):
                    return -int(toks[s1][1])
                return None
            b = _lit_int(spans[1])
            e = _lit_int(spans[2])
            if (
                b is not None and e is not None
                and b != 0
                and (b > 0) == (e > 0)
            ):
                length = max(e - b + 1, 0)
                if (
                    spans[0][0] == spans[0][1]
                    and toks[spans[0][0]][0] == "string"
                ):
                    # keyword FROM/FOR form: inert on fixpoint re-reads
                    # (the 3-arg comma form would be rewrapped by the
                    # duck substring fidelity handler)
                    edits.append(
                        (start, toks[close][3],
                         f"substring(({_arg_text(spans[0])}) "
                         f"FROM {b} FOR {length})")
                    )
                else:
                    edits.append(
                        (start, toks[close][3],
                         f"slice(({_arg_text(spans[0])}), {b}, {length})")
                    )
                return close + 1
            raise TranspileError(
                f"{name} maps only for literal same-sign bounds; "
                "mixed-sign or dynamic bounds have no Spark slice() "
                "rewrite"
            )

    return None
