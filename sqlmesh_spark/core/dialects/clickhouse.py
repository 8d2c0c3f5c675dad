"""ClickHouse read-dialect function maps, token fixes and call handlers.

Split out of core/transpile.py (round 6): the walker in
core/transpile.py dispatches into this module's handler functions; see
TokenCtx in core/transpile_shared.py for the contract. Handler bodies
are the pre-split code verbatim (continue -> return i), so every
file:line reference in docstrings and VERDICT history still applies.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _emit_infix_call,
    _emit_iso_dow,
    _NAME_KINDS,
    _ident_text,
    _call_arg_spans,
    _EXPR_KEYWORDS,
)
from sqlmesh_spark.core.dialects import clickhouse_residual as _chres
from sqlmesh_spark.core.transpile_text import (
    _resolve_unit,
    convert_ch_format,
    _regex_literal,
    _spark_string_literal,
    _literal_content,
    _regex_replacement_to_spark,
)

_CLICKHOUSE_FN: dict[str, str | None] = {
    # concatAssumeInjective is concat with an optimizer hint Spark
    # doesn't need (round 11)
    "concatassumeinjective": "concat",
    # temporal
    "now": "current_timestamp",
    "today": "current_date",
    "yesterday": None,                  # handler: date_sub(current_date(), 1)
    "toyear": "year", "tomonth": "month",
    "todayofmonth": "dayofmonth", "todayofyear": "dayofyear",
    "tohour": "hour", "tominute": "minute", "tosecond": "second",
    "toquarter": "quarter",
    "todayofweek": None,                # handler: ISO Monday=1
    "tomonday": None,                   # handler
    "tolastdayofmonth": "last_day",
    "tounixtimestamp": "unix_timestamp",
    "fromunixtimestamp": None,          # handler → timestamp_seconds
    "formatdatetime": None,             # handler (%-codes, CH table)
    "parsedatetime": None,              # MySQL-syntax but %M differs by
                                        # server version → loud
    "parsedatetimebesteffort": None,
    "tostartofweek": None,              # mode-dependent (default SUNDAY
                                        # weeks) — date_trunc is Monday
    "totimezone": None,
    # toStartOf{Year,Quarter,Month,Day,Hour,Minute} / toYYYYMM[DD] /
    # date_add / dateDiff / addDays family: handlers below.
    # string
    # length and reverse are LOUD via first_pass handlers below (their
    # Spark-named rewrites length()/reverse() must survive later fixpoint
    # passes): CH length is BYTES for strings / size for arrays; CH
    # reverse is byte-wise (garbled UTF-8). Use lengthUTF8 / reverseUTF8.
    "lengthutf8": "length",
    "lowerutf8": "lower", "upperutf8": "upper",
    "trimleft": "ltrim", "trimright": "rtrim", "trimboth": "trim",
    "reverseutf8": "reverse",
    "replaceall": "replace",
    "replaceone": None,                 # first-only; Spark replaces all
    "replaceregexpall": None,           # handler (\1 backrefs → $1)
    "replaceregexpone": None,           # first-only
    "match": "regexp_like",             # RE2 partial match = rlike search
    "position": None,                   # handler: CH is (haystack,
                                        # needle) — Spark position() is
                                        # REVERSED; instr matches CH
    "positioncaseinsensitive": None,
    "locate": None,                     # arg order flipped across CH
                                        # versions (24.x) → loud
    # extract: handler below (comma form is a regex fragment match; the
    # EXTRACT(field FROM x) grammar form passes through)
    "splitbychar": None,                # handler (arg swap + regex escape)
    "splitbystring": None,              # handler
    "splitbyregexp": None,              # handler (arg swap, regex kept)
    "concatws": "concat_ws",
    "leftpad": "lpad", "rightpad": "rpad",
    "base64encode": "base64", "base64decode": "unbase64",
    "trybase64decode": None,
    "md5": None,                        # returns FixedString(16) BINARY;
    "sha1": None, "sha224": None,       # Spark returns hex STRING
    "sha256": None, "sha512": None,
    "empty": None, "notempty": None,    # strings AND arrays → ambiguous
    # conditional / misc
    "multiif": None,                    # handler → CASE
    "assumenotnull": None,              # handler: unwrap to the arg
    "tonullable": None,                 # handler: unwrap
    "tolowcardinality": None,           # handler: unwrap
    "any": "any_value",                 # CH any() is first-value — NOT
                                        # Spark's bool_or-style any()!
    "anylast": "any_value",
    "anyheavy": None,
    # rand is a first_pass handler below (CH rand() is a random UInt32,
    # not a [0,1) float; the rewrite's own inner rand() must survive
    # later passes)
    "rand64": None, "randcanonical": "rand",
    "least": None, "greatest": None,    # NULL-propagation differs
    "intdiv": None,                     # handler → (a DIV b)
    "intdivorzero": None,
    "modulo": "mod",
    "moduloorzero": None,
    "plus": None, "minus": None,        # handlers → operators
    "multiply": None, "divide": None,
    "roundbankers": "bround",
    "todecimal32": None, "todecimal64": None, "todecimal128": None,
    "toint128": None, "toint256": None,  # exceed DECIMAL(38,0)'s range
    "touint128": None, "touint256": None,
    "tofixedstring": None,
    # uniqexact: handler below (count(DISTINCT ...), round 11)
    "tuple": "struct",
    "tupleelement": None,               # 1-based positional field access
    "arrayelement": None,               # returns the TYPE DEFAULT (0, '')
                                        # out of bounds, not NULL
    # aggregates
    "uniq": "approx_count_distinct",
    "uniqcombined": None, "uniqhll12": None, "uniqtheta": None,
    "grouparray": "collect_list",
    "groupuniqarray": "collect_set",
    "argmax": "max_by", "argmin": "min_by",
    "countif": "count_if",
    # round 11 residual sweep: bit shifts + nulls
    "bitshiftleft": "shiftleft",
    "bitshiftright": "shiftright",
    "sumif": None, "avgif": None,       # handlers → agg(if(cond, x, NULL))
    "minif": None, "maxif": None,
    "quantile": None, "quantileexact": None,   # parameterized-combinator
    "median": "median",                 # gate-free: Spark median (3.4+)
    "corrstable": "corr", "covarpopstable": "covar_pop",
    "covarsampstable": "covar_samp",
    "stddevpop": "stddev_pop", "stddevsamp": "stddev_samp",
    "varpop": "var_pop", "varsamp": "var_samp",
    # arrays (CH higher-order functions take the LAMBDA FIRST)
    "arrayjoin": "explode",
    "has": "array_contains",
    "indexof": "array_position",
    "arraydistinct": "array_distinct",
    "arrayconcat": "concat",
    "arrayslice": "slice",
    "arrayreverse": "reverse",
    "arrayflatten": "flatten",
    "arraycompact": None,
    "arrayzip": "arrays_zip",
    "arraymap": None, "arrayfilter": None,      # handlers (lambda swap)
    "arrayexists": None, "arrayall": None,      # handlers
    "arraysort": None,                          # handler (1-arg ok)
    "arraysum": None, "arrayavg": None,
    "arraymin": "array_min", "arraymax": "array_max",
    "arraystringconcat": "array_join",
    "arrayenumerate": None,
    "emptyarraystring": None, "emptyarrayint64": None,
    # json
    "jsonextractstring": None,          # handler → get_json_object
    "jsonextractint": None, "jsonextractfloat": None,   # handlers (+CAST)
    "jsonextractbool": None,
    "jsonextractraw": None, "jsonextractarrayraw": None,
    "jsonhas": None, "jsonlength": None,
    "visitparamextractstring": None, "visitparamextractraw": None,
    # type conversions: handlers (toString/toDate/toInt.../toFloat...)
}

#: ClickHouse to<Type>(x) conversion functions → Spark CAST target.
#: Unsigned types widen to stay representable (same rule as the MySQL
#: UNSIGNED and T-SQL TINYINT mappings).
_CH_CAST_FN = {
    "tostring": "STRING",
    "todate": "DATE", "todate32": "DATE",
    "todatetime": "TIMESTAMP", "todatetime64": "TIMESTAMP",
    "toint8": "TINYINT", "toint16": "SMALLINT",
    "toint32": "INT", "toint64": "BIGINT",
    # toInt128 absent on purpose: Int128's range exceeds DECIMAL(38,0)
    "touint8": "SMALLINT", "touint16": "INT",
    "touint32": "BIGINT", "touint64": "DECIMAL(20,0)",
    "tofloat32": "FLOAT", "tofloat64": "DOUBLE",
    "tobool": "BOOLEAN",
}

#: ClickHouse addDays/subtractDays family → timestampadd unit (+negation).
#: Arg order flips: addDays(date, n) → timestampadd(DAY, n, date).
#: Type caveat (documented, not statically fixable — same as the
#: snowflake/tsql DATEADD handler): the source returns its operand's
#: type (Date in → Date out) while timestampadd always returns
#: TIMESTAMP; values are correct, a Date operand gains 00:00:00.
_CH_ADD_FN = {
    "addyears": ("YEAR", False), "addquarters": ("QUARTER", False),
    "addmonths": ("MONTH", False), "addweeks": ("WEEK", False),
    "adddays": ("DAY", False), "addhours": ("HOUR", False),
    "addminutes": ("MINUTE", False), "addseconds": ("SECOND", False),
    "subtractyears": ("YEAR", True), "subtractquarters": ("QUARTER", True),
    "subtractmonths": ("MONTH", True), "subtractweeks": ("WEEK", True),
    "subtractdays": ("DAY", True), "subtracthours": ("HOUR", True),
    "subtractminutes": ("MINUTE", True), "subtractseconds": ("SECOND", True),
}

#: ClickHouse toStartOf<unit> → date_trunc unit; the date-valued ones
#: re-wrap in a DATE cast (CH returns Date, date_trunc a timestamp).
_CH_TRUNC_FN = {
    "tostartofyear": ("year", True),
    "tostartofquarter": ("quarter", True),
    "tostartofmonth": ("month", True),
    "tomonday": ("week", True),         # ISO Monday weeks in both
    "tostartofday": ("day", False),
    "tostartofhour": ("hour", False),
    "tostartofminute": ("minute", False),
}

#: Trino url_extract_* → Spark parse_url(url, PART) part keyword.


def token_handlers(ctx) -> "int | None":
    """Walker-level (non-call) token handlers (pre-split code, verbatim)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, first_pass, is_op, _arg_text, transpile, n)
    if read == "clickhouse" and kind == "op" and text == "?":
        raise TranspileError(
            "clickhouse ternary `cond ? a : b` has no token-level "
            "Spark rewrite; use if(cond, a, b)"
        )

    if read == "clickhouse" and kind == "ident":
        up_ = text.upper()
        # PREWHERE is WHERE plus a storage-level early-filter hint;
        # Spark would read the keyword as a table alias. Rewrite to
        # WHERE — but ONLY in FROM-target position (walk back over
        # `[AS] alias` + a dotted path / subquery close to FROM), so
        # a column or alias named prewhere never corrupts; those and
        # post-join placements raise with guidance instead. If the
        # query also has its own WHERE, the doubled keyword fails
        # Spark's parser (loud, never silent).
        if up_ == "PREWHERE":
            j = i - 1
            pw_ok = False
            for _hop in range(10):
                if j < 0:
                    break
                tk_, tv_ = toks[j][0], toks[j][1]
                if tk_ == "op" and tv_ == ")":
                    pw_ok = True  # subquery close in FROM
                    break
                if tk_ == "ident" and tv_.upper() == "FROM":
                    pw_ok = True
                    break
                if tk_ == "ident" and tv_.upper() == "AS":
                    j -= 1
                    continue
                if tk_ in _NAME_KINDS and tv_.upper() not in _EXPR_KEYWORDS:
                    j -= 1
                    if j >= 0 and toks[j][0] == "op" and toks[j][1] == ".":
                        j -= 1
                    continue
                break
            if not pw_ok:
                raise TranspileError(
                    "PREWHERE outside FROM-target position has no "
                    "safe rewrite; move the condition into WHERE, or "
                    "quote the identifier if a column is named "
                    "prewhere"
                )
            edits.append((start, end, "WHERE"))
            i += 1
            return i
        # FROM t FINAL forces merge-time dedup; Spark would silently
        # read FINAL as a table alias, dropping the semantic. A column
        # genuinely named final can be backtick/double-quoted.
        if up_ == "FINAL" and not is_op(i + 1, "("):
            raise TranspileError(
                "clickhouse FINAL has no Spark rewrite (deduplicate "
                "explicitly, e.g. ROW_NUMBER() = 1); quote the "
                "identifier if a column is named final"
            )
        # SAMPLE 0.1 / SAMPLE 10000 — approximate sampling clause
        if (
            up_ == "SAMPLE"
            and i + 1 < n
            and toks[i + 1][0] == "number"
        ):
            raise TranspileError(
                "clickhouse SAMPLE has no direct Spark rewrite; use "
                "TABLESAMPLE explicitly"
            )
        # trailing SETTINGS name = value
        if (
            up_ == "SETTINGS"
            and i + 2 < n
            and toks[i + 1][0] == "ident"
            and is_op(i + 2, "=")
        ):
            raise TranspileError(
                "clickhouse SETTINGS clause has no Spark equivalent; "
                "move session settings to the gateway config"
            )
        # LIMIT n BY cols — per-group limit
        if (
            up_ == "LIMIT"
            and i + 2 < n
            and toks[i + 1][0] == "number"
            and toks[i + 2][0] == "ident"
            and toks[i + 2][1].upper() == "BY"
        ):
            raise TranspileError(
                "clickhouse LIMIT n BY has no Spark clause; rewrite "
                "with ROW_NUMBER() OVER (PARTITION BY ...) <= n"
            )
        # [LEFT] ARRAY JOIN — ClickHouse's unnest clause. Spark would
        # read `t ARRAY` as a table alias and join a RELATION named
        # after the array — silent corruption, so rewrite:
        #   t [LEFT] ARRAY JOIN expr AS e
        #   → t LATERAL VIEW explode[_outer](expr) e_lv AS e
        if (
            up_ == "ARRAY"
            and i + 1 < n
            and toks[i + 1][0] == "ident"
            and toks[i + 1][1].upper() == "JOIN"
        ):
            aj_outer = (
                i > 0
                and toks[i - 1][0] == "ident"
                and toks[i - 1][1].upper() == "LEFT"
            )
            region_start_tok = i - 1 if aj_outer else i
            j = i + 2
            if not (
                j < n
                and toks[j][0] in _NAME_KINDS
                and toks[j][1].upper() not in _EXPR_KEYWORDS
            ):
                raise TranspileError(
                    "ARRAY JOIN operand must be a column or call "
                    "to transpile"
                )
            k_ = j
            while (
                k_ + 2 < n
                and toks[k_ + 1][0] == "op" and toks[k_ + 1][1] == "."
                and toks[k_ + 2][0] in _NAME_KINDS
            ):
                k_ += 2
            if is_op(k_ + 1, "("):
                _aj_spans, k_ = _call_arg_spans(toks, k_ + 1)
            aj_expr = transpile(sql[toks[j][2] : toks[k_][3]], read)
            j = k_ + 1
            if j < n and toks[j][0] == "ident" and toks[j][1].upper() == "AS":
                j += 1
            if not (
                j < n
                and toks[j][0] in _NAME_KINDS
                and toks[j][1].upper() not in _EXPR_KEYWORDS
            ):
                raise TranspileError(
                    "ARRAY JOIN without an element alias SHADOWS the "
                    "source column in ClickHouse — no Spark rewrite; "
                    "add `AS alias`"
                )
            aj_alias = _ident_text(toks[j][0], toks[j][1])
            region_end_tok = j
            if is_op(j + 1, ","):
                raise TranspileError(
                    "multi-array ARRAY JOIN iterates arrays in "
                    "LOCKSTEP; zip them with arrays_zip and unnest "
                    "the single zipped array"
                )
            fn_ = "explode_outer" if aj_outer else "explode"
            edits.append(
                (toks[region_start_tok][2], toks[region_end_tok][3],
                 f" LATERAL VIEW {fn_}({aj_expr}) {aj_alias}_lv "
                 f"AS {aj_alias}")
            )
            i = region_end_tok + 1
            return i

        # Join strictness/locality modifiers precede the direction in
        # ClickHouse: [GLOBAL] [ANY|ALL|ASOF|SEMI|ANTI] LEFT|... JOIN.
        # SEMI/ANTI LEFT reorder to Spark's LEFT SEMI/ANTI; ALL is the
        # standard-SQL default and drops; ANY (row-dedup), ASOF and
        # GLOBAL (distributed locality) have no Spark semantic.
        _JOIN_DIRS = ("JOIN", "LEFT", "RIGHT", "INNER", "FULL", "CROSS")
        if i + 1 < n and toks[i + 1][0] == "ident" and (
            toks[i + 1][1].upper() in _JOIN_DIRS
            or toks[i + 1][1].upper() in ("ANY", "ALL", "SEMI", "ANTI")
        ):
            nxt_up = toks[i + 1][1].upper()
            if up_ in ("GLOBAL", "ASOF", "ANY") and (
                nxt_up in _JOIN_DIRS or nxt_up in ("ANY", "ALL", "SEMI", "ANTI")
            ):
                raise TranspileError(
                    f"clickhouse {up_} join modifier has no Spark rewrite"
                )
            if up_ in ("ALL", "SEMI", "ANTI") and nxt_up in _JOIN_DIRS:
                if up_ == "ALL":
                    # standard join semantics — drop the keyword
                    edits.append((start, toks[i + 1][2], ""))
                    i += 1
                    return i
                if nxt_up == "LEFT":
                    # SEMI LEFT JOIN → LEFT SEMI JOIN
                    edits.append((start, toks[i + 1][3], f"LEFT {up_}"))
                    i += 2
                    return i
                if nxt_up == "JOIN" and i > 0 and \
                        toks[i - 1][0] == "ident" and \
                        toks[i - 1][1].upper() == "LEFT":
                    # LEFT SEMI JOIN — already Spark's order (our own
                    # rewrite output on a later fixpoint pass)
                    i += 1
                    return i
                raise TranspileError(
                    f"clickhouse {up_} {nxt_up} JOIN has no Spark "
                    "rewrite (Spark supports LEFT SEMI/ANTI only)"
                )
        # GLOBAL IN / GLOBAL NOT IN — distributed-locality subquery
        if up_ == "GLOBAL" and i + 1 < n and toks[i + 1][0] == "ident" \
                and toks[i + 1][1].upper() in ("IN", "NOT"):
            raise TranspileError(
                "clickhouse GLOBAL IN has no Spark rewrite (Spark "
                "subqueries are already cluster-wide); drop GLOBAL"
            )

    return None


def call_handlers(ctx) -> "int | None":
    """ClickHouse read-dialect function maps, token fixes and call handlers (pre-split code, verbatim)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, first_pass, is_op, _arg_text, transpile, n)
    # quantile(0.9)(x)-style parameterized aggregate
    # combinators: the second argument list is CH-only
    # grammar with no Spark analog — LOUD before it can lex
    # into nonsense.
    # computed ONCE here and reused by every handler in
    # this block (the guard needs only the close index,
    # but handlers need the spans anyway)
    _spans0, _close0 = _call_arg_spans(toks, i + 1)
    if name == "uniqexact" and len(_spans0) >= 1 and not is_op(_close0 + 1, "("):
        # uniqExact(x[, ...]) is the exact distinct count →
        # count(DISTINCT ...) (was loud; round 11)
        args_ = ", ".join(f"({_arg_text(sp)})" for sp in _spans0)
        edits.append(
            (start, toks[_close0][3], f"count(DISTINCT {args_})")
        )
        return _close0 + 1
    if is_op(_close0 + 1, "("):
        raise TranspileError(
            f"clickhouse parameterized combinator "
            f"{text}(...)(...) has no Spark rewrite"
        )

    if name in _CH_CAST_FN:
        spans, close = _spans0, _close0
        if len(spans) != 1:
            raise TranspileError(
                f"{text} with a timezone/precision argument "
                "has no Spark CAST rewrite"
            )
        edits.append((start, end, "CAST"))
        edits.append(
            (toks[close][2], toks[close][2],
             f" AS {_CH_CAST_FN[name]}")
        )
        i += 1
        return i

    if name in _CH_TRUNC_FN:
        unit_, as_date = _CH_TRUNC_FN[name]
        spans, close = _spans0, _close0
        if len(spans) != 1:
            raise TranspileError(
                f"{text} with a timezone argument has no "
                "Spark rewrite"
            )
        if as_date:
            # CH returns Date; date_trunc a timestamp
            edits.append(
                (start, toks[i + 1][3],
                 f"CAST(date_trunc('{unit_}', ")
            )
            edits.append(
                (toks[close][2], toks[close][3], ") AS DATE)")
            )
        else:
            edits.append(
                (start, toks[i + 1][3], f"date_trunc('{unit_}', ")
            )
        i += 1
        return i

    if name in ("toyyyymm", "toyyyymmdd"):
        spans, close = _spans0, _close0
        if len(spans) != 1:
            raise TranspileError(f"{text} takes 1 arg")
        fmt_ = "yyyyMM" if name == "toyyyymm" else "yyyyMMdd"
        edits.append((start, toks[i + 1][3], "CAST(date_format("))
        edits.append(
            (toks[close][2], toks[close][3],
             f", '{fmt_}') AS INT)")
        )
        i += 1
        return i

    if name == "yesterday":
        spans, close = _spans0, _close0
        if spans:
            raise TranspileError("yesterday takes no args")
        edits.append(
            (start, toks[close][3], "date_sub(current_date(), 1)")
        )
        i = close + 1
        return i

    if name == "todayofweek":
        # default mode 0: ISO Monday=1 — same as weekday()+1;
        # any explicit mode argument is LOUD.
        spans, close = _spans0, _close0
        if len(spans) != 1:
            raise TranspileError(
                "toDayOfWeek with a mode/timezone argument "
                "has no Spark rewrite"
            )
        _emit_iso_dow(edits, start, end, toks[close][3])
        i += 1
        return i

    if name == "fromunixtimestamp":
        spans, _close = _spans0, _close0
        if len(spans) != 1:
            raise TranspileError(
                "fromUnixTimestamp with a format/timezone "
                "argument has no Spark rewrite"
            )
        edits.append((start, end, "timestamp_seconds"))
        i += 1
        return i

    if name == "formatdatetime" and first_pass:
        spans, _close = _spans0, _close0
        if len(spans) != 2 or toks[spans[1][0]][0] != "string" \
                or spans[1][0] != spans[1][1]:
            raise TranspileError(
                "formatDateTime needs a literal format (and "
                "no timezone arg) to transpile"
            )
        fmt_tok = toks[spans[1][0]]
        converted = convert_ch_format(
            _literal_content(fmt_tok[1], read)
        )
        edits.append((start, end, "date_format"))
        edits.append(
            (fmt_tok[2], fmt_tok[3],
             _spark_string_literal(converted, read))
        )
        i += 1
        return i

    if name in ("date_add", "dateadd") and first_pass:
        # date_add(unit, n, date) — bare keyword or quoted
        # unit. 2-arg date_add(date, n) matches Spark.
        spans, _close = _spans0, _close0
        if len(spans) == 3:
            u_tok = toks[spans[0][0]]
            if u_tok[0] == "string":
                raw_unit = _literal_content(u_tok[1], read).lower()
            elif u_tok[0] == "ident" and spans[0][0] == spans[0][1]:
                raw_unit = u_tok[1].lower()
            else:
                raise TranspileError(
                    f"{text} unit must be a literal"
                )
            unit = _resolve_unit(read, raw_unit)
            if unit is None:
                raise TranspileError(
                    f"{text} unit {raw_unit!r} has no Spark "
                    "timestampadd equivalent"
                )
            edits.append((start, end, "timestampadd"))
            edits.append(
                (u_tok[2], toks[spans[0][1]][3], unit)
            )
        i += 1
        return i

    if name in _CH_ADD_FN:
        unit_, neg = _CH_ADD_FN[name]
        spans, close = _spans0, _close0
        if len(spans) != 2:
            raise TranspileError(f"{text} takes 2 args")
        d_text = _arg_text(spans[0])
        n_text = _arg_text(spans[1])
        qty = f"-({n_text})" if neg else n_text
        edits.append(
            (start, toks[close][3],
             f"timestampadd({unit_}, {qty}, {d_text})")
        )
        i = close + 1
        return i

    if name == "position":
        # CH position(haystack, needle[, start]) — REVERSED
        # from Spark's position(substr, str); instr matches
        # the CH order. The grammar form position(x IN y)
        # already means the same in both.
        spans, _close = _spans0, _close0
        if len(spans) == 1:
            i += 1  # position(x IN y) — Spark grammar form
            return i
        if len(spans) == 2:
            edits.append((start, end, "instr"))
            i += 1
            return i
        raise TranspileError(
            "position with a start offset has no Spark "
            "rewrite in the ClickHouse argument order"
        )

    if name in ("length", "reverse") and first_pass:
        # CH length is BYTES for strings and size for arrays;
        # CH reverse is byte-wise on strings (garbled UTF-8).
        # The operand type is unknowable at render — LOUD.
        # first_pass only: length()/reverse() in later passes
        # are our own lengthUTF8/reverseUTF8 rewrites.
        raise TranspileError(
            f"clickhouse {name}() is byte/array-ambiguous; "
            f"use {name}UTF8 for strings"
            + (" or cardinality-style size for arrays"
               if name == "length" else "")
        )

    if name == "extract":
        # comma form extract(haystack, pattern) is a regex
        # fragment match: group 1 when the pattern has a
        # capture group, else the whole match. The EXTRACT
        # (field FROM x) grammar form passes through.
        spans, close = _spans0, _close0
        if len(spans) == 1:
            i += 1
            return i
        if len(spans) != 2:
            raise TranspileError("extract takes 2 args")
        p_tok = toks[spans[1][0]]
        if not (
            p_tok[0] == "string" and spans[1][0] == spans[1][1]
        ):
            raise TranspileError(
                "clickhouse extract(haystack, pattern) needs "
                "a literal pattern (group selection depends "
                "on its capture groups)"
            )
        pat = _literal_content(p_tok[1], read)
        group = 1 if re.search(r"(?<!\\)\((?!\?)", pat) else 0
        edits.append((start, end, "regexp_extract"))
        edits.append(
            (toks[close][2], toks[close][2], f", {group}")
        )
        i += 1
        return i

    if name == "extractall":
        # extractAll(haystack, pattern) — ALL fragment matches as an
        # array, same group-1-if-captured rule as extract (round 11;
        # was an unresolved passthrough) → regexp_extract_all
        spans, close = _spans0, _close0
        if len(spans) != 2:
            raise TranspileError("extractAll takes 2 args")
        p_tok = toks[spans[1][0]]
        if not (
            p_tok[0] == "string" and spans[1][0] == spans[1][1]
        ):
            raise TranspileError(
                "clickhouse extractAll(haystack, pattern) needs "
                "a literal pattern (group selection depends "
                "on its capture groups)"
            )
        pat = _literal_content(p_tok[1], read)
        group = 1 if re.search(r"(?<!\\)\((?!\?)", pat) else 0
        edits.append((start, end, "regexp_extract_all"))
        edits.append(
            (toks[close][2], toks[close][2], f", {group}")
        )
        i += 1
        return i

    if name == "arraysum":
        # arraySum([lambda,] arr) — lambda comes FIRST when present
        # (round 11; was loud).  Sums as DOUBLE (ClickHouse widens to
        # Int64/Float64 — same values, the dtype caveat is
        # documented); NULL elements are skipped in CH, matched by a
        # coalesce-to-0 inside the fold.
        spans, close = _spans0, _close0
        if len(spans) == 1:
            x_ = _arg_text(spans[0])
            body = "_a + coalesce(CAST(_x AS DOUBLE), 0.0D)"
            repl = (f"aggregate(({x_}), CAST(0 AS DOUBLE), "
                    f"(_a, _x) -> {body})")
            edits.append((start, toks[close][3], repl))
            return close + 1
        if len(spans) == 2:
            l_, x_ = _arg_text(spans[0]), _arg_text(spans[1])
            repl = (f"aggregate(transform(({x_}), {l_}), "
                    "CAST(0 AS DOUBLE), (_a, _x) -> "
                    "_a + coalesce(CAST(_x AS DOUBLE), 0.0D))")
            edits.append((start, toks[close][3], repl))
            return close + 1
        raise TranspileError("arraySum takes ([lambda,] array)")

    if name == "arraycount":
        # arrayCount(lambda, arr) counts elements where the lambda is
        # truthy (NULL is not) — size(filter(...)) matches exactly.
        # The 1-arg non-zero-count form needs element truthiness over
        # an unknown type — loud.
        spans, close = _spans0, _close0
        if len(spans) == 2:
            l_, x_ = _arg_text(spans[0]), _arg_text(spans[1])
            repl = f"size(filter(({x_}), {l_}))"
            edits.append((start, toks[close][3], repl))
            return close + 1
        raise TranspileError(
            "arrayCount without a lambda counts non-zero elements "
            "of an unknown type; spell the predicate explicitly "
            "(arrayCount(x -> x <> 0, arr))"
        )

    if name == "tostartofweek":
        # toStartOfWeek(d[, mode]) — mode 0 (the default) floors to
        # SUNDAY; mode 1/3 to Monday (ISO).  Spark date_trunc('week')
        # is Monday-anchored, so mode 0 needs dayofweek arithmetic.
        # Non-literal / other modes stay loud (the CH mode table also
        # varies first-week-of-year rules, which don't matter for
        # flooring a date).
        spans, close = _spans0, _close0
        if len(spans) in (1, 2):
            mode = "0"
            if len(spans) == 2:
                m_tok = toks[spans[1][0]]
                if not (m_tok[0] == "number"
                        and spans[1][0] == spans[1][1]):
                    raise TranspileError(
                        "toStartOfWeek mode must be a literal"
                    )
                mode = m_tok[1]
            d_ = _arg_text(spans[0])
            if mode == "0":
                repl = (f"date_sub(CAST(({d_}) AS DATE), "
                        f"(dayofweek(CAST(({d_}) AS DATE)) - 1))")
            elif mode in ("1", "3"):
                repl = f"CAST(date_trunc('week', ({d_})) AS DATE)"
            else:
                raise TranspileError(
                    f"toStartOfWeek mode {mode} has no Spark rewrite "
                    "(modes 0=Sunday and 1/3=Monday transpile)"
                )
            edits.append((start, toks[close][3], repl))
            return close + 1

    if name in ("splitbychar", "splitbystring", "splitbyregexp"):
        # separator FIRST in CH; plain-string separators are
        # regex-escaped for Spark's regex split.
        spans, close = _spans0, _close0
        if len(spans) != 2:
            raise TranspileError(
                f"{text} with a max_substrings argument has "
                "no Spark rewrite (Spark's limit keeps the "
                "remainder; ClickHouse discards it)"
            )
        sep_tok = toks[spans[0][0]]
        s_text = _arg_text(spans[1])
        if name == "splitbyregexp":
            sep_text = _arg_text(spans[0])
        else:
            if not (
                sep_tok[0] == "string"
                and spans[0][0] == spans[0][1]
            ):
                raise TranspileError(
                    f"{text} separator must be a string "
                    "literal to transpile (plain string vs "
                    "Spark regex)"
                )
            sep_text = _regex_literal(
                _literal_content(sep_tok[1], read), read
            )
        edits.append(
            (start, toks[close][3],
             f"split({s_text}, {sep_text})")
        )
        i = close + 1
        return i

    if name == "multiif":
        spans, close = _spans0, _close0
        if len(spans) < 3 or len(spans) % 2 == 0:
            raise TranspileError(
                "multiIf takes cond/value pairs plus an else"
            )
        parts = ["CASE"]
        for k_ in range(0, len(spans) - 1, 2):
            parts.append(
                f"WHEN ({_arg_text(spans[k_])}) "
                f"THEN ({_arg_text(spans[k_ + 1])})"
            )
        parts.append(f"ELSE ({_arg_text(spans[-1])}) END")
        edits.append((start, toks[close][3], " ".join(parts)))
        i = close + 1
        return i

    if name in ("assumenotnull", "tonullable", "tolowcardinality"):
        # nullability/storage wrappers — unwrap to the arg
        spans, close = _spans0, _close0
        if len(spans) != 1:
            raise TranspileError(f"{text} takes 1 arg")
        edits.append(
            (start, toks[close][3], f"({_arg_text(spans[0])})")
        )
        i = close + 1
        return i

    if name == "rand" and first_pass:
        # CH rand() is a uniform UInt32, not a [0,1) float.
        # first_pass only: the rewrite contains rand() itself.
        spans, close = _spans0, _close0
        if spans:
            raise TranspileError(
                "rand(expr) has no Spark rewrite; use "
                "randCanonical for a [0,1) float"
            )
        edits.append(
            (start, toks[close][3],
             "CAST(floor(rand() * 4294967296) AS BIGINT)")
        )
        i = close + 1
        return i

    if name == "intdiv":
        spans, close = _spans0, _close0
        _emit_infix_call(
            edits, toks, start, close, spans, "DIV", _arg_text, name
        )
        i = close + 1
        return i

    if name in ("plus", "minus", "multiply", "divide"):
        spans, close = _spans0, _close0
        op_ = {
            "plus": "+", "minus": "-",
            "multiply": "*", "divide": "/",
        }[name]
        _emit_infix_call(
            edits, toks, start, close, spans, op_, _arg_text, text
        )
        i = close + 1
        return i

    if name in ("sumif", "avgif", "minif", "maxif"):
        # aggIf(x, cond) → agg(if(cond, x, NULL)) — the agg
        # ignores NULL, matching the CH row filter
        spans, close = _spans0, _close0
        if len(spans) != 2:
            raise TranspileError(f"{text} takes 2 args")
        agg = name[:-2]
        x = _arg_text(spans[0])
        c = _arg_text(spans[1])
        edits.append(
            (start, toks[close][3],
             f"{agg}(if(({c}), ({x}), NULL))")
        )
        i = close + 1
        return i

    # round-11 residual tier (core/dialects/clickhouse_residual.py —
    # split for the module-size convention; dispatched HERE so scan
    # position and the precomputed spans are exactly the pre-split
    # ones)
    nxt_res = _chres.call_handlers(ctx, _spans0, _close0)
    if nxt_res is not None:
        return nxt_res

    if name in ("arraymap", "arrayfilter", "arrayexists", "arrayall"):
        # CH higher-order functions take the LAMBDA FIRST
        spans, close = _spans0, _close0
        if len(spans) != 2:
            raise TranspileError(
                f"{text} over multiple arrays has no direct "
                "Spark rewrite (zip the arrays first)"
            )
        target_ = {
            "arraymap": "transform", "arrayfilter": "filter",
            "arrayexists": "exists", "arrayall": "forall",
        }[name]
        lam = _arg_text(spans[0])
        arr = _arg_text(spans[1])
        edits.append(
            (start, toks[close][3],
             f"{target_}(({arr}), {lam})")
        )
        i = close + 1
        return i

    if name == "arraystringconcat":
        # 1-arg form joins with the empty-string default that
        # Spark's 2-arg array_join has no default for
        spans, close = _spans0, _close0
        if len(spans) == 1:
            edits.append((start, end, "array_join"))
            edits.append((toks[close][2], toks[close][2], ", ''"))
            i += 1
            return i
        # 2-arg falls through to the array_join rename

    if name == "arraysort":
        spans, _close = _spans0, _close0
        if len(spans) == 1:
            edits.append((start, end, "array_sort"))
            i += 1
            return i
        raise TranspileError(
            "arraySort with a key-extractor lambda has no "
            "Spark rewrite (Spark's comparator takes 2 args)"
        )

    if name in (
        "jsonextractstring", "jsonextractint",
        "jsonextractfloat", "jsonextractbool",
    ):
        spans, close = _spans0, _close0
        if len(spans) < 2:
            raise TranspileError(f"{text} needs a key path")
        keys: list[str] = []
        for s_, e_ in spans[1:]:
            t_ = toks[s_]
            if not (s_ == e_ and t_[0] == "string"):
                raise TranspileError(
                    f"{text} keys must be string literals "
                    "(numeric indices are 1-based in "
                    "ClickHouse, 0-based in JSONPath)"
                )
            key = _literal_content(t_[1], read)
            if re.search(r"[.\[\]'\"$\\]", key):
                raise TranspileError(
                    f"{text} key {key!r} needs JSONPath "
                    "quoting; rewrite with get_json_object"
                )
            keys.append(key)
        path = "$." + ".".join(keys)
        j_text = _arg_text(spans[0])
        inner = f"get_json_object({j_text}, '{path}')"
        cast_t = {
            "jsonextractstring": None,
            "jsonextractint": "BIGINT",
            "jsonextractfloat": "DOUBLE",
            "jsonextractbool": "BOOLEAN",
        }[name]
        if cast_t:
            inner = f"CAST({inner} AS {cast_t})"
        edits.append((start, toks[close][3], inner))
        i = close + 1
        return i

    if name == "replaceregexpall":
        spans, close = _spans0, _close0
        if len(spans) != 3:
            raise TranspileError("replaceRegexpAll takes 3 args")
        r_first, r_last = spans[2]
        r_tok = toks[r_first]
        if not (r_first == r_last and r_tok[0] == "string"):
            raise TranspileError(
                "replaceRegexpAll replacement must be a "
                "string literal to transpile (backreference "
                "syntax \\1 vs $1)"
            )
        converted = _regex_replacement_to_spark(
            _literal_content(r_tok[1], read)
        )
        edits.append((start, end, "regexp_replace"))
        edits.append(
            (r_tok[2], toks[r_last][3],
             _spark_string_literal(converted, read))
        )
        i += 1
        return i

    return None
