"""Literal, regex and datetime-format machinery for the read-dialect transpiler: %-code and NLS format-table conversion, string-literal decoding/emission per dialect, and regex literal escaping.

Split out of core/transpile.py (round 6): the walker in
core/transpile.py dispatches into this module's handler functions; see
TokenCtx in core/transpile_shared.py for the contract. Handler bodies
are the pre-split code verbatim (continue -> return i), so every
file:line reference in docstrings and VERDICT history still applies.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.sqlparse import ESCAPE_LITERAL_DIALECTS  # noqa: F401
from sqlmesh_spark.core.transpile_shared import (  # noqa: F401
    _STD_LITERAL_DIALECTS,
    TranspileError,
)

_DIFF_UNITS = {
    u: u.upper()
    for u in ("year", "quarter", "month", "week", "day", "hour", "minute", "second")
}
_DIFF_UNITS.update({u + "s": u.upper() for u in list(_DIFF_UNITS)})

# T-SQL DATEADD/DATEDIFF/DATEPART unit abbreviations → canonical unit.
# dayofyear/dy/y are ABSENT on purpose: DATEADD treats them as day but
# DATEPART returns day-of-year — context-dependent, so loud beats a
# guess. millisecond/microsecond work for dateadd via Spark units.
_TSQL_UNIT_ALIASES = {
    "yy": "year", "yyyy": "year",
    "qq": "quarter", "q": "quarter",
    "mm": "month", "m": "month",
    "dd": "day", "d": "day",
    "wk": "week", "ww": "week",
    "hh": "hour",
    "mi": "minute", "n": "minute",
    "ss": "second", "s": "second",
    "ms": "millisecond", "mcs": "microsecond",
    "millisecond": "millisecond", "microsecond": "microsecond",
}


# Snowflake / Redshift unit abbreviations → canonical unit (round 11;
# each alias taken from the published date-part alias lists — note the
# single-letter divergence: Snowflake 'mm' is MONTH where Redshift 'm'
# is MINUTE).  Aliases absent here (woy, dayofweek, epoch tiers) are
# handled by the per-dialect date_part machinery or stay loud.
_SNOWFLAKE_UNIT_ALIASES = {
    "y": "year", "yy": "year", "yyy": "year", "yyyy": "year",
    "yr": "year", "yrs": "year",
    "mm": "month", "mon": "month", "mons": "month",
    "d": "day", "dd": "day", "dayofmonth": "day",
    "w": "week", "wk": "week", "weeks": "week",
    "q": "quarter", "qtr": "quarter", "qtrs": "quarter",
    "h": "hour", "hh": "hour", "hr": "hour", "hrs": "hour",
    "mi": "minute", "min": "minute", "mins": "minute",
    "s": "second", "sec": "second", "secs": "second",
    "ms": "millisecond", "msec": "millisecond",
    "us": "microsecond", "usec": "microsecond",
    "millisecond": "millisecond", "microsecond": "microsecond",
}
_REDSHIFT_UNIT_ALIASES = {
    "y": "year", "yr": "year", "yrs": "year",
    "mon": "month", "mons": "month",
    "d": "day",
    "w": "week",
    "qtr": "quarter", "qtrs": "quarter",
    "h": "hour", "hr": "hour", "hrs": "hour",
    "m": "minute", "min": "minute", "mins": "minute",
    "s": "second", "sec": "second", "secs": "second",
    "ms": "millisecond", "msec": "millisecond", "msecs": "millisecond",
    "millisec": "millisecond",
    "us": "microsecond", "usec": "microsecond", "microsec": "microsecond",
    "millisecond": "millisecond", "microsecond": "microsecond",
}


def _resolve_unit(read: str, raw_unit: str) -> str | None:
    """Canonical UPPER unit for dateadd/datediff/datepart keywords, with
    T-SQL/Snowflake/Redshift abbreviation folding. Returns None when
    unmapped."""
    if read == "tsql":
        raw_unit = _TSQL_UNIT_ALIASES.get(raw_unit, raw_unit)
    elif read == "snowflake":
        raw_unit = _SNOWFLAKE_UNIT_ALIASES.get(raw_unit, raw_unit)
    elif read == "redshift":
        raw_unit = _REDSHIFT_UNIT_ALIASES.get(raw_unit, raw_unit)
    if raw_unit in ("millisecond", "microsecond"):
        return raw_unit.upper()
    return _DIFF_UNITS.get(raw_unit)

# C-style (strftime/strptime) → Spark datetime pattern letters. %G (ISO
# week year) and %V (ISO week) are deliberately ABSENT: Spark 3+ rejects
# the Y/w week patterns (DATETIME_PATTERN_RECOGNITION), so those codes
# raise TranspileError instead of emitting SQL that fails at run time.
_C_FMT = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "H": "HH", "I": "hh",
    "M": "mm", "S": "ss", "f": "SSSSSS", "g": "SSS", "p": "a", "j": "DDD",
    "a": "EEE", "A": "EEEE", "b": "MMM", "B": "MMMM", "Z": "zzz",
    "z": "xx", "%": "%",
    # duckdb %x / %X are the ISO date / time representations
    "x": "yyyy-MM-dd", "X": "HH:mm:ss",
}

#: `%-X` (no-padding modifier): Java single-letter fields already print
#: the minimal digits. Codes whose unpadded form has no Java
#: equivalent (e.g. %-y) stay loud.
_C_FMT_NOPAD = {
    "d": "d", "m": "M", "H": "H", "I": "h", "M": "m", "S": "s", "j": "D",
}

# Postgres to_char/to_timestamp patterns → Spark. Sorted longest-first at
# use time so MONTH wins over its prefix MON (a literal-order list had
# made the MONTH mapping unreachable).
_PG_FMT = sorted(
    [
        ("YYYY", "yyyy"), ("YY", "yy"), ("MON", "MMM"), ("MONTH", "MMMM"),
        ("MM", "MM"), ("DDD", "DDD"), ("DD", "dd"), ("DY", "EEE"),
        ("DAY", "EEEE"), ("HH24", "HH"), ("HH12", "hh"), ("HH", "hh"),
        ("MI", "mm"), ("SS", "ss"), ("MS", "SSS"), ("US", "SSSSSS"),
        ("AM", "a"), ("PM", "a"),
        # TZ is deliberately ABSENT (round 8, probed live): pg renders
        # the EMPTY string for timestamp-without-tz (the model-column
        # norm) where Java zzz prints the session zone ('UTC') — a
        # silent divergence; to_char(ts, 'TZ') raises instead
    ],
    key=lambda p: -len(p[0]),
)


# ClickHouse formatDateTime %-codes → Spark datetime patterns. %M is
# deliberately ABSENT: legacy servers read it as MINUTE, 23.x+ (with
# formatdatetime_format_without_leading_zeros defaults) as MONTH NAME —
# version-ambiguous, so it raises; %i is the unambiguous minute.
_CH_FMT = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "H": "HH", "I": "hh",
    "i": "mm", "S": "ss", "p": "a", "j": "DDD", "a": "EEE", "W": "EEEE",
    "b": "MMM", "f": "SSSSSS", "Q": "Q",
    "F": "yyyy-MM-dd", "T": "HH:mm:ss", "R": "HH:mm", "r": "hh:mm:ss a",
    "n": "\n", "t": "\t", "%": "%",
}


def _convert_pct_format(fmt: str, table: dict[str, str], what: str) -> str:
    """Shared %-code → Spark datetime pattern conversion, quoting literal
    letter runs. Raises on a code absent from ``table``."""
    out: list[str] = []
    literal: list[str] = []

    def flush() -> None:
        if not literal:
            return
        run = "".join(literal)
        # Java patterns treat a-zA-Z as pattern letters: quote runs that
        # contain any; pure punctuation passes through unquoted.
        if re.search(r"[A-Za-z']", run):
            out.append("'" + run.replace("'", "''") + "'")
        else:
            out.append(run)
        literal.clear()

    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            if i + 1 >= len(fmt):
                raise TranspileError(f"dangling % in format {fmt!r}")
            code = fmt[i + 1]
            if (
                code == "-"
                and table is _C_FMT
                and i + 2 < len(fmt)
                and fmt[i + 2] in _C_FMT_NOPAD
            ):
                rep = _C_FMT_NOPAD[fmt[i + 2]]
                flush()
                if out and out[-1] and out[-1][-1] == rep[0]:
                    raise TranspileError(
                        f"adjacent datetime codes %-{fmt[i + 2]} merge "
                        "ambiguously in Java patterns"
                    )
                out.append(rep)
                i += 3
                continue
            if code not in table:
                extra = (
                    " (legacy minute vs 23.x month name — use %i for "
                    "minutes or the MMMM Spark pattern directly)"
                    if what == "clickhouse formatDateTime" and code == "M"
                    else ""
                )
                raise TranspileError(
                    f"{what} code %{code} has no Spark datetime "
                    f"pattern{extra}"
                )
            flush()
            rep = table[code]
            # Two adjacent identical codes (%Y%Y) would merge into one
            # longer Java field (yyyyyyyy = one 8-padded year, not two
            # years) — inexpressible without a separator, so refuse.
            if rep != "%" and out and out[-1] and out[-1][-1] == rep[0]:
                raise TranspileError(
                    f"adjacent %{code} codes merge in Spark datetime "
                    f"patterns; separate them in format {fmt!r}"
                )
            out.append(rep)
            i += 2
        else:
            literal.append(c)
            i += 1
    flush()
    return "".join(out)


def convert_strftime_format(fmt: str) -> str:
    """C-style → Spark datetime pattern, quoting literal letter runs.

    ``%Y-%m-%dT%H:%M:%S`` → ``yyyy-MM-dd'T'HH:mm:ss``. Raises on a ``%``
    code with no Spark equivalent (e.g. ``%U`` week-of-year-Sunday).
    """
    return _convert_pct_format(fmt, _C_FMT, "strftime")


def convert_ch_format(fmt: str) -> str:
    """ClickHouse formatDateTime %-codes → Spark datetime pattern."""
    return _convert_pct_format(fmt, _CH_FMT, "clickhouse formatDateTime")


#: FM (fill-mode) token map for FORMATTING: FM strips pg's padding —
#: leading zeros on numeric fields (Java's single letters already print
#: minimal digits) and the 9-char space padding of DAY/MONTH names.
_PG_FM_FMT = {
    "DD": "d", "MM": "M", "HH24": "H", "HH12": "h", "HH": "h",
    "MI": "m", "SS": "s", "DDD": "D", "YYYY": "yyyy",
    "DAY": "EEEE", "MONTH": "MMMM", "DY": "EEE", "MON": "MMM",
}

#: name tokens whose pg OUTPUT case FOLLOWS the pattern's case
#: ('DY'→'SAT', 'Dy'→'Sat', 'dy'→'sat') — Java patterns always print
#: the capitalized form, so only the capitalized spelling is faithful
#: when formatting. Value = the required source spelling.
_PG_CASED_NAMES = {"MON": "Mon", "DY": "Dy", "AM": ("AM", "PM"),
                   "PM": ("AM", "PM")}


def _convert_pg_like_format(
    fmt: str, allow_ff: bool, formatting: bool = False,
    segments: bool = False,
):
    """Shared Postgres-style pattern scan (longest-first _PG_FMT table,
    numeric-pattern guard, loud on unmapped alpha). ``allow_ff`` adds
    Snowflake's ``FF[0-9]`` fractional-seconds prefix case.
    ``formatting=True`` (the to_char direction) enforces OUTPUT-exact
    semantics the tolerant parsing direction doesn't need: pg prints
    name tokens case-following-pattern (only 'Mon'/'Dy'/'AM' spellings
    match Java's capitalized output), space-pads DAY/MONTH to 9 chars
    unless FM — so plain DAY/MONTH are loud and FMDay/FMMonth map —
    and FM strips numeric leading zeros (FMDD → 'd')."""
    if not any(c.isalpha() for c in fmt):
        raise TranspileError(
            f"format {fmt!r} looks numeric; only datetime "
            "patterns transpile to date_format"
        )
    out: list[str] = []
    segs: list = []

    def _flush_pat() -> None:
        if out:
            segs.append(("pat", "".join(out)))
            out.clear()

    def _case_of(src: str) -> "str | None":
        """'upper' / 'lower' / 'cap' by the source spelling (pg prints
        name tokens case-following-pattern), None for mixed salads."""
        if src.isupper():
            return "upper"
        if src.islower():
            return "lower"
        if src[:1].isupper() and src[1:].islower():
            return "cap"
        return None

    i = 0
    n = len(fmt)
    while i < n:
        if allow_ff and fmt[i : i + 2].upper() == "FF":
            digits = 9
            skip = 2
            if i + 2 < n and fmt[i + 2].isdigit():
                digits = int(fmt[i + 2])
                skip = 3
            if digits == 0:
                raise TranspileError("FF0 fractional seconds is not a pattern")
            out.append("S" * digits)
            i += skip
            continue
        if formatting and fmt[i : i + 2].upper() == "FM":
            rest = fmt[i + 2 :]
            for pat in sorted(_PG_FM_FMT, key=len, reverse=True):
                if rest[: len(pat)].upper() == pat:
                    src = rest[: len(pat)]
                    if pat in ("DAY", "MONTH", "DY", "MON") and not (
                        src[:1].isupper() and src[1:].islower()
                    ):
                        case = _case_of(src)
                        if segments and case in ("upper", "lower"):
                            # FMDAY/FMday etc: unpadded name, case
                            # follows the pattern — a case wrap around
                            # the single-field date_format
                            _flush_pat()
                            segs.append((
                                "wrap",
                                f"{case}(date_format({{x}}, "
                                f"'{_PG_FM_FMT[pat]}'))",
                            ))
                            i += 2 + len(pat)
                            break
                        raise TranspileError(
                            f"pg to_char prints FM{pat} case-following-"
                            "pattern; Spark's names are capitalized — "
                            f"use 'FM{pat.capitalize()}'"
                        )
                    out.append(_PG_FM_FMT[pat])
                    i += 2 + len(pat)
                    break
            else:
                raise TranspileError(
                    f"FM prefix on {rest[:6]!r} has no Spark mapping"
                )
            continue
        for pat, rep in _PG_FMT:
            if fmt[i : i + len(pat)].upper() == pat:
                src = fmt[i : i + len(pat)]
                if formatting and pat in ("DAY", "MONTH"):
                    case = _case_of(src)
                    if segments and case is not None:
                        # pg space-pads DAY/MONTH to 9 chars and the
                        # case follows the pattern (pinned live:
                        # 'Day' → 'Saturday ', 'MONTH' → 'MAY      ');
                        # English names never exceed 9, so rpad is
                        # exact
                        _flush_pat()
                        code = {"DAY": "EEEE", "MONTH": "MMMM"}[pat]
                        df = f"date_format({{x}}, '{code}')"
                        if case != "cap":
                            df = f"{case}({df})"
                        segs.append(("wrap", f"rpad({df}, 9, ' ')"))
                        i += len(pat)
                        break
                    raise TranspileError(
                        f"pg to_char space-pads {pat} to 9 characters; "
                        f"Spark does not — use FM{pat.capitalize()} "
                        "(fill mode) for the unpadded name"
                    )
                if formatting and pat in _PG_CASED_NAMES:
                    want = _PG_CASED_NAMES[pat]
                    ok = src in want if isinstance(want, tuple) \
                        else src == want
                    if not ok:
                        case = _case_of(src)
                        if segments and case in ("upper", "lower") and (
                            not (isinstance(want, tuple) and case == "upper")
                        ):
                            # 'DY'→'SAT' / 'mon'→'mar' / 'am'→'pm':
                            # case-wrap the single-field date_format
                            # ('AM'/'PM' uppercase ARE Java's output —
                            # excluded above, they map natively)
                            _flush_pat()
                            df = f"date_format({{x}}, '{rep}')"
                            segs.append(("wrap", f"{case}({df})"))
                            i += len(pat)
                            break
                        raise TranspileError(
                            f"pg to_char prints {pat} case-following-"
                            "pattern; Spark's output is fixed — "
                            + (f"use uppercase {'/'.join(want)}"
                               if isinstance(want, tuple)
                               else f"use '{want}'")
                        )
                if out and out[-1] and rep and out[-1][-1] == rep[0]:
                    # adjacent identical codes merge into ONE longer
                    # Java field (SSSS → 'ssss', pg's seconds-past-
                    # midnight misread as a 4-padded seconds field)
                    raise TranspileError(
                        f"adjacent {pat} codes merge in Spark datetime "
                        f"patterns (pg {pat * 2} is a different field); "
                        "separate them or use the pg field explicitly"
                    )
                out.append(rep)
                i += len(pat)
                break
        else:
            c = fmt[i]
            if c.isalpha():
                raise TranspileError(
                    f"format fragment {fmt[i:]!r} has no Spark mapping"
                )
            out.append(c)
            i += 1
    if segments:
        _flush_pat()
        return segs
    return "".join(out)


#: POSIX bracket-class names → Java character-class content (C-locale
#: ASCII reading — pg's classes are locale-dependent, but the C locale
#: is these sets exactly). Java reads ``[[:digit:]]`` as the literal
#: char set {:, d, i, g, t} — a silent semantic flip (verified live:
#: pg 'ab12' ~ '[[:digit:]]+' is true, Spark RLIKE false).
_POSIX_CLASSES = {
    "digit": "0-9",
    "alpha": "a-zA-Z",
    "alnum": "a-zA-Z0-9",
    "upper": "A-Z",
    "lower": "a-z",
    "xdigit": "0-9a-fA-F",
    "space": "\\s",
    "blank": " \\t",
    "word": "\\w",
    "punct": "\\p{Punct}",
    "cntrl": "\\x00-\\x1f\\x7f",
}


def convert_posix_classes(pat: str) -> str:
    """Rewrite POSIX ``[:name:]`` bracket-class elements to their Java
    equivalents inside a regex pattern; loud when an unknown class
    remains (silent pass-through would match the literal characters of
    the class NAME)."""
    if "[:" not in pat:
        return pat
    for name, rep in _POSIX_CLASSES.items():
        pat = pat.replace(f"[:{name}:]", rep)
    if re.search(r"\[:[a-z]+:\]", pat):
        raise TranspileError(
            f"regex pattern {pat!r} uses a POSIX class with no Java "
            "equivalent mapping"
        )
    return pat


def convert_regex_literal(pat: str, read: str) -> str:
    """Java-faithful re-emission of a pg (POSIX ARE) or duckdb (RE2)
    regex PATTERN literal — the default-semantics seams pinned live on
    PG 15 / duckdb 1.0 / Spark 4 (round 10):

    * ``$``: Java's default ``$`` also matches before a FINAL newline
      (``'a\\n' RLIKE 'a$'`` is true) where both pg ('a\\n' ~ 'a$' is
      false) and RE2 mean absolute end-of-text — every unescaped ``$``
      outside a bracket class becomes ``\\z``.  Skipped when an ``m``
      flag group is present (RE2 multiline re-purposes ``$`` for line
      boundaries; pg's m/n flags are loud below).
    * ``.``: pg's ARE default is newline-INsensitive (``.`` matches
      ``\\n``; E'a\\nb' ~ 'a.b' pinned true) where Java and RE2 exclude
      it — pg patterns containing an unescaped dot outside a class get
      a ``(?s)`` prefix.  RE2 agrees with Java; no duck prefix.
    * embedded flag groups ``(?xyz)`` / ``(?xyz:``: letters whose pg
      meaning differs from Java are loud (pg m/n = newline-sensitive
      vs Java m = MULTILINE; b/e/q/t/c/p/w have no Java flag); duck's
      RE2 ``U`` (ungreedy) is loud (Java U = UNICODE_CASE).  i/s/x
      agree across all three engines.

    Runs AFTER convert_posix_classes; idempotent (the output carries
    ``\\z`` instead of ``$``, and an existing leading ``(?s)``
    suppresses re-prefixing)."""
    ok_letters = {"i", "s", "x"} if read == "postgres" else {"i", "m", "s"}
    # pre-scan for an m flag group: under (?m) the $ rewrite must not
    # run ($ marks line boundaries there), and a post-hoc replace would
    # clobber user-written \z
    rewrite_dollar = not re.search(r"\(\?[a-z]*m[a-z]*[):]", pat)
    out: list[str] = []
    i, n = 0, len(pat)
    in_class = False
    dot_outside = False
    while i < n:
        c = pat[i]
        if c == "\\" and i + 1 < n:
            out.append(pat[i:i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            in_class = True
            out.append(c)
            i += 1
            # POSIX: ']' is literal when first (after optional '^')
            if i < n and pat[i] == "^":
                out.append("^")
                i += 1
            if i < n and pat[i] == "]":
                out.append("]")
                i += 1
            continue
        if c == "." :
            dot_outside = True
            out.append(c)
            i += 1
            continue
        if c == "$" and rewrite_dollar:
            out.append("\\z")
            i += 1
            continue
        if c == "(" and i + 1 < n and pat[i + 1] == "?":
            j = i + 2
            letters = []
            while j < n and pat[j].isalpha():
                letters.append(pat[j])
                j += 1
            if letters and j < n and pat[j] in (")", ":"):
                bad = set(letters) - ok_letters
                if bad:
                    raise TranspileError(
                        f"{read} regex flag group (?{''.join(letters)}"
                        f"{pat[j]} uses option(s) {sorted(bad)} whose "
                        "Java meaning differs (pg m/n are newline modes"
                        ", not MULTILINE; RE2 U is ungreedy); inline "
                        "the intended Java flags explicitly"
                    )
            out.append(c)
            i += 1
            continue
        out.append(c)
        i += 1
    res = "".join(out)
    if (
        read == "postgres"
        and dot_outside
        and not res.startswith("(?s)")
    ):
        res = "(?s)" + res
    return res


def convert_pg_format(fmt: str, formatting: bool = False) -> str:
    """Postgres TO_CHAR pattern → Spark datetime pattern. Numeric
    to_char patterns ('999D99') have no Spark date_format equivalent —
    they raise rather than converting to a wrong literal.
    ``formatting=True`` for the to_char (output) direction: enforces
    name-token case and DAY/MONTH padding fidelity and enables FM
    (fill-mode) tokens; parsing (to_timestamp/to_date) stays tolerant —
    pg parses names case-insensitively and a Java case mismatch is a
    loud runtime parse error, never a silent value."""
    return _convert_pg_like_format(fmt, allow_ff=False, formatting=formatting)


def pg_numeric_tochar_emit(x_text: str, fmt: str) -> "str | None":
    """Spark SQL for pg's NUMERIC to_char digit-class tier (round 11):
    ``[FM][S][9|0|,]+[.[9|0]*]``. Returns None when ``fmt`` is not
    numeric-shaped (date patterns take the segment path); raises for
    numeric shapes with no faithful Java rendering.

    Live-pinned PG 15 semantics this reproduces exactly:
      - one leading SIGN SLOT unless S: to_char(1234.5,'9,999.99') =
        ' 1,234.50' (width = len(pattern)+1, lpad)
      - '9' slots blank-pad, a '0' starts the zero-run: '0009' of 12 =
        ' 0012'; int-only patterns render 0 as '0' but '9.99' of .5 =
        '  .50' (NO leading zero — Java '#.00' matches)
      - rounding is half-up at the frac width ('9.99' of 2.675 =
        ' 2.68' — Spark's decimal cast matches)
      - OVERFLOW after rounding renders '#' per digit slot keeping
        separators and sign: '99.9' of 99.96 = ' ##.#', '999' of
        -12345 = '-###', 'S9.9' of 12 = '+#.#'
      - S renders an explicit +/- adjacent to the digits ('S999' of 5
        = '  +5')
      - FM strips the padding; frac '9's then drop trailing zeros
        ('FM9.99' of .5 = '.5') where frac '0's keep them ('FM990.00'
        of .5 = '0.50'); FM of 0 with all-'9' frac renders '0.'
        (pinned), with '0' frac renders '.00'
      - MI renders the absolute digits with a TRAILING sign char
        ('  5-' / '  5 '; FM drops the positive space; overflow
        keeps the suffix: '###-'); S+MI cannot combine.
    RN / EEEE / V / PR / PL / SG / TH / L / G / D stay loud.
    """
    m = re.match(
        r"(?is)^(fm)?(s)?([09,]+)(?:(\.)([09]*))?(mi)?$", fmt.strip()
    )
    if not m or "9" not in fmt and "0" not in fmt:
        return None
    has_fm, has_s = bool(m.group(1)), bool(m.group(2))
    has_mi = bool(m.group(6))
    if has_s and has_mi:
        raise TranspileError(
            f"to_char numeric format {fmt!r}: S and MI cannot combine "
            "(pg rejects it too)"
        )
    int_pat, has_dot, frac_pat = m.group(3), bool(m.group(4)), m.group(5) or ""
    digits = int_pat.replace(",", "")
    if not digits:
        return None  # '.99' with no int slots — stay loud
    # commas must sit at standard thousands positions (Java infers ONE
    # grouping size; pg honors arbitrary placements we can't express)
    rebuilt, cnt = [], 0
    for c in reversed(int_pat):
        if c == ",":
            if cnt == 0 or cnt % 3 != 0:
                raise TranspileError(
                    f"to_char numeric format {fmt!r}: comma grouping "
                    "is not thousands-grouping — no Java pattern form"
                )
        else:
            cnt += 1
        rebuilt.append(c)
    if int_pat.startswith(","):
        raise TranspileError(
            f"to_char numeric format {fmt!r} starts with a comma"
        )
    n_int = len(digits)
    n_frac = len(frac_pat)
    first0 = digits.find("0")
    min_int = (n_int - first0) if first0 >= 0 else 0
    if not has_dot:
        # integer-only patterns render 0 as '0' (pinned '    0')
        min_int = max(min_int, 1)
    frac_all9 = bool(frac_pat) and set(frac_pat) == {"9"}
    frac_all0 = bool(frac_pat) and set(frac_pat) == {"0"}
    if has_fm and frac_pat and not (frac_all9 or frac_all0):
        raise TranspileError(
            f"to_char FM format {fmt!r} mixes 9 and 0 fraction slots "
            "— no single Java pattern form"
        )
    # Java integer section: '#' for blank slots, '0' for the zero-run,
    # commas kept at their (validated-standard) positions
    jint, seen = [], 0
    for c in int_pat:
        if c == ",":
            jint.append(",")
        else:
            seen += 1
            jint.append("#" if n_int - seen + 1 > min_int else "0")
    jfmt = "".join(jint)
    if has_dot:
        if has_fm and frac_all9:
            jfmt += "." + "#" * n_frac
        else:
            jfmt += "." + "0" * n_frac
    y = f"try_cast(({x_text}) AS DECIMAL(38,{n_frac}))"
    # MI renders the ABSOLUTE digits with a trailing sign character
    # ('  5-' / '  5 ', FM drops the positive space — pinned live);
    # no leading sign slot
    body = (
        f"format_number(abs({y}), '{jfmt}')" if has_mi
        else f"format_number({y}, '{jfmt}')"
    )
    if has_fm and frac_all9:
        # Java keeps the integer 0 for '#'-fraction patterns
        # ('#.##' of .25 = '0.25' — pinned) where pg's FM drops it
        # ('.25'); strip it for |y| < 1, and pin pg's bare-'0.' zero
        if min_int == 0:
            body = (
                f"CASE WHEN {y} = 0 THEN '0.' "
                f"WHEN {y} > -1 AND {y} < 1 THEN "
                f"IF({y} < 0, '-' || substr({body}, 3), "
                f"substr({body}, 2)) ELSE {body} END"
            )
        else:
            body = f"IF({y} = 0, '{'0' * min_int}.', {body})"
    if has_s:
        body = f"IF({y} < 0, {body}, '+' || {body})"
    width = len(fmt.strip()) - (2 if has_fm else 0) - (2 if has_mi else 0)
    if not has_s and not has_mi:
        width += 1
    if not has_fm:
        body = f"lpad({body}, {width}, ' ')"
    if has_mi:
        pos_sfx = "''" if has_fm else "' '"
        body = f"{body} || IF({y} < 0, '-', {pos_sfx})"
    ovf = "".join(
        "#" if c in "09" else c for c in int_pat
    ) + (("." + "#" * n_frac) if has_dot else "")
    xd = f"try_cast(({x_text}) AS DOUBLE)"
    if has_mi:
        ovf_e = f"'{ovf}'"
    elif has_s:
        ovf_e = f"IF({xd} < 0, '-{ovf}', '+{ovf}')"
    else:
        ovf_e = f"IF({xd} < 0, '-{ovf}', '{ovf}')"
    if not has_fm:
        ovf_e = f"lpad({ovf_e}, {width}, ' ')"
    if has_mi:
        pos_sfx = "''" if has_fm else "' '"
        ovf_e = f"{ovf_e} || IF({xd} < 0, '-', {pos_sfx})"
    return (
        f"CASE WHEN ({x_text}) IS NULL THEN NULL "
        f"WHEN {y} IS NULL OR abs({y}) >= {10 ** n_int} THEN {ovf_e} "
        f"ELSE {body} END"
    )


def convert_pg_tochar_segments(fmt: str) -> list:
    """to_char pattern → list of ('pat', java_pattern) / ('wrap',
    template-with-{x}) segments.  The wrap segments carry the name
    fields Java patterns cannot express: pg space-pads DAY/MONTH to 9
    characters and prints EVERY name token case-following-pattern
    ('DAY' → 'SATURDAY ', 'day' → 'saturday ', 'mon' → 'mar', 'am' →
    'pm' — all pinned live on PG 15), so those become
    rpad/upper/lower wraps around single-field date_format calls.  A
    caller joins the pieces with '||' (never concat(): the pg concat
    NULL-skip handler would rewrap the emission)."""
    return _convert_pg_like_format(
        fmt, allow_ff=False, formatting=True, segments=True
    )


def convert_sf_format(fmt: str) -> str:
    """Snowflake TO_CHAR/TO_VARCHAR/TO_DATE/TO_TIMESTAMP pattern → Spark.
    Snowflake's pattern language is Postgres-like plus ``FF[0-9]``
    fractional seconds (bare FF = 9 digits). Numeric patterns
    ('$99,999.00') have no date_format equivalent — loud, same rule as
    convert_pg_format."""
    return _convert_pg_like_format(fmt, allow_ff=True)


# MySQL DATE_FORMAT/STR_TO_DATE %-codes → Spark datetime pattern letters.
# The code SET differs from C strftime (%i is minutes, %M is the month
# NAME, %s/%S both seconds); week-based codes (%U %u %V %v %X %x) and
# day-of-week-number (%w) are deliberately ABSENT — Spark 3+ rejects the
# week patterns, and there is no numeric-day letter — so they raise.
# %D (1st/2nd ordinal suffix) has no Spark form either.
_MYSQL_FMT = {
    "Y": "yyyy", "y": "yy", "m": "MM", "c": "M", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "h": "hh", "I": "hh", "l": "h",
    "i": "mm", "s": "ss", "S": "ss", "f": "SSSSSS", "p": "a",
    "M": "MMMM", "b": "MMM", "a": "EEE", "W": "EEEE", "j": "DDD",
    "r": "hh:mm:ss a", "T": "HH:mm:ss", "%": "%",
}

#: %-codes that indicate a TIME component — used by the STR_TO_DATE
#: handler to pick to_timestamp vs to_date (MySQL returns a DATETIME when
#: the format has time parts, a DATE otherwise).
_MYSQL_TIME_CODES = frozenset("HkhIlisSfprT")


def convert_mysql_format(fmt: str) -> str:
    """MySQL %-code pattern → Spark datetime pattern, quoting literal
    letter runs (same emitter rules as convert_strftime_format). Raises
    on codes with no Spark equivalent (%U week, %w weekday number, %D
    ordinal-suffix day).

    A format with NO %-codes never reaches here (the callers pass it
    through / reject it) — date_format shares its NAME with Spark, so the
    fixpoint's later passes re-read our own emitted Java pattern; blindly
    quoting its letters would corrupt it."""
    out: list[str] = []
    literal: list[str] = []

    def flush() -> None:
        if not literal:
            return
        run = "".join(literal)
        if re.search(r"[A-Za-z']", run):
            out.append("'" + run.replace("'", "''") + "'")
        else:
            out.append(run)
        literal.clear()

    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            if i + 1 >= len(fmt):
                raise TranspileError(f"dangling % in format {fmt!r}")
            code = fmt[i + 1]
            if code not in _MYSQL_FMT:
                raise TranspileError(
                    f"mysql date format code %{code} has no Spark "
                    "datetime pattern"
                )
            flush()
            rep = _MYSQL_FMT[code]
            if rep != "%" and out and out[-1] and out[-1][-1] == rep[0]:
                raise TranspileError(
                    f"adjacent %{code} codes merge in Spark datetime "
                    f"patterns; separate them in format {fmt!r}"
                )
            out.append(rep)
            i += 2
        else:
            literal.append(c)
            i += 1
    flush()
    return "".join(out)


def _mysql_fmt_has_time(fmt: str) -> bool:
    """True when the MySQL format string carries any time-of-day code."""
    return any(
        fmt[i] == "%" and i + 1 < len(fmt) and fmt[i + 1] in _MYSQL_TIME_CODES
        for i in range(len(fmt))
    )


# ---------------------------------------------------------------------------
# Spark-version gating: rename targets that only exist on Spark >= 4.0 must
# fail at RENDER time on older sessions (loud-failure contract), not at
# execution on the cluster.
# ---------------------------------------------------------------------------


def _regex_escape_content(inner: str) -> str:
    """Escape regex metachars in plain text destined for a Spark string
    literal used as a regex. A literal backslash needs FOUR backslashes
    (regex ``\\\\`` with each ``\\`` doubled for the SQL literal); other
    metachars need the doubled escape + themselves. Shared by every
    plain-separator→regex rewrite so the metachar table lives once."""
    return re.sub(
        r"([.^$*+?()\[\]{}|\\])",
        lambda m: "\\\\\\\\" if m.group(1) == "\\" else "\\\\" + m.group(1),
        inner,
    )


def _regex_literal(content: str, read: str) -> str:
    """Spark literal whose CONTENT is the regex-escaped plain text — the
    ONE emitter for every plain-separator→regex rewrite."""
    return (
        "'"
        + _regex_escape_content(content).replace("'", _quote_escape(read))
        + "'"
    )


def _pg_estring_content(lit: str) -> str:
    """Character content of a postgres ``E'...'`` escape-string literal
    (PostgreSQL "String Constants With C-Style Escapes", verified live
    on PostgreSQL 15): ``\\b \\f \\n \\r \\t``, 1–3 digit octal, ``\\x``
    + 1–2 hex digits, ``\\uXXXX`` / ``\\UXXXXXXXX`` unicode (exact
    digit counts — pg itself rejects short forms; UTF-16 surrogate
    pairs combine), ``\\'`` quote, and any OTHER escaped char is the
    bare character (``E'\\q'`` = 'q'). ``''`` doubling applies inside
    E-strings too. Redshift's PG-8.0 escape strings share the
    octal/hex set via _literal_content; modern \\u/\\U decode only
    here. ref: reference delegates to SQLGlot's postgres tokenizer
    for the same construct."""
    body = lit[2:-1]
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "'":  # '' doubling (the lexer guarantees pairing)
            out.append("'")
            i += 2
            continue
        if c != "\\":
            out.append(c)
            i += 1
            continue
        nxt = body[i + 1] if i + 1 < len(body) else ""
        if nxt in "01234567":
            m_oct = re.match(r"[0-7]{1,3}", body[i + 1 : i + 4])
            out.append(chr(int(m_oct.group(), 8)))
            i += 1 + len(m_oct.group())
            continue
        if nxt == "x":
            m_hex = re.match(r"[0-9a-fA-F]{1,2}", body[i + 2 : i + 4])
            if m_hex:
                out.append(chr(int(m_hex.group(), 16)))
                i += 2 + len(m_hex.group())
                continue
            out.append("x")  # \x with no hex digit → bare 'x'
            i += 2
            continue
        if nxt == "u":
            if not re.fullmatch(r"[0-9a-fA-F]{4}", body[i + 2 : i + 6]):
                raise TranspileError(
                    rf"invalid Unicode escape in {lit!r}: \u needs "
                    "exactly four hex digits (postgres rejects it too)"
                )
            cp = int(body[i + 2 : i + 6], 16)
            if 0xD800 <= cp <= 0xDBFF:
                if body[i + 6 : i + 8] == "\\u" and re.fullmatch(
                    r"[0-9a-fA-F]{4}", body[i + 8 : i + 12]
                ):
                    lo = int(body[i + 8 : i + 12], 16)
                    if 0xDC00 <= lo <= 0xDFFF:
                        cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                        out.append(chr(cp))
                        i += 12
                        continue
                raise TranspileError(
                    f"lone UTF-16 surrogate \\u{cp:04x} in {lit!r}"
                )
            if 0xDC00 <= cp <= 0xDFFF:
                raise TranspileError(
                    f"lone UTF-16 low surrogate \\u{cp:04x} in {lit!r}"
                )
            out.append(chr(cp))
            i += 6
            continue
        if nxt == "U":
            if not re.fullmatch(r"[0-9a-fA-F]{8}", body[i + 2 : i + 10]):
                raise TranspileError(
                    rf"invalid Unicode escape in {lit!r}: \U needs "
                    "exactly eight hex digits"
                )
            cp = int(body[i + 2 : i + 10], 16)
            if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                raise TranspileError(
                    f"\\U{cp:08x} in {lit!r} is not a valid code point"
                )
            out.append(chr(cp))
            i += 10
            continue
        if nxt in ("n", "t", "r", "b", "f"):
            out.append(_SIMPLE_ESCAPES[nxt])
            i += 2
            continue
        # \' \\ and every unknown escape: the bare character
        out.append(nxt)
        i += 2
    return "".join(out)


#: escapes shared by snowflake AND bigquery string grammars.
_SIMPLE_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
    "\\": "\\", "'": "'", '"': '"', "`": "`",
}

#: bigquery-only escapes (GoogleSQL); snowflake reads these as the bare
#: character via its unknown-escape rule.
_BQ_EXTRA_ESCAPES = {"a": "\a", "v": "\v", "?": "?"}


def _decode_u_escape(body: str, i: int, read: str) -> tuple[str, int] | None:
    """Decode ``\\uXXXX`` (and bigquery ``\\Uhhhhhhhh``) at body[i:].
    Snowflake writes non-BMP chars as UTF-16 surrogate PAIRS of \\u
    escapes — combined here (a lone surrogate would make the output
    unencodable, crashing far from the source). BigQuery FORBIDS
    surrogate code points in \\u (non-BMP uses \\U) — LOUD, matching the
    source dialect's own rejection."""
    esc = body[i + 1 : i + 2]
    if read == "bigquery" and esc == "U":
        if not re.fullmatch(r"[0-9a-fA-F]{8}", body[i + 2 : i + 10]):
            raise TranspileError(r"\U escape needs exactly eight hex digits")
        cp = int(body[i + 2 : i + 10], 16)
        if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            raise TranspileError(f"\\U{cp:08x} is not a valid code point")
        return chr(cp), i + 10
    if not (esc == "u" and re.fullmatch(r"[0-9a-fA-F]{4}", body[i + 2 : i + 6])):
        return None
    cp = int(body[i + 2 : i + 6], 16)
    if 0xD800 <= cp <= 0xDBFF:
        if read == "snowflake" and (
            body[i + 6 : i + 8] == "\\u"
            and re.fullmatch(r"[0-9a-fA-F]{4}", body[i + 8 : i + 12])
        ):
            lo = int(body[i + 8 : i + 12], 16)
            if 0xDC00 <= lo <= 0xDFFF:
                cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                return chr(cp), i + 12
        raise TranspileError(
            f"surrogate \\u{cp:04x} in string literal"
            + (r" (bigquery non-BMP uses \U........)" if read == "bigquery" else "")
        )
    if 0xDC00 <= cp <= 0xDFFF:
        raise TranspileError(
            f"lone UTF-16 low surrogate \\u{cp:04x} in string literal"
        )
    return chr(cp), i + 6


#: character → Spark-literal escape for re-emitting decoded content. Raw
#: chars pass through (py4j ships any unicode); only chars Spark's parser
#: would misread unescaped, plus common controls for readability, map.
_SPARK_EMIT = {
    "\\": "\\\\", "\n": "\\n", "\t": "\\t",
    "\r": "\\r", "\b": "\\b",
}


def _quote_escape(read: str) -> str:
    """How an embedded quote re-emits, per READ grammar (later fixpoint
    passes re-lex our own output): doubled for std grammars (they cannot
    lex a backslash-quote), backslash-quote for snowflake/bigquery — a
    doubled-quote literal whose content STARTS with a quote would open
    with a triple-quote run that the bigquery grammar reads as a
    triple-quoted string, mis-spanning across tokens. Both forms are
    valid Spark."""
    return "\\'" if read in ESCAPE_LITERAL_DIALECTS else "''"


def _spark_string_literal(content: str, read: str) -> str:
    """Render character content as a single-quoted Spark SQL literal,
    re-lexable under the READ dialect grammar."""
    qe = _quote_escape(read)
    return (
        "'"
        + "".join(qe if c == "'" else _SPARK_EMIT.get(c, c) for c in content)
        + "'"
    )


def _raw_body(lit: str) -> str:
    """Body of a BigQuery RAW string token (after the r prefix) - no
    escape processing, but triple-quoted raw forms strip three quotes."""
    return lit[3:-3] if lit[:3] in ("'''", '"""') else lit[1:-1]

def _literal_content(lit: str, read: str) -> str:
    """Decode a string literal token's body to its character content per
    the read dialect's escape rules: '' doubling everywhere; backslash
    escapes additionally in snowflake/bigquery — ``\\uXXXX`` unicode
    (snowflake surrogate pairs combined), snowflake ``\\0``/``\\xhh``,
    bigquery ``\\ooo`` octal / ``\\[xX]hh`` hex / ``\\Uhhhhhhhh`` /
    ``\\a``/``\\v``/``\\?``. Snowflake reads any other unknown escape as
    the bare character; bigquery rejects it — LOUD here rather than
    guessing."""
    # postgres E'...' escape-string literals (their own lexer
    # alternative) decode C-style escapes; plain pg literals are
    # standard. Routed here so every handler that reads literal content
    # (regex args, JSON keys, format strings) sees the decoded
    # characters, not the raw escape text.
    if read == "postgres" and lit[0] in "eE":
        return _pg_estring_content(lit)
    body = lit[1:-1]
    if read in _STD_LITERAL_DIALECTS:
        return body.replace("''", "'")
    q = lit[0]  # quote-doubling collapses the literal's OWN quote char
    # BigQuery triple-quoted strings ('''...''' / \"\"\"...\"\"\") lex as one
    # token (dedicated _BQ_TOKEN_RE alternatives); inside them quote chars
    # are LITERAL (no doubling rule), only backslash escapes apply.
    # BIGQUERY ONLY: snowflake has no triple form — there '''abc''' is the
    # standard doubling fold with content 'abc' INCLUDING the quotes.
    if (
        read == "bigquery"
        and len(lit) >= 6
        and lit[:3] == q * 3
        and lit[-3:] == q * 3
    ):
        body = lit[3:-3]
        q = ""  # disables the doubling branch below
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            # \uXXXX decoding is a snowflake/bigquery feature; redshift
            # (PG-8.0 escape strings) and mysql read \u as a bare 'u'.
            u = (
                _decode_u_escape(body, i, read)
                if read in ("snowflake", "bigquery")
                else None
            )
            if u is not None:
                out.append(u[0])
                i = u[1]
                continue
            if read == "mysql":
                # MySQL's fixed escape set: \0 NUL, \Z ctrl-Z, \b \n \r
                # \t, quotes, backslash; \% and \_ keep their backslash
                # (two-character output, per the manual); anything else
                # drops the backslash.
                if nxt == "0":
                    out.append("\0")
                elif nxt == "Z":
                    out.append("\x1a")
                elif nxt in ("%", "_"):
                    out.append("\\" + nxt)
                elif nxt in ("'", '"', "\\", "b", "n", "r", "t"):
                    out.append(_SIMPLE_ESCAPES[nxt])
                else:
                    out.append(nxt)
                i += 2
                continue
            if read == "redshift" and nxt in "01234567":
                m_oct = re.match(r"[0-7]{1,3}", body[i + 1 : i + 4])
                out.append(chr(int(m_oct.group(), 8)))
                i += 1 + len(m_oct.group())
                continue
            if read == "redshift" and nxt == "x":
                m_hex = re.match(r"[0-9a-fA-F]{1,2}", body[i + 2 : i + 4])
                if m_hex:
                    out.append(chr(int(m_hex.group(), 16)))
                    i += 2 + len(m_hex.group())
                    continue
                # \x with no hex digit → bare 'x' (PG unknown-escape rule)
            if read == "bigquery" and nxt in "01234567":
                # bigquery octal is EXACTLY three digits (\ooo); there is
                # no bare \0 escape
                if re.fullmatch(r"[0-7]{3}", body[i + 1 : i + 4]):
                    out.append(chr(int(body[i + 1 : i + 4], 8)))
                    i += 4
                    continue
                raise TranspileError(
                    f"bigquery octal escape in {lit!r} needs exactly "
                    "three digits (\\ooo)"
                )
            if read == "snowflake" and nxt == "0":
                out.append("\0")
                i += 2
                continue
            if read == "clickhouse":
                # ClickHouse's documented set: C escapes + \0, \xHH and
                # the \/ \= \` forms; anything else is LOUD rather than
                # guessed (the server itself warns on unknown escapes).
                if nxt == "0":
                    out.append("\0")
                    i += 2
                    continue
                if nxt in ("/", "="):
                    out.append(nxt)
                    i += 2
                    continue
                if nxt in ("a", "v"):
                    out.append(_BQ_EXTRA_ESCAPES[nxt])
                    i += 2
                    continue
                if nxt == "x" and re.fullmatch(
                    r"[0-9a-fA-F]{2}", body[i + 2 : i + 4]
                ):
                    out.append(chr(int(body[i + 2 : i + 4], 16)))
                    i += 4
                    continue
                if nxt in _SIMPLE_ESCAPES:
                    out.append(_SIMPLE_ESCAPES[nxt])
                    i += 2
                    continue
                # unknown escape: ClickHouse keeps BOTH characters
                # (parseComplexEscapeSequence) — how \1 regex backrefs
                # survive in replaceRegexpAll replacements
                out.append("\\" + nxt)
                i += 2
                continue
            if (
                nxt in ("x", "X")
                and (read == "bigquery" or (read == "snowflake" and nxt == "x"))
                and re.fullmatch(r"[0-9a-fA-F]{2}", body[i + 2 : i + 4])
            ):
                out.append(chr(int(body[i + 2 : i + 4], 16)))
                i += 4
                continue
            if nxt in _SIMPLE_ESCAPES:
                out.append(_SIMPLE_ESCAPES[nxt])
            elif read == "bigquery" and nxt in _BQ_EXTRA_ESCAPES:
                out.append(_BQ_EXTRA_ESCAPES[nxt])
            elif read in ("snowflake", "redshift"):
                # unknown escape → the bare character (both dialects'
                # documented rule; redshift inherits PG 8.0's)
                out.append(nxt)
            else:
                raise TranspileError(
                    f"escape sequence \\{nxt} in {lit!r} has no decoder"
                )
            i += 2
        elif c == q and i + 1 < len(body) and body[i + 1] == q:
            out.append(q)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _regex_replacement_to_spark(content: str) -> str:
    """Convert a read-dialect regex REPLACEMENT string (backrefs ``\\1`` …
    ``\\9``, ``\\\\`` literal backslash, ``$`` ordinary) to Java/Spark
    replacement syntax (``$1`` backrefs, ``\\$`` literal dollar). Passing
    a read-dialect replacement through unconverted silently rewrites
    every backreference as literal text — this is the fidelity seam."""
    out: list[str] = []
    i = 0
    n = len(content)
    while i < n:
        c = content[i]
        if c == "\\":
            if i + 1 >= n:
                raise TranspileError(
                    "regexp_replace replacement ends with a lone backslash"
                )
            nxt = content[i + 1]
            if nxt.isdigit():
                out.append("$" + nxt)
            elif nxt == "\\":
                out.append("\\\\")
            else:
                raise TranspileError(
                    f"replacement escape \\{nxt} has no Spark rewrite"
                )
            i += 2
        elif c == "$":
            out.append("\\$")
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)



#: token kinds that can act as an identifier/name in expression position.
#: ("qident" is kept for compatibility; the span tokenizer emits


def _regex_has_capture_group(pat: str) -> bool:
    """True iff the POSIX/Java regex has a CAPTURING group: an
    unescaped ``(`` outside a ``[...]`` bracket class not followed by
    ``?``. A char-by-char scan (escape state + class state) — the
    naive lookbehind regex misreads ``[(]`` (literal paren in a class:
    zero groups) and ``a\\\\(b)`` (escaped backslash then a REAL
    group)."""
    esc = False
    in_class = False
    n_ = len(pat)
    for idx, c in enumerate(pat):
        if esc:
            esc = False
            continue
        if c == "\\":
            esc = True
            continue
        if in_class:
            if c == "]":
                in_class = False
            continue
        if c == "[":
            in_class = True
            continue
        if c == "(" and not (idx + 1 < n_ and pat[idx + 1] == "?"):
            return True
    return False


def _pg_regex_substring_emit(source_text: str, pat: str, read: str) -> str:
    """Shared emission for BOTH pg regex-substring spellings
    (substring(s FROM 'pat') and substring(s, 'pat')): group 1 when the
    pattern captures, else the whole match; NULL on no match."""
    pat = convert_regex_literal(convert_posix_classes(pat), read)
    g = 1 if _regex_has_capture_group(pat) else 0
    return (
        f"nullif(regexp_extract(({source_text}), "
        f"{_spark_string_literal(pat, read)}, {g}), '')"
    )


# ---------------------------------------------------------------------------
# Postgres interval literals: static (months, days, micros) decomposition
# ---------------------------------------------------------------------------

#: verbose-unit → (months, days, micros) multiplier per 1 unit. The
#: spellings are the ones pg's DecodeUnits accepts (checked live on
#: PostgreSQL 15); unknown units return None → the caller stays loud.
_PG_IV_UNITS = {}
for _names, _mul in (
    (("microsecond", "microseconds", "us", "usec", "usecs"), (0, 0, 1)),
    (("millisecond", "milliseconds", "ms", "msec", "msecs"), (0, 0, 1_000)),
    (("second", "seconds", "sec", "secs", "s"), (0, 0, 1_000_000)),
    (("minute", "minutes", "min", "mins", "m"), (0, 0, 60_000_000)),
    (("hour", "hours", "hr", "hrs", "h"), (0, 0, 3_600_000_000)),
    (("day", "days", "d"), (0, 1, 0)),
    (("week", "weeks", "w"), (0, 7, 0)),
    (("month", "months", "mon", "mons"), (1, 0, 0)),
    (("year", "years", "yr", "yrs", "y"), (12, 0, 0)),
    (("decade", "decades", "dec", "decs"), (120, 0, 0)),
    (("century", "centuries", "c"), (1200, 0, 0)),
    (("millennium", "millenniums", "millennia", "mil", "mils"),
     (12000, 0, 0)),
):
    for _nm in _names:
        _PG_IV_UNITS[_nm] = _mul


def _pg_iv_tdiv(a: int, b: int) -> int:
    """C-style integer division (truncate toward zero), pg's rule for
    interval field math."""
    q = abs(a) // b
    return q if (a >= 0) == (b >= 0) else -q


def _pg_interval_parts(text: str) -> "tuple[int, int, int] | None":
    """Statically decompose a pg interval literal into its stored
    (months, days, microseconds) components, or None when the text
    isn't one of the statically parseable shapes (verbose units,
    hh:mm[:ss[.f]], bare seconds, ISO-8601 P-form, optional 'ago').

    Fraction spilling follows pg's DecodeInterval: fractional years →
    months (×12), fractional months → days (×30), fractional
    weeks/days → time (×86400s), fractional time units → rounded
    microseconds. ref: reference delegates interval semantics to the
    target engine (sqlmesh/core/dialect.py); verified live on PG 15
    ('1.5 days' → 1 day 12:00:00, '26 hours 3 minutes' keeps hour=26).
    """
    s = text.strip().lower()
    if not s:
        return None
    months = days = 0
    micros = 0.0
    negate_all = False
    if s.endswith(" ago"):
        negate_all = True
        s = s[: -4].rstrip()
    if s.startswith(("p", "+p", "-p")):
        # ISO 8601: P[nY][nM][nW][nD][T[nH][nM][nS]] — M means month
        # before the T separator, minute after it
        sign = -1 if s[0] == "-" else 1
        body = s.lstrip("+-")[1:]
        dpart, _, tp = body.partition("t")
        consumed = ""
        # per-component signs are valid ISO in pg: 'P-1Y3D' is
        # -1 years +3 days (pinned live, round 10)
        for num, unit in re.findall(
            r"(-?[0-9]+(?:\.[0-9]+)?)([a-z])", dpart
        ):
            v = float(num) * sign
            mul = {"y": (12, 0), "m": (1, 0), "w": (0, 7),
                   "d": (0, 1)}.get(unit)
            if mul is None:
                return None
            fm = v * mul[0]
            months += int(fm)
            vd = v * mul[1] + (fm - int(fm)) * 30
            days += int(vd)
            micros += (vd - int(vd)) * 86_400_000_000
            consumed += num + unit
        for num, unit in re.findall(
            r"(-?[0-9]+(?:\.[0-9]+)?)([a-z])", tp
        ):
            v = float(num) * sign
            mul = {"h": 3_600_000_000, "m": 60_000_000,
                   "s": 1_000_000}.get(unit)
            if mul is None:
                return None
            micros += v * mul
            consumed += num + unit
        if consumed != dpart + tp:
            return None  # unconsumed text (e.g. sql-standard P0000-01)
    else:
        # verbose: [sign]number [unit], repeatable, plus at most one
        # [sign]hh:mm[:ss[.f]] clock segment (bare number = seconds)
        toks = re.findall(
            r"[+-]?\d+:\d+(?::\d+(?:\.\d+)?)?|[+-]?\d*\.?\d+|[a-z]+", s
        )
        if not toks or any(
            t not in _PG_IV_UNITS and not re.match(r"^[+-]?[\d.:]+$", t)
            for t in toks
        ):
            return None
        k = 0
        seen_clock = False
        while k < len(toks):
            t = toks[k]
            if ":" in t:
                if seen_clock:
                    return None
                seen_clock = True
                sign = -1 if t.startswith("-") else 1
                fields = t.lstrip("+-").split(":")
                h = int(fields[0])
                mi = int(fields[1])
                se = float(fields[2]) if len(fields) > 2 else 0.0
                if mi >= 60 or se >= 60:
                    return None  # pg rejects; don't guess
                micros += sign * (
                    h * 3_600_000_000 + mi * 60_000_000 + se * 1_000_000
                )
                k += 1
                continue
            # number [unit]
            v = float(t)
            unit = None
            if k + 1 < len(toks) and toks[k + 1] in _PG_IV_UNITS:
                unit = toks[k + 1]
                k += 2
            else:
                # bare trailing number = seconds (pg's rule)
                unit = "s"
                k += 1
            mm, dd, uu = _PG_IV_UNITS[unit]
            fm = v * mm
            months += int(fm)  # trunc toward zero, pg's rule
            frac_m = fm - int(fm)
            vd = v * dd + frac_m * 30
            days += int(vd)
            micros += (vd - int(vd)) * 86_400_000_000 + v * uu
    if negate_all:
        months, days, micros = -months, -days, -micros
    # pg rounds sub-microsecond remainders (rint)
    mic = int(round(micros))
    return months, days, mic


def _pg_interval_field(field: str, parts: "tuple[int, int, int]"):
    """pg extract(field FROM interval)'s value for a decomposed
    interval — fields do NOT normalize across component boundaries
    (hour of '26 hours' is 26; day of '2 days 26 hours' is 2), unlike
    Spark's auto-normalizing day-time intervals. Returns an int, a
    float, or None for an unsupported field. Semantics pinned live on
    PG 15 (see tests/test_dialect_fuzz_pg.py interval-extract group).
    """
    months, days, micros = parts
    td = _pg_iv_tdiv
    if field in ("year", "years"):
        return td(months, 12)
    if field in ("month", "months", "mon", "mons"):
        return months - td(months, 12) * 12
    if field == "quarter":
        return td(months - td(months, 12) * 12, 3) + 1
    if field in ("day", "days"):
        return days
    # NO week branch: PG 15 itself rejects extract(week FROM interval)
    # ('unit "week" not supported for type interval', verified live) —
    # returning None keeps the caller loud on a pg-rejected shape.
    if field in ("hour", "hours"):
        return td(micros, 3_600_000_000)
    if field in ("minute", "minutes", "min", "mins"):
        return td(micros, 60_000_000) - td(micros, 3_600_000_000) * 60
    rem_min = micros - td(micros, 60_000_000) * 60_000_000
    if field in ("second", "seconds", "sec", "secs"):
        v = rem_min / 1_000_000
        return int(v) if v == int(v) else v
    if field in ("microseconds", "microsecond"):
        return rem_min
    if field in ("milliseconds", "millisecond"):
        v = rem_min / 1_000
        return int(v) if v == int(v) else v
    if field == "decade":
        return td(months, 120)
    if field == "century":
        return td(months, 1200)
    if field == "millennium":
        return td(months, 12000)
    if field == "epoch":
        # pg: years at 365.25 d, leftover months at 30 d (verified:
        # epoch('1 year') = 31557600, epoch('1 month') = 2592000)
        yrs = td(months, 12)
        v = (
            micros / 1_000_000
            + days * 86_400
            + yrs * 31_557_600
            + (months - yrs * 12) * 2_592_000
        )
        return int(v) if v == int(v) else v
    return None
