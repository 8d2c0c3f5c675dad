"""Type-rewrite machinery for the read-dialect transpiler: per-dialect
type maps (bare, parameterized, param-dropping), the shared ``::`` /
CAST-AS decision tree (_type_token_edits), and the castee wrappers —
numeric->int round()/bround() (_maybe_round_castee) and the pg
varchar(n) truncation (_maybe_varchar_truncate).

Split out of core/transpile_shared.py (round 8, restoring the round-6
module discipline: every transpile-family module <= 1,100 lines); the
bodies are unchanged, so file:line references in docstrings and
VERDICT history still resolve against git history. _TWO_WORD_TYPES
stays in transpile_shared: _backward_primary (a shared primary parser)
steps over two-word ``::`` postfixes with it.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _TWO_WORD_TYPES,
    _backward_primary,
    _call_arg_spans,
)

_TYPE_MAP = {
    "hugeint": "DECIMAL(38,0)",
    "int128": "DECIMAL(38,0)",
    "ubigint": "DECIMAL(20,0)",
    "uinteger": "BIGINT",
    "usmallint": "INT",
    "utinyint": "SMALLINT",
    "int1": "TINYINT",
    "int2": "SMALLINT",
    "int4": "INT",
    "int8": "BIGINT",
    "signed": "BIGINT",
    "text": "STRING",
    "varchar": "STRING",                # bare VARCHAR (no length) → STRING
    "bpchar": "STRING",
    "blob": "BINARY",
    "bytea": "BINARY",
    "real": "FLOAT",
    "float4": "FLOAT",
    "float8": "DOUBLE",
    "timestamptz": "TIMESTAMP",
    "timestamp_s": "TIMESTAMP",
    "timestamp_ms": "TIMESTAMP",
    "logical": "BOOLEAN",
    "bool": "BOOLEAN",
}

# Per-dialect overlays on _TYPE_MAP. A value of None is LOUD — the type
# has no faithful Spark representation (silently narrowing BIGNUMERIC's
# 76 digits to DECIMAL(38) would corrupt data, not transpile it).
_DIALECT_TYPES: dict[str, dict[str, str | None]] = {
    "postgres": {
        # bare numeric/decimal is ARBITRARY precision and scale in pg
        # (fractions preserved); Spark's bare DECIMAL is DECIMAL(10,0)
        # — a silent scale truncation. LOUD, like oracle bare NUMBER;
        # numeric(p,s) passes through.
        "numeric": None,
        "decimal": None,
        # json preserves source text exactly; jsonb normalizes its text
        # form (whitespace/key order) — the STRING cast keeps the
        # ORIGINAL text, which is exact for all extraction paths
        # (get_json_object navigates structure, not text form) and
        # diverges only when the jsonb TEXT form itself is compared —
        # the documented ->> object/array text caveat.
        "json": "STRING",
        "jsonb": "STRING",
        # pg char(n)/character(n) blank-pad on store but comparisons
        # and length() IGNORE the padding (verified live: 'a'::char(3)
        # = 'a' is true, length = 1, text form 'a  ') — no Spark type
        # reproduces that split personality. varchar(n) (truncating)
        # rewrites via _maybe_varchar_truncate; bare ::char truncates
        # to ONE char in pg — loud, not a silent identity.
        "char": None,
        "character": None,
        # round 8: pg types Spark lacks. TIME would parse but is
        # unsupported at analysis; money carries locale formatting;
        # tsvector/tsquery/xml/network types have no analog. uuid's
        # text form is identical lowercase-hex on both → STRING.
        # interval as a CAST TARGET is loud here; the postgres token
        # handler rewrites literal '...'::interval to an INTERVAL
        # literal BEFORE this lookup runs.
        "time": None,
        "timetz": None,
        "money": None,
        "tsvector": None,
        "tsquery": None,
        "xml": None,
        "inet": None,
        "cidr": None,
        "macaddr": None,
        "macaddr8": None,
        "interval": None,
        # name is pg's 63-BYTE-truncating identifier type (round 11):
        # a rename to STRING would silently skip the truncation and
        # the bare word fails Spark's parser as an unknown type
        "name": None,
        "regclass": None,
        "regtype": None,
        "uuid": "STRING",
    },
    "duckdb": {
        # duckdb bare DECIMAL/NUMERIC is DECIMAL(18,3) by spec; Spark's
        # bare DECIMAL is DECIMAL(10,0)
        "numeric": "DECIMAL(18,3)",
        "decimal": "DECIMAL(18,3)",
        "json": "STRING",               # duckdb JSON keeps source text
    },
    "snowflake": {
        "number": "DECIMAL(38,0)",      # bare NUMBER; NUMBER(p,s) passes through
        "float": "DOUBLE",              # Snowflake FLOAT/FLOAT4/FLOAT8/REAL are all fp64
        "float4": "DOUBLE",
        "real": "DOUBLE",
        "timestamp_ltz": "TIMESTAMP",
        "timestamp_tz": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP_NTZ",
        "byteint": "DECIMAL(38,0)",     # byteint is NUMBER(38,0) in Snowflake
        "geography": None,
        "geometry": None,
    },
    "bigquery": {
        "int64": "BIGINT",
        "float64": "DOUBLE",
        "bytes": "BINARY",
        "numeric": "DECIMAL(38,9)",
        "bignumeric": None,             # 76.76 digits exceed Spark DECIMAL(38)
        "datetime": "TIMESTAMP_NTZ",
        "geography": None,
        "json": None,                   # BQ JSON type vs Spark VARIANT → loud
    },
    "redshift": {
        "super": None,                  # semi-structured SUPER → no analog
        "varbyte": "BINARY",
        "geometry": None,
        "geography": None,
        "hllsketch": None,
        "timetz": None,                 # TIME types have no Spark analog
        "time": None,
    },
    "oracle": {
        "varchar2": "STRING",           # bare; VARCHAR2(n) via _PARAM_TYPES
        "nvarchar2": "STRING",
        "clob": "STRING",
        "nclob": "STRING",
        "long": None,                   # deprecated 2GB text → migrate first
        "raw": "BINARY",
        "long_raw": None,
        "blob": "BINARY",
        "number": None,                 # bare NUMBER has arbitrary scale
                                        # (fractions allowed) — DECIMAL(38,0)
                                        # would truncate; NUMBER(p,s) maps
        "binary_float": "FLOAT",
        "binary_double": "DOUBLE",
        "float": "DOUBLE",              # Oracle FLOAT is NUMBER-backed fp
        # Oracle DATE carries TIME-OF-DAY (second precision) — mapping to
        # Spark DATE would silently drop it.
        "date": "TIMESTAMP_NTZ",
        "timestamp": "TIMESTAMP_NTZ",   # Oracle TIMESTAMP is zone-less
        "rowid": None, "urowid": None,
        "xmltype": None,
        "sdo_geometry": None,
    },
    "tsql": {
        "datetime": "TIMESTAMP_NTZ",
        "datetime2": "TIMESTAMP_NTZ",
        "smalldatetime": "TIMESTAMP_NTZ",
        "datetimeoffset": "TIMESTAMP",
        "bit": "BOOLEAN",
        "uniqueidentifier": "STRING",
        "nvarchar": "STRING",           # bare; NVARCHAR(n) via _PARAM_TYPES
        "nchar": "STRING",
        "ntext": "STRING",
        "text": "STRING",
        "image": "BINARY",
        "varbinary": "BINARY",
        "binary": "BINARY",
        "money": "DECIMAL(19,4)",
        "smallmoney": "DECIMAL(10,4)",
        # T-SQL TINYINT is UNSIGNED 0..255; Spark's is signed -128..127 —
        # widen to keep values representable.
        "tinyint": "SMALLINT",
        "float": "DOUBLE",              # bare FLOAT defaults to fp64
        "real": "FLOAT",
        "time": None,
        "sql_variant": None,
        "xml": None,
        "geography": None, "geometry": None, "hierarchyid": None,
    },
    "clickhouse": {
        # CH Int8 is 8 BITS (TINYINT) — the base map's int8→BIGINT is the
        # Postgres/DuckDB byte-width spelling, overridden here.
        "int8": "TINYINT", "int16": "SMALLINT",
        "int32": "INT", "int64": "BIGINT",
        # Int128 max (~1.7e38) exceeds DECIMAL(38,0)'s 10^38-1 — a
        # narrowing cast would break data-dependently → loud like int256
        "int128": None, "int256": None,
        "uint8": "SMALLINT", "uint16": "INT",
        "uint32": "BIGINT", "uint64": "DECIMAL(20,0)",
        "uint128": None, "uint256": None,
        "float32": "FLOAT", "float64": "DOUBLE",
        "string": "STRING",
        "date32": "DATE",
        "datetime": "TIMESTAMP",        # epoch-stored, session-zone shown
        "datetime64": "TIMESTAMP",
        "uuid": "STRING",
        "ipv4": None, "ipv6": None,
        "json": None, "object": None,
        "enum8": None, "enum16": None, "enum": None,
        "fixedstring": None,            # value-padded equality semantics
        "tuple": None,                  # rewrite as STRUCT<...>
        "aggregatefunction": None, "simpleaggregatefunction": None,
        "point": None, "ring": None, "polygon": None, "multipolygon": None,
    },
    "trino": {
        "varbinary": "BINARY",
        # Trino TIMESTAMP is zone-less; TIMESTAMP WITH TIME ZONE (the
        # multiword form, handled in _type_token_edits) maps to the
        # fixpoint-stable TIMESTAMP_LTZ spelling.
        "timestamp": "TIMESTAMP_NTZ",
        "json": None,                   # JSON type vs Spark VARIANT → loud
        "time": None, "timetz": None,
        "uuid": "STRING",               # canonical-text round-trip
        "ipaddress": None, "ipprefix": None,
        "hyperloglog": None, "p4hyperloglog": None,
        "qdigest": None, "tdigest": None,
        "geometry": None, "sphericalgeography": None,
        "row": None,                    # ROW(...) → rewrite as STRUCT<...>
    },
    "mysql": {
        "datetime": "TIMESTAMP_NTZ",    # wall-clock, no zone
        "unsigned": "DECIMAL(20,0)",    # CAST(x AS UNSIGNED)
        "char": "STRING",               # CAST(x AS CHAR) = string conversion
        "nchar": "STRING",
        "mediumint": "INT",
        "real": "DOUBLE",               # MySQL REAL is fp64 (REAL_AS_FLOAT off)
        "tinytext": "STRING",
        "mediumtext": "STRING",
        "longtext": "STRING",
        "tinyblob": "BINARY",
        "mediumblob": "BINARY",
        "longblob": "BINARY",
        "json": None,                   # MySQL JSON type → loud
        "enum": None,
        "set": None,
        "year": None,                   # YEAR type (1901-2155) → loud
        "time": None,
        "bit": None,                    # BIT(n) bitfield → loud
        "geometry": None,
        "point": None, "linestring": None, "polygon": None,
    },
}


# Parameterized type names: the base word renames, the (p[,s]) argument
# list is preserved (CAST(x AS NUMBER(10,2)) → CAST(x AS DECIMAL(10,2))).
# Spark has no NUMBER; bare NUMBER is handled by _DIALECT_TYPES.
_PARAM_TYPES: dict[str, dict[str, str]] = {
    # pg numeric(p,s)/decimal(p,s) are exact Spark DECIMAL(p,s); only
    # the BARE forms are loud (arbitrary precision, _DIALECT_TYPES)
    "postgres": {"numeric": "DECIMAL", "decimal": "DECIMAL"},
    "snowflake": {"number": "DECIMAL"},
    "oracle": {
        "number": "DECIMAL",
        "varchar2": "VARCHAR",
        "nvarchar2": "VARCHAR",
        "raw": "BINARY",                # RAW(n) → length dropped by Spark
    },
    "tsql": {
        "nvarchar": "VARCHAR",
        "nchar": "CHAR",
        "varbinary": "BINARY",
        "binary": "BINARY",
    },
}

# Parameterized types whose precision argument has no Spark form — the
# whole ``name(args)`` span is replaced, args DROPPED (TIMESTAMP_NTZ(3)
# would not parse). Widening precision is lossless in every entry.
_PARAM_DROP_TYPES: dict[str, dict[str, str]] = {
    "tsql": {
        "datetime2": "TIMESTAMP_NTZ",
        "datetimeoffset": "TIMESTAMP",
        "float": "DOUBLE",              # FLOAT(n): n≤24 is fp32 — widened
    },
    "oracle": {
        "timestamp": "TIMESTAMP_NTZ",   # TIMESTAMP(6) fractional precision
        "float": "DOUBLE",              # FLOAT(binary_precision)
    },
    "trino": {
        "timestamp": "TIMESTAMP_NTZ",   # TIMESTAMP(3) fractional precision
    },
    "clickhouse": {
        "datetime": "TIMESTAMP",        # precision-only args drop; a
                                        # STRING (timezone) argument
                                        # RAISES in _type_token_edits —
                                        # the zone changes which instant
                                        # a string operand parses to
        "datetime64": "TIMESTAMP",      # DateTime64(3)
    },
}


import functools


@functools.lru_cache(maxsize=None)
def _type_map(read: str):
    """Merged base+overlay type map, built once per dialect — this sits on
    the per-token render hot path (every :: and CAST)."""
    base: dict[str, str | None] = dict(_TYPE_MAP)
    base.update(_DIALECT_TYPES.get(read, {}))
    return base


_LOUD_TYPE = object()  # sentinel distinguishing "no rewrite" from "loud"


def _lookup_type(read: str, tname: str) -> str | None:
    """Spark rename for ``tname`` in ``read`` dialect; None when the name
    needs no rewrite. Raises for types with no faithful Spark form."""
    mapped = _type_map(read).get(tname, _LOUD_TYPE)
    if mapped is _LOUD_TYPE:
        return None
    if mapped is None:
        raise TranspileError(
            f"type {tname!r} has no faithful Spark representation"
        )
    return mapped



def _type_token_edits(toks, i: int, read: str, is_op) -> tuple[list, int]:
    """Shared type-rewrite decision tree for the token FOLLOWING ``::`` or
    a CAST's type-introducing AS (both syntaxes must stay in lockstep).
    Returns (edits, tokens_consumed_after_i)."""
    tname = toks[i + 1][1].lower()
    if (
        read in ("postgres", "redshift", "duckdb", "ansi")
        and i + 2 < len(toks)
        and toks[i + 2][0] == "ident"
        and (tname, toks[i + 2][1].lower()) in _TWO_WORD_TYPES
    ):
        two = _TWO_WORD_TYPES[(tname, toks[i + 2][1].lower())]
        if two is None:
            raise TranspileError(
                f"type {tname} {toks[i + 2][1]!r} has no faithful Spark "
                "representation"
            )
        return [(toks[i + 1][2], toks[i + 2][3], two)], 3
    if read == "clickhouse" and is_op(i + 2, "("):
        if tname in ("nullable", "lowcardinality"):
            # Unwrap: CAST(x AS Nullable(Int64)) → CAST(x AS Int64) —
            # every Spark type is nullable and LowCardinality is a
            # storage hint. The inner type (possibly itself
            # parameterized) is rewritten on the next fixpoint pass.
            depth = 0
            close_j = None
            for j in range(i + 2, len(toks)):
                if toks[j][0] == "op" and toks[j][1] == "(":
                    depth += 1
                elif toks[j][0] == "op" and toks[j][1] == ")":
                    depth -= 1
                    if depth == 0:
                        close_j = j
                        break
            if close_j is not None:
                return (
                    [
                        (toks[i + 1][2], toks[i + 2][3], ""),
                        (toks[close_j][2], toks[close_j][3], ""),
                    ],
                    2,
                )
    if (
        read in ("clickhouse", "duckdb")
        and is_op(i + 2, "(")
        and tname in ("array", "map")
    ):
        # Array(T) → ARRAY<T>, Map(K, V) → MAP<K, V> for plain
        # single-ident element types (clickhouse Array/Map, duckdb
        # MAP(VARCHAR, INTEGER)); nested element shapes have no
        # single-pass rewrite → LOUD.
        arg_spans, close_j = _call_arg_spans(toks, i + 2)
        elems: list[str] = []
        for s_, e_ in arg_spans:
            if s_ != e_ or toks[s_][0] != "ident":
                raise TranspileError(
                    f"{read} {toks[i + 1][1]}(...) with a nested "
                    "element type has no one-pass Spark rewrite; "
                    "write the Spark ARRAY<...>/MAP<...> form"
                )
            elems.append(
                _lookup_type(read, toks[s_][1].lower())
                or toks[s_][1].upper()
            )
        if tname == "array" and len(elems) == 1:
            return (
                [(toks[i + 1][2], toks[close_j][3], f"ARRAY<{elems[0]}>")],
                close_j + 1 - i,
            )
        if tname == "map" and len(elems) == 2:
            return (
                [(toks[i + 1][2], toks[close_j][3],
                  f"MAP<{elems[0]}, {elems[1]}>")],
                close_j + 1 - i,
            )
        raise TranspileError(
            f"{read} {toks[i + 1][1]} type takes "
            f"{'1 element' if tname == 'array' else '2 elements'}"
        )
    if tname in ("timestamp", "time") and read in (
        "trino", "postgres", "oracle", "ansi", "duckdb"
    ):
        # Multiword WITH[OUT] TIME ZONE forms, optionally after a
        # precision list: TIMESTAMP(3) WITH TIME ZONE → TIMESTAMP;
        # TIMESTAMP WITHOUT TIME ZONE → TIMESTAMP_NTZ. The single-word
        # names fall through to the per-dialect tables below.
        j = i + 2
        if is_op(j, "("):
            depth = 0
            while j < len(toks):
                if toks[j][0] == "op" and toks[j][1] == "(":
                    depth += 1
                elif toks[j][0] == "op" and toks[j][1] == ")":
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                j += 1
        if (
            j + 2 < len(toks)
            and all(toks[k][0] == "ident" for k in (j, j + 1, j + 2))
            and toks[j][1].upper() in ("WITH", "WITHOUT")
            and toks[j + 1][1].upper() == "TIME"
            and toks[j + 2][1].upper() == "ZONE"
        ):
            if tname == "time":
                raise TranspileError(
                    "TIME types have no Spark analog; store as STRING or "
                    "seconds-since-midnight"
                )
            # TIMESTAMP_LTZ, not bare TIMESTAMP: for trino the bare name
            # means zone-LESS, so a later fixpoint pass would re-read an
            # emitted TIMESTAMP and map it to TIMESTAMP_NTZ. The _LTZ
            # spelling is the same Spark type and is fixpoint-stable.
            mapped_tz = (
                "TIMESTAMP_LTZ" if toks[j][1].upper() == "WITH"
                else "TIMESTAMP_NTZ"
            )
            return [(toks[i + 1][2], toks[j + 2][3], mapped_tz)], j + 3 - i
        if is_op(i + 2, "(") and read in ("postgres", "duckdb"):
            # precision-parameterized TIMESTAMP(p)/TIME(p) WITHOUT a
            # zone suffix: Spark timestamps are fixed microsecond
            # precision and pg ROUNDS to p fractional digits (half-up)
            # — no faithful cast; loud beats Spark's raw
            # UNSUPPORTED_DATATYPE. (trino/oracle reads keep their
            # pre-existing TIMESTAMP_NTZ mapping below.)
            raise TranspileError(
                f"{tname}(p) precision casts have no Spark form "
                "(Spark timestamps are fixed micros; pg rounds to p "
                "digits) — use date_trunc for truncation semantics"
            )
    if (
        read == "mysql"
        and tname in ("signed", "unsigned")
        and i + 2 < len(toks)
        and toks[i + 2][0] == "ident"
        and toks[i + 2][1].lower() == "integer"
    ):
        # MySQL's two-word CAST targets: SIGNED [INTEGER] / UNSIGNED
        # [INTEGER] — consume the optional INTEGER into the rewrite.
        mapped2 = _lookup_type(read, tname) or toks[i + 1][1].upper()
        return [(toks[i + 1][2], toks[i + 2][3], mapped2)], 3
    if is_op(i + 2, "[") and is_op(i + 3, "]"):
        elem = _lookup_type(read, tname) or toks[i + 1][1].upper()
        return [(toks[i + 1][2], toks[i + 3][3], f"ARRAY<{elem}>")], 4
    if is_op(i + 2, "("):
        # find the matching close paren of the type-arg list
        depth = 0
        close_j = None
        for j in range(i + 2, len(toks)):
            if toks[j][0] == "op" and toks[j][1] == "(":
                depth += 1
            elif toks[j][0] == "op" and toks[j][1] == ")":
                depth -= 1
                if depth == 0:
                    close_j = j
                    break
        dtype = _PARAM_DROP_TYPES.get(read, {}).get(tname)
        if dtype is not None and close_j is not None:
            # ClickHouse DateTime('Asia/Tokyo') / DateTime64(3, 'tz'): a
            # STRING argument is a parse/display timezone that changes
            # which INSTANT a string operand parses to — dropping it
            # silently would shift values (the toDateTime(x, 'tz')
            # function form raises for the same reason).
            if read == "clickhouse" and any(
                toks[k][0] == "string" for k in range(i + 2, close_j)
            ):
                raise TranspileError(
                    f"clickhouse {toks[i + 1][1]}(...) with a timezone "
                    "argument has no faithful Spark CAST (the zone "
                    "changes the parsed instant); convert explicitly "
                    "with to_utc_timestamp/from_utc_timestamp"
                )
            return [(toks[i + 1][2], toks[close_j][3], dtype)], close_j + 1 - i
        # T-SQL (MAX) length specifier — no Spark form; drop to the
        # unbounded base type (VARCHAR(MAX)→STRING, VARBINARY(MAX)→BINARY)
        if (
            read == "tsql"
            and close_j == i + 4
            and toks[i + 3][0] == "ident"
            and toks[i + 3][1].lower() == "max"
        ):
            base_u = "BINARY" if "binary" in tname else "STRING"
            return [(toks[i + 1][2], toks[close_j][3], base_u)], close_j + 1 - i
        ptype = _PARAM_TYPES.get(read, {}).get(tname)
        if ptype is not None:
            # skip zero-change replacements: an identity edit
            # (DECIMAL→DECIMAL on every later pass) never alters the
            # text but registers as "pending" in overlap checks, which
            # permanently deferred _maybe_round_castee's wrap for
            # x::numeric(10,2)::int — a silent truncate-vs-round
            if ptype == toks[i + 1][1]:
                return [], 2
            return [(toks[i + 1][2], toks[i + 1][3], ptype)], 2
        # a type that is LOUD in bare form (mapped None) is just as
        # unrepresentable with parameters: ROW(x int), TIME(3), BIT(3)
        if _type_map(read).get(tname, _LOUD_TYPE) is None:
            raise TranspileError(
                f"type {tname!r} has no faithful Spark representation"
            )
        return [], 2
    mapped = _lookup_type(read, tname)
    if mapped is not None and mapped != toks[i + 1][1]:
        return [(toks[i + 1][2], toks[i + 1][3], mapped)], 2
    return [], 2



#: integer cast targets whose duckdb/postgres semantics ROUND the input
#: (half away from zero for NUMERIC/DECIMAL sources) where Spark's CAST
#: truncates toward zero — 3.99::int is 4 there, 3 in Spark.
_ROUNDING_INT_TYPES = frozenset({
    # hugeint/int128/ubigint are NOT here: they map to Spark DECIMAL
    # targets, and Spark's cast-to-decimal already rounds half-up
    # (verified: CAST(3.99 AS DECIMAL(38,0)) = 4) — only casts to
    # Spark INTEGRAL types truncate.
    "int", "integer", "int1", "int2", "int4", "int8",
    "bigint", "smallint", "tinyint", "signed",
    "uinteger", "usmallint", "utinyint",
})


#: type names that are statically FLOAT-typed in pg/duckdb — a castee
#: ending in one of these casts rounds half-EVEN on float→int (pg
#: 2.5::float8::int = 2, verified live on PostgreSQL 15 and DuckDB),
#: matching Spark's bround(); numeric/unknown castees round half-away.
_FLOAT_CAST_TYPES = frozenset({
    "float8", "float4", "real", "double", "float",
})

#: zero-arg builtins returning double precision in both pg and duckdb
_FLOAT_BUILTINS = frozenset({"random", "pi"})


def _float_typed_castee(toks, lf: int, end_idx: int, depth: int = 0) -> bool:
    """True when the castee spanning toks[lf..end_idx] is STATICALLY
    float-typed: it ends in a ``::float8``-family postfix (an arithmetic
    tail with one double operand promotes the whole expression to
    double in pg/duckdb), is a complete ``CAST(... AS DOUBLE)`` /
    ``TRY_CAST`` call, a float-returning zero-arg builtin, or a
    parenthesization of one of those."""
    if depth > 8 or lf > end_idx:
        return False
    last_k, last_t = toks[end_idx][0], toks[end_idx][1]
    if last_k in _NAME_KINDS:
        if (
            end_idx >= 1
            and toks[end_idx - 1][0] == "op"
            and toks[end_idx - 1][1] == "::"
            and last_t.lower() in _FLOAT_CAST_TYPES
        ):
            return True
        # two-word `::double precision` (pass-1 shape, pre-rename)
        if (
            end_idx >= 2
            and toks[end_idx - 1][0] in _NAME_KINDS
            and toks[end_idx - 2][0] == "op"
            and toks[end_idx - 2][1] == "::"
            and (toks[end_idx - 1][1].lower(), last_t.lower())
            == ("double", "precision")
        ):
            return True
        return False
    if last_k == "op" and last_t == ")" and toks[lf][0] == "op" \
            and toks[lf][1] == "(":
        return _float_typed_castee(toks, lf + 1, end_idx - 1, depth + 1)
    if last_k == "op" and last_t == ")" and toks[lf][0] in _NAME_KINDS:
        fname = toks[lf][1].lower()
        if fname in _FLOAT_BUILTINS and lf + 1 < end_idx + 1 \
                and toks[lf + 1][0] == "op" and toks[lf + 1][1] == "(":
            return True
        if (
            fname in ("cast", "try_cast")
            and end_idx >= 2
            and toks[end_idx - 1][0] in _NAME_KINDS
            and toks[end_idx - 1][1].lower() in _FLOAT_CAST_TYPES
            and toks[end_idx - 2][0] in _NAME_KINDS
            and toks[end_idx - 2][1].upper() == "AS"
        ):
            return True
    return False


def _maybe_varchar_truncate(
    toks, i: int, read: str, edits: list, cast_form: bool
):
    """pg EXPLICIT varchar(n) casts TRUNCATE to n chars (verified live:
    'abc'::varchar(2) = 'ab', 123.45::varchar(4) = '123.'); Spark's
    CAST treats VARCHAR(n) as plain STRING — a silent divergence.
    Rewrite ``x::varchar(n)`` → ``substring(x::STRING FROM 1 FOR n)``
    and CAST-form alike (the KEYWORD substring form: Spark supports it
    natively and the pg substr/substring handlers skip it — start=1 is
    positive, so pg and Spark semantics coincide exactly).
    DuckDB ignores length modifiers entirely, so this is pg-only.
    Returns (edits, consumed) when it handled the cast, else None
    (caller falls through to the regular type machinery)."""
    if read != "postgres":
        return None
    if not (i + 1 < len(toks) and toks[i + 1][0] in _NAME_KINDS
            and toks[i + 1][1].lower() == "varchar"):
        return None
    if not (i + 2 < len(toks) and toks[i + 2][0] == "op"
            and toks[i + 2][1] == "("):
        return None
    spans, close_j = _call_arg_spans(toks, i + 2)
    if (
        close_j is None
        or len(spans) != 1
        or spans[0][0] != spans[0][1]
        or toks[spans[0][0]][0] != "number"
        or not toks[spans[0][0]][1].isdigit()
    ):
        raise TranspileError(
            "varchar length modifier must be a single integer literal"
        )
    n_txt = toks[spans[0][0]][1]
    if cast_form:
        # walk back from the AS to the CAST's open paren, then the name
        depth = 0
        jj = i
        while jj >= 0:
            k_, t_ = toks[jj][0], toks[jj][1]
            if k_ == "op" and t_ == ")":
                depth += 1
            elif k_ == "op" and t_ == "(":
                if depth == 0:
                    break
                depth -= 1
            jj -= 1
        if jj < 1 or not (toks[jj - 1][0] in _NAME_KINDS
                          and toks[jj - 1][1].upper() == "CAST"):
            return None  # TRY_CAST etc. — not pg-written SQL; fall through
        cast_close = close_j + 1
        if not (cast_close < len(toks) and toks[cast_close][0] == "op"
                and toks[cast_close][1] == ")"):
            return None
        ls, le = toks[jj - 1][2], toks[cast_close][3]
        if any(e[1] >= ls and e[0] <= le for e in edits):
            return [], close_j + 1 - i  # pending rewrites — next pass
        return [
            (ls, ls, "substring("),
            (toks[i + 1][2], toks[close_j][3], "STRING"),
            (le, le, f" FROM 1 FOR {n_txt})"),
        ], close_j + 1 - i
    lf = _backward_primary(toks, i - 1, include_unary=False)
    if lf is None:
        return [], close_j + 1 - i  # unresolved castee — next pass
    ls, le = toks[lf][2], toks[i - 1][3]
    if any(e[1] >= ls and e[0] <= toks[close_j][3] for e in edits):
        return [], close_j + 1 - i  # pending rewrites — next pass
    return [
        (ls, ls, "substring("),
        (toks[i + 1][2], toks[i + 1][3], "STRING"),
        (toks[i + 2][2], toks[i + 2][3], " FROM 1 FOR "),
    ], close_j + 1 - i


def _maybe_round_castee(
    toks, end_idx: int, tname: str, read: str, edits: list, cast_form: bool
) -> None:
    """duckdb/postgres numeric→int casts ROUND (half away from zero:
    3.99::int = 4, -2.5::int = -3 on both engines, verified live);
    Spark CAST truncates toward zero. Wrap the castee in round(...) —
    Spark's round is half-away-from-zero, so values match. A castee
    that is STATICALLY float-typed (``x::float8::int``,
    ``CAST(... AS DOUBLE)::int``, ``random()::int``) instead rounds
    half-EVEN in both source engines (rint/banker's: 2.5::float8::int
    = 2, verified live) — those wrap in bround(), Spark's half-even
    form, making the statically visible float chain FAITHFUL. Documented
    residual divergences: float-typed COLUMNS (statically invisible —
    still round half-away here), and fractional STRINGS are
    accepted+rounded like duckdb where postgres raises (the pg
    string-LITERAL case is left untouched — both engines raise there,
    faithful). ``cast_form`` wraps the full CAST(expr AS t) argument
    span; the ``::`` form wraps the tightly bound primary ending at
    end_idx."""
    if read not in ("duckdb", "postgres"):
        return
    if tname.lower() not in _ROUNDING_INT_TYPES:
        return
    # `::int[]` / CAST(x AS int[]) is an ARRAY cast — the operand is an
    # array, never a roundable scalar
    if (
        end_idx + 3 < len(toks)
        and toks[end_idx + 3][0] == "op"
        and toks[end_idx + 3][1] == "["
    ):
        return
    if cast_form:
        # walk back from the AS to the CAST's open paren (depth -1)
        depth = 0
        jj = end_idx
        while jj >= 0:
            k_, t_ = toks[jj][0], toks[jj][1]
            if k_ == "op" and t_ == ")":
                depth += 1
            elif k_ == "op" and t_ == "(":
                if depth == 0:
                    break
                depth -= 1
            jj -= 1
        # CAST only — TRY_CAST is the tolerant form: duckdb
        # TRY_CAST('abc' AS INT) is NULL, but round('abc') raises under
        # ANSI even inside TRY_CAST. Its fractional-input rounding stays
        # a pinned divergence (tests/test_dialect_edges.py).
        if jj < 1 or not (
            toks[jj - 1][0] in _NAME_KINDS
            and toks[jj - 1][1].upper() == "CAST"
        ):
            return
        lf = jj + 1
    else:
        # _backward_primary steps over inner `::type` postfixes itself
        # (x::numeric::int anchors at x)
        lf = _backward_primary(toks, end_idx, include_unary=False)
        if lf is None:
            return
        # never wrap a window/filter clause mistaken for the operand
        if toks[lf][0] in _NAME_KINDS and toks[lf][1].upper() in (
            "OVER", "FILTER", "WITHIN"
        ):
            return
        if (
            lf > 0
            and toks[lf - 1][0] in _NAME_KINDS
            and toks[lf - 1][1].upper() in ("OVER", "FILTER", "WITHIN")
        ):
            return
    ls, le = toks[lf][2], toks[end_idx][3]
    if lf == end_idx and toks[lf][0] == "number" and toks[lf][1].isdigit():
        return  # integer literal — identity
    if lf == end_idx and toks[lf][0] == "string" and read == "postgres":
        return  # pg rejects fractional strings; Spark ANSI raises too
    if lf == end_idx and toks[lf][0] == "string" and read == "duckdb":
        # duckdb integer casts accept 0x-hex and 0b-binary STRING
        # literals ('0x1A'::int = 26, pinned; signed forms and float
        # casts are duck-rejected) — Spark's cast (and round()) choke
        # on them, so fold the literal statically
        import re as _re

        inner = toks[lf][1][1:-1]
        if _re.fullmatch(r"0[xX][0-9a-fA-F]+", inner):
            edits.append((ls, le, str(int(inner, 16))))
            return
        if _re.fullmatch(r"0[bB][01]+", inner):
            edits.append((ls, le, str(int(inner, 2))))
            return
    if lf == end_idx and toks[lf][0] in _NAME_KINDS and \
            toks[lf][1].upper() in ("TRUE", "FALSE"):
        return  # boolean literal: bool::int is 1/0 natively (round
        #         rejects BOOLEAN)
    # the (cond)::int / CAST(cond AS INT) idiom: a castee whose TOP
    # level contains a comparison/logical token is a BOOLEAN —
    # pg/duckdb bool→int is 1/0, which Spark's CAST matches natively,
    # and round() rejects BOOLEAN input. (Bare boolean COLUMNS are
    # statically invisible and fail loudly at analysis — the
    # AnalysisException names round(BOOLEAN) — never silently.) The
    # "top level" is depth 1 for a parenthesized castee, depth 0 for a
    # bare CAST-form expression; CASE..END bodies count as a nesting
    # level too (a comparison inside WHEN does not make the CASE's
    # RESULT boolean), and a castee containing a subquery SELECT is
    # never boolean-classified (its WHERE comparisons say nothing
    # about the selected column's type).
    # the wrapping-paren RUN: leading '(' tokens matched by a trailing
    # ')' run of the same length are pure grouping — ops directly
    # under them are still top-level (round 11: ((a > b))::int and
    # the ((IF(...) = TRUE))-shaped jsonb-? emission classified as
    # NUMERIC under the old single-paren rule and got a round() wrap
    # that fails analysis on BOOLEAN)
    lead = 0
    while (
        lf + lead <= end_idx
        and toks[lf + lead][0] == "op"
        and toks[lf + lead][1] == "("
    ):
        lead += 1
    while lead > 0 and not all(
        toks[end_idx - k][0] == "op" and toks[end_idx - k][1] == ")"
        for k in range(lead)
    ):
        lead -= 1
    bool_base = lead
    depth_c = 0
    is_bool_shape = False
    for j in range(lf, end_idx + 1):
        k_, t_ = toks[j][0], toks[j][1]
        if k_ == "op" and t_ == "(":
            depth_c += 1
        elif k_ == "op" and t_ == ")":
            depth_c -= 1
        elif k_ in _NAME_KINDS and t_.upper() == "CASE":
            depth_c += 1
        elif k_ in _NAME_KINDS and t_.upper() == "END":
            depth_c -= 1
        elif (
            k_ in _NAME_KINDS
            and t_.upper() == "SELECT"
            and depth_c <= bool_base
        ):
            # the castee IS a scalar subquery — its selected column's
            # type is unknowable, never boolean-classify. A DEEPER
            # subquery ((x > (SELECT avg(y) ...))::int) is just an
            # operand of the top-level comparison and must not veto
            # the boolean classification.
            is_bool_shape = False
            break
        elif depth_c <= bool_base and (
            (k_ == "op" and t_ in ("=", "<", ">", "<=", ">=", "<>",
                                    "!=", "<=>", "~", "!"))
            or (k_ in _NAME_KINDS and t_.upper() in (
                "IS", "LIKE", "ILIKE", "RLIKE", "SIMILAR", "BETWEEN",
                "IN", "AND", "OR", "NOT", "EXISTS", "ANY", "ALL",
                "TRUE", "FALSE"))
        ):
            is_bool_shape = True
    if is_bool_shape:
        return
    if (
        toks[lf][0] in _NAME_KINDS
        and toks[lf][1].lower() in ("round", "bround")
        and lf + 1 <= end_idx
        and toks[lf + 1][0] == "op"
        and toks[lf + 1][1] == "("
    ):
        r_spans, r_close = _call_arg_spans(toks, lf + 1)
        # only the SINGLE-arg form spanning the whole castee is this
        # handler's own emission; a user's round(x, 2)::int still
        # truncates-vs-rounds and needs the wrap (round(round(x, 2)) —
        # the outer 1-arg form then satisfies this check next pass)
        if r_close == end_idx and len(r_spans) == 1:
            return  # already round-wrapped (fixpoint)
    if any(e[1] >= ls and e[0] <= le for e in edits):
        return  # pending rewrites inside — resolve next pass
    fn = "bround(" if _float_typed_castee(toks, lf, end_idx) else "round("
    edits.append((ls, ls, fn))
    edits.append((le, le, ")"))


