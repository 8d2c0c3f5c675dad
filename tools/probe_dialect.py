"""Adversarial dialect probe: evaluate candidate expressions on a live
source engine AND on transpile+Spark, then classify each as

  MATCH      — values agree (within float tolerance)
  LOUD       — transpile raised TranspileError (always acceptable)
  ENGINE_ERR — the source engine itself rejects the expression
  SPARK_ERR  — transpile emitted SQL Spark rejects (confusing; should
               usually become a rewrite or a loud TranspileError)
  WRONG      — SILENT value divergence (the class to fix first)

This is the round-8 methodology that surfaced the interval-field,
map(keys, values), try_cast-rounding and generate_series empty-range
silent-wrongs before the fuzz corpus or the judge saw them: probe with
shapes OUTSIDE the corpus, fix WRONG, map SPARK_ERR, then pin every
fix as a fuzz template + unit test (+ a registry case for flagships).

Usage:
    python tools/probe_dialect.py --read postgres probes.txt
    python tools/probe_dialect.py --read duckdb  probes.txt
    echo "chr(955)" | python tools/probe_dialect.py --read duckdb -

probes.txt: one SQL expression per line (evaluated as SELECT <expr>);
blank lines and #-comments skipped. postgres needs the live sandbox
(sh tools/pg_sandbox.sh); duckdb uses the in-process module.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlmesh_spark.core.transpile import transpile, TranspileError  # noqa: E402

_ENGINE_ERR = object()

import datetime as _dt  # noqa: E402
import re as _re  # noqa: E402

#: ISO date/timestamp text as produced by pg's to_json (T separator,
#: optional fraction, optional offset) — the comparable subset
_ISO_RE = _re.compile(
    r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}:\d{2}(\.\d+)?"
    r"(Z|[+-]\d{2}(:\d{2})?)?)?$"
)

#: pg 'postgres'-style interval text: [N year(s)] [N mon(s)]
#: [N day(s)] [±HH:MM[:SS[.f]]] — at least one component (round 11;
#: the day-time subset canonicalizes against Spark timedelta cells)
_PG_IV_TEXT = _re.compile(
    r"^(?:(?P<y>-?\d+) years?)?\s*(?:(?P<mo>-?\d+) mons?)?\s*"
    r"(?:(?P<d>-?\d+) days?)?\s*"
    r"(?:(?P<csign>[+-]?)(?P<h>\d+):(?P<mi>\d{2})"
    r"(?::(?P<s>\d{2}(?:\.\d+)?))?)?$"
)


def _canon_dt(v: "_dt.datetime") -> str:
    """Canonical timestamp text: UTC conversion, tz dropped, fractional
    seconds without trailing zeros."""
    if v.tzinfo is not None:
        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    s = v.isoformat(sep="T")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s


def _norm(v):
    """Round-9 fix (prior round's methodology hole): date / datetime /
    bytes now normalize, so the to_char / date-arithmetic surface is
    probeable — pg values arrive as JSON text while Spark returns Python
    objects, which auto-flagged every date-valued expression WRONG
    (e.g. DATE '2026-01-31' + 1 with equal values)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            # pg's JSON spelling — inf can't be a JSON number, so the
            # engine side arrives as the STRING 'Infinity'
            return "Infinity" if v > 0 else "-Infinity"
        return round(v, 6)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:  # pragma: no cover
        pass
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return round(float(v), 6) if abs(v) < 2**52 else v
    if isinstance(v, _dt.datetime):
        return _canon_dt(v)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        # pg renders bytea as the \x-hex text form
        return "\\x" + v.hex()
    if isinstance(v, _dt.timedelta):
        # Spark day-time INTERVAL cells collect as timedelta (round-11
        # fix for the round-10 methodology hole: every interval-valued
        # probe auto-flagged WRONG against pg's interval TEXT even when
        # values matched, e.g. interval '1 day' * 2.5)
        return ("iv", round(v.total_seconds(), 6))
    if isinstance(v, str):
        m_iv = _PG_IV_TEXT.match(v)
        if m_iv and any(m_iv.groups()):
            # pg day-time interval text ('2 days 12:00:00',
            # '-1 days +02:03:00', '00:01:45') → the same canonical
            # form as a Spark timedelta. Year/month components stay
            # TEXT: Spark can't even collect a year-month interval
            # (fromInternal NOT_IMPLEMENTED — documented client gap),
            # so there is nothing to compare against. Plain TIME
            # strings normalize symmetrically on both sides.
            yr, mo = m_iv.group("y"), m_iv.group("mo")
            if not yr and not mo:
                secs = 86400.0 * int(m_iv.group("d") or 0)
                sign = -1.0 if m_iv.group("csign") == "-" else 1.0
                if m_iv.group("h") is not None:
                    secs += sign * (
                        3600.0 * int(m_iv.group("h"))
                        + 60.0 * int(m_iv.group("mi"))
                        + float(m_iv.group("s") or 0)
                    )
                return ("iv", round(secs, 6))
        if _ISO_RE.match(v):
            if len(v) == 10:
                return v  # bare date, already canonical
            try:
                return _canon_dt(_dt.datetime.fromisoformat(
                    v.replace("Z", "+00:00")))
            except ValueError:  # pragma: no cover
                return v
        if v[:1] in ("{", "["):
            # Round-11 fix (the wave-45 methodology hole): pg json/jsonb
            # cells arrive PARSED (the psql transport is to_json, so a
            # json-typed cell nests as a real container) while Spark's
            # emissions return JSON TEXT — every json_build_*/json_agg/
            # jsonb ->> object probe auto-flagged WRONG on equal values
            # (also jsonb's canonical spacing '{"c": [1,2,3]}' vs
            # Spark's compact '{"c":[1,2,3]}'). A container-shaped
            # string that json-parses compares structurally; scalars
            # ('1', 'true') and non-JSON text ('{1,2}' pg array form)
            # stay text. A genuine whitespace-only divergence in a
            # TEXT-typed JSON-shaped cell would false-normalize —
            # acceptable for a probe tool, same posture as the duck
            # MAP-cell rebuild above.
            try:
                parsed = json.loads(v)
            except Exception:
                return v
            if isinstance(parsed, (dict, list)):
                return _norm(parsed)
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, tuple) and hasattr(v, "asDict"):
        # a pyspark Row NESTED inside a container (top-level Rows are
        # converted in main): compare as a dict, like pg's record JSON
        # and duck's struct rendering
        v = v.asDict()
    if isinstance(v, tuple):
        # duck renders UNNAMED structs (list_zip tuples, row(...)) as
        # Python tuples; Spark's arrays_zip names the fields '0'..'n'.
        # Both compare as positional tuples (see the dict branch).
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        # Round-10 fix (round-9 methodology hole): the duckdb client
        # renders MAP values as {'key': [k...], 'value': [v...]} —
        # every map-valued probe auto-flagged WRONG against Spark's
        # plain dict even when semantically equal. Rebuild the dict
        # (order-insensitive compare falls out of the sort below). A
        # genuine 2-field struct named key/value with parallel list
        # fields would false-normalize — acceptable for a probe tool.
        if (
            set(v) == {"key", "value"}
            and isinstance(v["key"], list)
            and isinstance(v["value"], list)
            and len(v["key"]) == len(v["value"])
        ):
            v = dict(zip(v["key"], v["value"]))
        if v and all(
            isinstance(k, str) and k.isdigit() for k in v
        ) and sorted(int(k) for k in v) == list(range(len(v))):
            # a POSITIONAL struct (Spark arrays_zip fields '0'..'n');
            # compare as a tuple, like duck's unnamed-struct rendering
            return tuple(
                _norm(v[str(ix)]) for ix in range(len(v))
            )
        if v and all(
            isinstance(k, str) and _re.fullmatch(r"col\d+", k) for k in v
        ) and sorted(int(k[3:]) for k in v) == list(range(1, len(v) + 1)):
            # Spark's bare struct() names fields col1..colN — same
            # positional class (duck row(...) renders a plain tuple)
            return tuple(
                _norm(v[f"col{ix}"]) for ix in range(1, len(v) + 1)
            )
        return tuple(sorted(
            (str(k), _norm(x)) for k, x in v.items()
        ))
    return v


def _pg_values(exprs, table=False):
    pgv = os.environ.get("SPARK_GRAFT_PGHOST", "/tmp/pgv")
    script = ["\\pset tuples_only on", "\\pset format unaligned"]
    for k, e in enumerate(exprs):
        script.append(f"\\echo ###{k}")
        if table:
            # FROM-position probe: rows in emission order as an array
            # of JSON objects; compared POSITIONALLY downstream (SRF
            # output column names — 'value', 'json_array_elements' —
            # rarely match Spark's explode/col names). row(_pt.*)
            # renames the fields f1..fn — duplicate SRF column names
            # (unnest(a, b) emits two 'unnest' columns) would collapse
            # in a JSON object otherwise.
            script.append(
                "SELECT coalesce(to_json(array_agg(row(_pt.*)))"
                f"::text, 'null') FROM (SELECT * FROM {e} AS _q) AS _pt;"
            )
        else:
            script.append(f"SELECT coalesce(to_json({e})::text, 'null');")
    script.append("\\echo ###END")
    out = subprocess.run(
        ["psql", "-h", pgv, "-U", "postgres", "-v", "ON_ERROR_STOP=0"],
        input="\n".join(script), capture_output=True, text=True,
    ).stdout
    sections, cur, buf = {}, None, []
    for line in out.splitlines():
        if line.startswith("###"):
            if cur is not None:
                sections[cur] = "\n".join(buf).strip()
            buf = []
            cur = None if line == "###END" else int(line[3:])
        else:
            buf.append(line)
    vals = []
    for k in range(len(exprs)):
        txt = sections.get(k, "")
        if not txt:
            vals.append(_ENGINE_ERR)
            continue
        try:
            vals.append(json.loads(txt))
        except ValueError:
            vals.append(txt)
    return vals


def _duck_values(exprs, table=False):
    import duckdb

    vals = []
    for e in exprs:
        try:
            if table:
                rows = duckdb.sql(f"SELECT * FROM {e}").fetchall()
                vals.append([list(r) for r in rows])
            else:
                vals.append(duckdb.sql(f"SELECT {e} AS v").fetchone()[0])
        except Exception:  # noqa: BLE001
            vals.append(_ENGINE_ERR)
    return vals


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--read", required=True,
                    choices=("postgres", "duckdb"))
    ap.add_argument("--table", action="store_true",
                    help="evaluate as SELECT * FROM <expr> (set-returning"
                         " functions); rows compared positionally")
    ap.add_argument("probes", help="file of expressions, or - for stdin")
    args = ap.parse_args()
    src = sys.stdin if args.probes == "-" else open(args.probes)
    exprs = [
        ln.strip() for ln in src
        if ln.strip() and not ln.lstrip().startswith("#")
    ]
    engine_vals = (
        _pg_values(exprs, table=args.table) if args.read == "postgres"
        else _duck_values(exprs, table=args.table)
    )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("probe_dialect").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    wrong, sparkerr, loud, engerr, ok = [], [], [], [], []
    for expr, ev in zip(exprs, engine_vals):
        if ev is _ENGINE_ERR:
            engerr.append(expr)
            continue
        try:
            if args.table:
                sq = transpile(f"SELECT * FROM {expr}", args.read)
            else:
                sq = transpile(f"SELECT {expr} AS v", args.read)
        except TranspileError as te:
            loud.append((expr, str(te)[:80]))
            continue
        try:
            if args.table:
                sv = [list(r) for r in spark.sql(sq).collect()]
            else:
                sv = spark.sql(sq).collect()[0][0]
        except Exception as exc:  # noqa: BLE001
            sparkerr.append((expr, sq, str(exc)[:140]))
            continue
        try:
            from pyspark.sql import Row

            if isinstance(sv, Row):
                sv = sv.asDict()
        except Exception:  # pragma: no cover
            pass
        if args.table and args.read == "postgres":
            # pg side arrives as [ {col: val, ...}, ... ] (or None for
            # zero rows) — compare positionally by record field order
            ev = [list(r.values()) for r in (ev or [])]
        if _norm(sv) != _norm(ev):
            wrong.append((expr, ev, sv, sq))
        else:
            ok.append(expr)
    print(f"MATCH={len(ok)} LOUD={len(loud)} ENGINE_ERR={len(engerr)} "
          f"SPARK_ERR={len(sparkerr)} WRONG={len(wrong)}")
    for title, rows in (("WRONG (fix these first)", wrong),):
        print(f"\n=== {title} ===")
        for e, p, s, q in rows:
            print(f"  {e!r}\n    engine={p!r} spark={s!r}\n    sql={q[:140]!r}")
    print("\n=== SPARK_ERR (map or make loud) ===")
    for e, q, x in sparkerr:
        print(f"  {e!r}\n    -> {q[:120]!r}\n    err: {x}")
    print("\n=== LOUD ===")
    for e, t in loud:
        print(f"  {e!r}: {t}")
    print("\n=== ENGINE_ERR ===")
    for e in engerr:
        print(f"  {e!r}")
    return 1 if wrong else 0


if __name__ == "__main__":
    raise SystemExit(main())
