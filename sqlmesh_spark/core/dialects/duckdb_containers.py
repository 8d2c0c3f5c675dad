"""DuckDB container-tier call handlers: map/struct/list/JSON
constructors and accessors.

Split out of ``duckdb_fns.py`` in round 11 (the module had grown to
1,834 lines, past the ~1,100-1,200-line transpile-module convention the
round-6 split established). Handler bodies are the pre-split code
VERBATIM — every docstring, live-pinned semantics note, and VERDICT
file:line reference still applies. Dispatched from
``standard.call_handlers`` behind the same ``read == "duckdb"`` gate as
``duckdb_fns`` (the round-8 split regression class — a dispatch gate
narrower than a moved handler's read tuple silently kills it — is
pinned by ``tests/test_transpile.py::test_duckdb_split_dispatch_gates_round11``).

Tier contents: map(keys, values) → map_from_arrays, struct_pack /
struct_extract / struct_insert / row, list_has_any/all, list_intersect,
the duck map-access seam (element_at/map_extract → LIST shape),
map_concat last-wins fold, json_group_* / json_object / json_array,
ARRAY(subquery), list_zip, unnest, len, list_resize/select/where,
list vector folds (dot product/cosine/distance), list_reverse_sort,
list_unique, list_any_value, array_pop_*, list_slice.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _call_arg_spans,
    _parse_inagg_order,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _spark_string_literal,
)
from sqlmesh_spark.core.dialects.duckdb_fns import _brace_unbalanced


def call_handlers(ctx) -> "int | None":
    """DuckDB container-tier handlers (pre-split bodies verbatim);
    every branch is duckdb-read-only — dispatched behind a read gate in
    standard.call_handlers."""
    toks, edits = ctx.toks, ctx.edits
    sql, read = ctx.sql, ctx.read
    i, name = ctx.i, ctx.name
    start = ctx.start
    _arg_text = ctx.arg_text
    n = len(toks)
    _unused = (read, n)

    if name == "map":
        # duckdb map(keys_list, values_list); Spark map() is variadic
        # (k1, v1, ...) — the 2-list call would build a ONE-entry map
        # of list→list, silently wrong for every lookup. Two bare
        # STRING-literal args are never valid duckdb map() input —
        # that shape is our own to_json OPTIONS map (Spark requires
        # the literal map() function there) — skip it.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2 and all(
            sp[0] == sp[1] and toks[sp[0]][0] == "string" for sp in spans
        ):
            return None
        if len(spans) == 2:
            edits.append(
                (start, toks[close][3],
                 f"map_from_arrays(({_arg_text(spans[0])}), "
                 f"({_arg_text(spans[1])}))")
            )
            return close + 1
    if name == "struct_pack":
        # struct_pack(a := 1, b := 'x') → named_struct('a', 1, ...)
        spans, close = _call_arg_spans(toks, i + 1)
        parts = []
        for s0, s1 in spans:
            if not (
                s1 >= s0 + 3
                and toks[s0][0] in _NAME_KINDS
                and toks[s0 + 1][0] == "op" and toks[s0 + 1][1] == ":"
                and toks[s0 + 2][0] == "op" and toks[s0 + 2][1] == "="
            ):
                raise TranspileError(
                    "struct_pack takes name := value arguments"
                )
            key = toks[s0][1]
            val = sql[toks[s0 + 3][2]: toks[s1][3]]
            parts.append(f"{_spark_string_literal(key, 'duckdb')}, ({val})")
        edits.append(
            (start, toks[close][3],
             f"named_struct({', '.join(parts)})")
        )
        return close + 1
    if name == "struct_extract":
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 2
            and spans[1][0] == spans[1][1]
            and toks[spans[1][0]][0] == "string"
        ):
            key = _literal_content(toks[spans[1][0]][1], "duckdb")
            if not re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", key):
                raise TranspileError(
                    "struct_extract keys that aren't plain identifiers "
                    "have no Spark dot-access spelling"
                )
            edits.append(
                (start, toks[close][3],
                 f"(({_arg_text(spans[0])}).{key})")
            )
            return close + 1
    if name in ("list_has_any", "list_has_all"):
        # pinned against the duckdb module: NULL elements NEVER match
        # (list_has_any([1,NULL],[NULL]) = false) and has_all IGNORES
        # NULL needles (list_has_all([1,2,3],[2,NULL]) = true); a NULL
        # list operand gives NULL
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, b_ = _arg_text(spans[0]), _arg_text(spans[1])
            if name == "list_has_any":
                body = f"coalesce(arrays_overlap(({a_}), ({b_})), false)"
            else:
                body = (
                    f"forall(filter(({b_}), _e -> _e IS NOT NULL), "
                    f"_e -> coalesce(array_contains(({a_}), _e), false))"
                )
            edits.append(
                (start, toks[close][3],
                 f"IF(({a_}) IS NULL OR ({b_}) IS NULL, NULL, {body})")
            )
            return close + 1
    if name in ("list_intersect", "array_intersect"):
        # duckdb orders the intersection by SECOND-arg first-occurrence
        # and dedupes (pinned: list_intersect([3,1],[1,3]) = [1,3],
        # list_intersect([1,1,2],[2,2,1,1]) = [2,1]); Spark's
        # array_intersect keeps FIRST-arg order — a rename was a silent
        # element-order divergence. NULL semantics pinned: NULL elements
        # never match ([1,NULL]∩[NULL,2] = []), a NULL FIRST arg gives
        # NULL but a NULL SECOND arg gives [] (asymmetric). The inner
        # filter drops non-matches; the _ld filter is the shared
        # array_distinct NULL-drop marker so re-reads stay inert.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 2:
            raise TranspileError(f"duckdb {name} takes 2 list arguments")
        a_, b_ = _arg_text(spans[0]), _arg_text(spans[1])
        edits.append(
            (start, toks[close][3],
             f"IF(({a_}) IS NULL, NULL, coalesce(array_distinct("
             f"filter(filter(({b_}), _e -> coalesce(array_contains("
             f"({a_}), _e), false)), _ld -> _ld IS NOT NULL)), "
             f"array()))")
        )
        return close + 1
    if name in ("json_group_array", "json_group_object", "json_object",
                "json_array"):
        # duckdb's JSON constructors render COMPACT text — exactly
        # Spark's to_json — with NULL elements kept and NULL on empty
        # input (pinned: json_group_array over ('a'),(NULL) =
        # '["a",null]'; zero rows = NULL; json_object keeps duplicate
        # keys and insertion order — named_struct reproduces that:
        # to_json(named_struct('a',1,'a',2)) = '{"a":1,"a":2}', pinned
        # live both engines). json_group_object is STRICTER than
        # json_object: duck 1.0 raises "Map keys must be unique" on a
        # duplicate key and "Map keys can not be NULL" on a NULL key
        # (pinned live), so the map_from_arrays emission raising
        # DUPLICATED_MAP_KEY / NULL_MAP_KEY at Spark runtime is
        # faithful-in-class — both engines error, neither silently
        # drops. The one documented seam: duck normalizes DECIMAL
        # trailing zeros ([1.5] for 1.50) where Spark's encoder keeps
        # the scale — same dtype class as the quantile seams.
        # Previously these passed through into UNRESOLVED_ROUTINE.
        spans, close = _call_arg_spans(toks, i + 1)
        # the options-map argument doubles as the OWN-EMISSION tag:
        # the round-11 scalar to_json/json_quote handler would
        # re-consume a bare to_json(array(..)) and double-wrap
        je = (
            "substring(to_json(array({v}), "
            "map('ignoreNullFields', 'false')) FROM 2 "
            "FOR length(to_json(array({v}), "
            "map('ignoreNullFields', 'false'))) - 2)"
        )
        if name == "json_group_array" and len(spans) == 1:
            a1 = spans[0][1]
            order_at = None
            d0 = 0
            for j in range(spans[0][0], a1 + 1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ in ("(", "["):
                    d0 += 1
                elif k_ == "op" and t_ in (")", "]"):
                    d0 -= 1
                elif d0 == 0 and k_ in _NAME_KINDS and t_.upper() == "ORDER":
                    order_at = j
                    break
            sort_wrap = None
            if order_at is not None:
                # in-aggregate ORDER BY (round 11, wave 53 machinery
                # — previously the ORDER text spliced INTO the struct
                # wrap and emitted unparseable SQL). The clause may
                # already carry the shared NULLS annotation from this
                # pass — strip it before the parse (duck's default is
                # nulls_last for both directions, which the helper
                # encodes).
                a1, key_txt, sort_wrap = _parse_inagg_order(
                    toks, sql, spans[0], order_at, read
                )
            x_ = sql[toks[spans[0][0]][2]:toks[a1][3]].strip()
            if sort_wrap is not None:
                agg = (
                    f"array_agg(struct(({key_txt}) AS _k, "
                    f"({x_}) AS _v))"
                )
                body = f"array_sort({agg}, {sort_wrap})"
            else:
                agg = f"array_agg(struct(({x_}) AS _v))"
                body = agg
            elem = je.format(v="_s._v")
            edits.append(
                (start, toks[close][3],
                 f"(CASE WHEN size({agg}) = 0 THEN NULL ELSE "
                 f"'[' || array_join(transform({body}, _s -> {elem}), "
                 f"',') || ']' END)")
            )
            return close + 1
        if name == "json_group_object" and len(spans) == 2:
            d0 = 0
            for j in range(spans[1][0], spans[1][1] + 1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ in ("(", "["):
                    d0 += 1
                elif k_ == "op" and t_ in (")", "]"):
                    d0 -= 1
                elif d0 == 0 and k_ in _NAME_KINDS and t_.upper() == "ORDER":
                    raise TranspileError(
                        "duckdb json_group_object(k, v ORDER BY ...) "
                        "has no ordered map rewrite (the struct wrap "
                        "reserves _k for the object key); aggregate "
                        "without the ORDER BY"
                    )
            k_, v_ = _arg_text(spans[0]), _arg_text(spans[1])
            agg = f"array_agg(struct(({k_}) AS _k, ({v_}) AS _v))"
            edits.append(
                (start, toks[close][3],
                 f"(CASE WHEN size({agg}) = 0 THEN NULL ELSE "
                 f"to_json(map_from_arrays("
                 f"transform({agg}, _s -> _s._k), "
                 f"transform({agg}, _s -> _s._v)), "
                 f"map('ignoreNullFields', 'false')) END)")
            )
            return close + 1
        if name == "json_object":
            if len(spans) == 0:
                edits.append((start, toks[close][3], "'{}'"))
                return close + 1
            if len(spans) % 2 == 0 and all(
                spans[k][0] == spans[k][1]
                and toks[spans[k][0]][0] == "string"
                for k in range(0, len(spans), 2)
            ):
                parts = ", ".join(
                    f"{toks[spans[k][0]][1]}, ({_arg_text(spans[k + 1])})"
                    for k in range(0, len(spans), 2)
                )
                edits.append(
                    (start, toks[close][3],
                     f"to_json(named_struct({parts}), "
                     f"map('ignoreNullFields', 'false'))")
                )
                return close + 1
            raise TranspileError(
                "duckdb json_object transpiles with literal string "
                "keys and an even argument count"
            )
        if name == "json_array":
            if len(spans) == 0:
                edits.append((start, toks[close][3], "'[]'"))
                return close + 1
            body = " || ',' || ".join(
                je.format(v=f"({_arg_text(sp)})") for sp in spans
            )
            edits.append(
                (start, toks[close][3], f"('[' || {body} || ']')")
            )
            return close + 1
    if name == "histogram":
        # duck histogram(x): value → count MAP, KEY-SORTED, NULLs
        # skipped, NULL on zero rows (all pinned live, round 11).
        # Spark's array_agg drops NULLs like duck's histogram input;
        # counts come from a filter over the collected array (the
        # distinct-key pass is O(d·n) per group — histogram is a
        # profiling aggregate over low-cardinality keys by contract).
        spans, close = _call_arg_spans(toks, i + 1)
        nxt_t = (
            toks[close + 1][1].upper()
            if close + 1 < len(toks) and toks[close + 1][0] in _NAME_KINDS
            else ""
        )
        if nxt_t in ("FILTER", "OVER", "WITHIN"):
            raise TranspileError(
                "duckdb histogram(...) FILTER/OVER has no faithful "
                "Spark rewrite with the NULL-on-empty wrap; "
                "aggregate plainly"
            )
        if len(spans) != 1:
            raise TranspileError(
                "duckdb histogram takes 1 argument (the binned "
                "2-argument form does not exist in duckdb 1.0)"
            )
        x_ = _arg_text(spans[0])
        # collect_list, NOT array_agg: the duck array_agg handler
        # would re-consume the emission with duck's KEEP-NULLs
        # semantics — collect_list is no duck name and drops NULLs
        # exactly like histogram's input contract; sort_array for
        # the same reason (the duck array_sort/list_sort handler)
        agg = f"collect_list(({x_}))"
        edits.append(
            (start, toks[close][3],
             f"(CASE WHEN size({agg}) = 0 THEN NULL ELSE "
             f"map_from_entries(transform("
             f"sort_array(array_distinct(filter({agg}, "
             f"_ld -> _ld IS NOT NULL))), "
             f"_hk -> struct(_hk, size(filter({agg}, "
             f"_he -> _he = _hk))))) END)")
        )
        return close + 1
    if name == "json_keys":
        # duck json_keys: top-level object keys as VARCHAR[]; [] (not
        # NULL) for arrays/scalars, NULL for NULL input; optional 2nd
        # path argument keys the element AT the path (all pinned live,
        # round 11 wave 47). Spark's json_object_keys is NULL
        # off-objects — the coalesce restores duck's [].
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) not in (1, 2):
            raise TranspileError("duckdb json_keys takes 1 or 2 args")
        x_ = _arg_text(spans[0])
        doc = f"({x_})"
        if len(spans) == 2:
            p_ = _arg_text(spans[1])
            if (
                spans[1][0] == spans[1][1]
                and toks[spans[1][0]][0] == "string"
            ):
                pc = _literal_content(toks[spans[1][0]][1], read)
                if not pc.startswith("$"):
                    # duck accepts BARE-key paths ('a' ≡ '$.a');
                    # Spark JsonPath is $-rooted — bracket form keys
                    # with dots/spaces safely
                    esc = pc.replace("'", "''")
                    p_ = f"'$[''{esc}'']'"
            doc = f"get_json_object(({x_}), ({p_}))"
        edits.append(
            (start, toks[close][3],
             f"IF(({x_}) IS NULL, NULL, coalesce("
             f"json_object_keys({doc}), "
             f"CAST(array() AS ARRAY<STRING>)))")
        )
        return close + 1
    if name == "json_valid":
        # duck json_valid: parseable-JSON test, NULL on NULL (pinned).
        # Spark's get_json_object('$') echoes any valid document —
        # including the 'null' literal and bare scalars — and is NULL
        # on a parse failure.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 1:
            raise TranspileError("duckdb json_valid takes 1 argument")
        x_ = _arg_text(spans[0])
        # trailing '= TRUE' is a semantic no-op that lets the ::int
        # castee boolean-shape classifier see a boolean — without it
        # json_valid(j)::int round()-wrapped the IF and failed
        # analysis (the jsonb-? emission class)
        edits.append(
            (start, toks[close][3],
             f"(IF(({x_}) IS NULL, NULL, "
             f"get_json_object(({x_}), '$') IS NOT NULL) = TRUE)")
        )
        return close + 1
    if name in ("to_json", "json_quote"):
        # duck to_json/json_quote serialize ANY value to JSON text
        # (scalars included: to_json('s') = '"s"'); Spark's to_json
        # takes only struct/array/map — the one-element-array wrap +
        # bracket strip serializes every type uniformly. NULL → NULL
        # (pinned; the bare wrap would render 'null'). The explicit
        # options-map second argument is the OWN-EMISSION tag (duck
        # to_json is unary) — the fixpoint consumer skips exactly
        # that shape. Documented seam (same class as
        # json_group_array): duck normalizes DECIMAL trailing zeros
        # ('1.5' for 1.50) where Spark's encoder keeps the scale.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            f0 = toks[spans[1][0]]
            if f0[0] in _NAME_KINDS and f0[1].lower() == "map":
                return i + 1  # own emission from a prior pass
        if len(spans) != 1:
            raise TranspileError(f"duckdb {name} takes 1 argument")
        x_ = _arg_text(spans[0])
        enc = (
            f"to_json(array(({x_})), map('ignoreNullFields', 'false'))"
        )
        edits.append(
            (start, toks[close][3],
             f"IF(({x_}) IS NULL, NULL, "
             f"substring({enc} FROM 2 FOR length({enc}) - 2))")
        )
        return close + 1
    if name == "from_json":
        # duck from_json takes duck's '{"a":"INTEGER"}' JSON-shaped
        # schema spelling — Spark's same-named from_json wants
        # 'struct<a:int>' DDL and would reject it (or silently
        # retype). A DDL-shaped literal schema passes through (the
        # user already Spark-spelled it — also what this loud
        # advises); the duck-shaped one is loud.
        spans, _close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 2
            and spans[1][0] == spans[1][1]
            and toks[spans[1][0]][0] == "string"
            and _literal_content(
                toks[spans[1][0]][1], read
            ).lstrip().startswith(("{", "["))
        ):
            raise TranspileError(
                "duckdb from_json() takes duck's JSON-shaped schema "
                "spelling; Spark's from_json wants a DDL string — "
                "re-spell the schema as 'struct<...>' "
            )
        return None  # DDL-shaped or dynamic: Spark's own from_json
    if name in ("json_merge_patch", "json_contains", "json_type",
                "json_structure", "json_serialize_sql",
                "json_deserialize_sql", "json_transform",
                "json_transform_strict"):
        # duck JSON functions with no faithful Spark rewrite, each
        # previously dying as UNRESOLVED_ROUTINE / a misleading
        # schema-format error (round 11 wave 47): json_merge_patch is
        # an RFC-7386 RECURSIVE merge; json_contains is recursive
        # containment; json_type/json_structure return duck's TYPED
        # names (UBIGINT vs BIGINT by value); json_transform takes
        # duck's '{"a":"INTEGER"}' schema spelling.
        raise TranspileError(
            f"duckdb {name}() has no faithful Spark rewrite; "
            "extract with ->>/json_extract_string and compare "
            "fields explicitly"
        )
    if name in ("element_at", "map_extract"):
        # probe-verified (round-9 verdict): duck element_at/map_extract
        # are MAP-ONLY (a list base is a binder error, pinned live) and
        # return a LIST — [v] on hit, [] on miss, [] for a NULL key AND
        # a NULL map (pinned live, duckdb 1.0; same as the bracket
        # subscript).  Spark's element_at returns the SCALAR — the
        # function-call spelling previously walked through untouched,
        # a silent shape+value change.  Because duck's binder rejects
        # non-map bases, any RUNNING duck query has a map here, so the
        # rewrite is safe for untyped column bases too (unlike the
        # bracket form, where a bare subscript is usually list access).
        # Entries-filter form (not map_contains_key/element_at): the
        # <=> match works for an UNTYPED NULL key where
        # map_contains_key fails ANALYSIS, a NULL map coalesces to []
        # like duck, and the emission contains no element_at to
        # re-dispatch on fixpoint re-reads.  A first argument that IS
        # a transform(...) call can only be a binding-trick emission
        # (transform is not a duck name — pinned live): skip it.
        spans, close = _call_arg_spans(toks, i + 1)
        if any(_brace_unbalanced(toks, sp) for sp in spans):
            return None  # map {'a':1,...} commas split spans; the
            # {}-literal token handler rewrites this pass — re-dispatch
            # on the next fixpoint read sees map('a',1,...)
        if (
            len(spans) == 2
            and toks[spans[0][0]][0] in _NAME_KINDS
            and toks[spans[0][0]][1].lower() == "transform"
        ):
            return None
        if len(spans) == 2:
            m_, k_ = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"coalesce(transform(filter(map_entries(({m_})), "
                 f"_me -> _me.key <=> ({k_})), _mv -> _mv.value), "
                 f"array())")
            )
            return close + 1
        raise TranspileError(
            f"duckdb {name}() takes (map, key) and returns a LIST; "
            "other arities have no Spark mapping"
        )
    if name == "map_concat":
        # pinned live (duckdb 1.0): last-wins on duplicate keys with
        # FIRST-appearance key order ({'a':1} || {'b':2} || {'a':9,
        # 'c':3} = keys [a,b,c], values [9,2,3]); a NULL operand is
        # treated as EMPTY unless every operand is NULL (then NULL);
        # fewer than 2 args is an error.  Spark's map_concat under the
        # default spark.sql.mapKeyDedupPolicy=EXCEPTION throws at
        # runtime on any duplicate — a confusing failure for valid
        # duck SQL — and LAST_WIN is a session-global knob this
        # transpiler must not depend on.  Left-fold of a self-contained
        # two-map merge: m1's entries with m2's value where the key
        # collides (keeps m1's position), then m2's novel entries.
        # flatten(array(a, b)) — never concat(): the duck concat
        # NULL-skip handler rewraps concat arguments on every pass.
        spans, close = _call_arg_spans(toks, i + 1)
        if any(_brace_unbalanced(toks, sp) for sp in spans):
            return None  # defer past {}-literal commas (see helper)
        if len(spans) >= 2:
            merged = f"({_arg_text(spans[0])})"
            for lvl, sp in enumerate(spans[1:]):
                b_ = f"({_arg_text(sp)})"
                s, f_, g_ = f"_s{lvl}", f"_f{lvl}", f"_g{lvl}"
                merged = (
                    f"element_at(transform(array(struct({merged} AS "
                    f"_m1, {b_} AS _m2)), {s} -> "
                    f"IF({s}._m1 IS NULL AND {s}._m2 IS NULL, NULL, "
                    f"map_from_entries(flatten(array("
                    f"transform(coalesce(map_entries({s}._m1), "
                    f"array()), {f_} -> struct({f_}.key AS key, "
                    f"IF(coalesce(map_contains_key({s}._m2, "
                    f"{f_}.key), false), try_element_at({s}._m2, "
                    f"{f_}.key), {f_}.value) AS value)), "
                    f"filter(coalesce(map_entries({s}._m2), array()), "
                    f"{g_} -> NOT coalesce(map_contains_key({s}._m1, "
                    f"{g_}.key), false))))))), 1)"
                )
            edits.append((start, toks[close][3], merged))
            return close + 1
        raise TranspileError(
            "duckdb map_concat requires 2 or more maps (duck itself "
            "rejects fewer)"
        )
    if name == "array":
        # duck LIST COMPREHENSIONS (round 10, pinned live): [expr FOR
        # v IN list] maps elements ([x*2 FOR x IN [1,NULL,3]] =
        # [2,NULL,6] — NULL elements flow through the expression), and
        # an IF tail filters FIRST ([x FOR x IN [1,2,3] IF x > 1] =
        # [2,3]; empty in → empty out). The bracket-literal rewrite
        # has already turned [..] into array(..), so the comprehension
        # arrives as array(expr FOR v IN list [IF cond]) — previously
        # shipped verbatim into a Spark parse error. transform/filter
        # reproduce it exactly; nested comprehensions resolve one
        # layer per fixpoint pass (the emission contains no depth-0
        # FOR, so re-reads are inert).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            s0, s1 = spans[0]
            depth = 0
            for_j = in_j = if_j = None
            for j in range(s0, s1 + 1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ in ("(", "["):
                    depth += 1
                elif k_ == "op" and t_ in (")", "]"):
                    depth -= 1
                elif depth == 0 and k_ in _NAME_KINDS:
                    up = t_.upper()
                    if up == "FOR" and for_j is None:
                        for_j = j
                    elif up == "IN" and for_j is not None and in_j is None:
                        in_j = j
                    elif up == "IF" and in_j is not None and if_j is None:
                        if_j = j
            if for_j is not None and in_j == for_j + 2:
                var_t = toks[for_j + 1]
                if var_t[0] not in _NAME_KINDS:
                    raise TranspileError(
                        "duckdb list comprehension needs a plain "
                        "identifier loop variable"
                    )
                var = var_t[1]
                expr = sql[toks[s0][2]: toks[for_j][2]].rstrip()
                lst_end = toks[if_j][2] if if_j is not None else toks[s1][3]
                lst = sql[toks[in_j][3]: lst_end].strip()
                if if_j is not None:
                    cond = sql[toks[if_j][3]: toks[s1][3]].strip()
                    body = (
                        f"transform(filter(({lst}), {var} -> ({cond})), "
                        f"{var} -> ({expr}))"
                    )
                else:
                    body = f"transform(({lst}), {var} -> ({expr}))"
                edits.append((start, toks[close][3], body))
                return close + 1
    if name == "list_zip":
        # N-ary zip, NULL-padded to the LONGEST input; a NULL list
        # behaves as empty-but-padded (list_zip(NULL::int[], [1]) =
        # [(NULL, 1)] — pinned live) where Spark's arrays_zip returns
        # NULL — coalesce each leg to array(). An extra boolean
        # `truncate` argument (zip to shortest) has no Spark analog.
        spans, close = _call_arg_spans(toks, i + 1)
        if any(_brace_unbalanced(toks, sp) for sp in spans):
            return None
        if spans and toks[spans[-1][0]][0] in _NAME_KINDS and \
                toks[spans[-1][0]][1].lower() in ("true", "false"):
            raise TranspileError(
                "duckdb list_zip(..., truncate) zips to the SHORTEST "
                "list; Spark's arrays_zip always pads to the longest "
                "— drop the flag or slice the result"
            )
        if len(spans) >= 2:
            args = ", ".join(
                f"coalesce(({_arg_text(sp)}), array())" for sp in spans
            )
            edits.append(
                (start, toks[close][3], f"arrays_zip({args})")
            )
            return close + 1
    if name == "unnest":
        # bare unnest(list) renames to explode (shared map); the
        # named-argument forms change the SHAPE (recursive flattens all
        # nesting and unpacks structs into columns; max_depth bounds
        # it) — the name-arg tokens previously leaked into
        # explode(a, recursive := true), a confusing parse error
        spans, close = _call_arg_spans(toks, i + 1)
        for s0, s1 in spans:
            if (
                s1 >= s0 + 2
                and toks[s0][0] in _NAME_KINDS
                and toks[s0][1].lower() in ("recursive", "max_depth")
                and toks[s0 + 1][0] == "op" and toks[s0 + 1][1] == ":"
                and toks[s0 + 2][0] == "op" and toks[s0 + 2][1] == "="
            ):
                raise TranspileError(
                    "duckdb unnest(recursive := / max_depth := ...) "
                    "has no Spark form (explode is one-level); nest "
                    "explode calls or flatten() first"
                )
        return None  # plain unnest: fall through to the explode rename
    if name == "len":
        # duckdb len() is both string-length AND list-length; Spark's
        # len is string-only (list args raise a confusing analysis
        # error). Rewrite to size() when the argument is STATICALLY a
        # list (literal or list-returning call); string args keep len.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            s0 = spans[0][0]
            k0, t0 = toks[s0][0], toks[s0][1]
            listy = (
                (k0 == "op" and t0 == "[")
                or (k0 in _NAME_KINDS and t0.upper() == "ARRAY")
                or (
                    k0 in _NAME_KINDS
                    and s0 + 1 <= spans[0][1]
                    and toks[s0 + 1][0] == "op" and toks[s0 + 1][1] == "("
                    and (
                        t0.lower().startswith("list_")
                        or t0.lower() in (
                            "array", "list_value", "string_split",
                            "str_split", "string_to_array", "split",
                            "regexp_split_to_array", "sequence",
                            "generate_series", "range", "map_keys",
                            "map_values", "flatten", "slice", "array_agg",
                        )
                    )
                )
            )
            if listy:
                edits.append(
                    (start, toks[close][3],
                     f"size(({_arg_text(spans[0])}))")
                )
                return close + 1
    if name in ("list_resize", "array_resize"):
        # pads with NULL / truncates; try_element_at(a, size+1) is an
        # always-NULL value of the ELEMENT type (typed NULL padding)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, n_2 = _arg_text(spans[0]), _arg_text(spans[1])
            # flatten(array(...)), NOT concat(): a concat() emission
            # would be re-read by the duckdb string-concat NULL-skip
            # handler on the next fixpoint pass
            edits.append(
                (start, toks[close][3],
                 f"slice(flatten(array(({a_}), array_repeat("
                 f"try_element_at(({a_}), cardinality(({a_})) + 1), "
                 f"greatest(({n_2}) - cardinality(({a_})), 0)))), "
                 f"1, ({n_2}))")
            )
            return close + 1
    if name in ("list_select", "array_select"):
        # elements at the given 1-based indexes; out-of-bounds (and
        # index 0) become NULL elements — pinned: list_select([10],[5])
        # = [NULL]
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, ix = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"transform(({ix}), _i -> "
                 f"try_element_at(({a_}), nullif(_i, 0)))")
            )
            return close + 1
    if name == "list_where":
        # keep elements whose mask entry is true (duckdb rejects NULL
        # masks — coalesce(false) drops them here, a duck-rejected
        # shape either way)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, mk = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"transform(filter(transform(({a_}), (_e, _i) -> "
                 f"struct(_e AS _v, coalesce(try_element_at(({mk}), "
                 f"_i + 1), false) AS _m)), _s -> _s._m), _s -> _s._v)")
            )
            return close + 1
    if name == "row":
        # bare duck row(1, 'a') constructor → Spark struct (pinned:
        # duck renders the unnamed tuple, Spark the '0'..'n' struct —
        # positionally identical). ONLY outside comparison context:
        # row-vs-row comparisons belong to the field-wise 3VL
        # expansion in container_ops (Spark's native struct compare
        # treats NULL as smallest — a silent divergence there).
        spans, close = _call_arg_spans(toks, i + 1)
        nxt_t = toks[close + 1] if close + 1 < n else None
        prv_t = toks[i - 1] if i > 0 else None

        def _cmp_adjacent(tk):
            if tk is None:
                return False
            if tk[0] == "op" and any(c in tk[1] for c in "=<>!"):
                return True
            return tk[0] in _NAME_KINDS and tk[1].upper() in (
                "IN", "NOT", "BETWEEN", "IS",
            )
        if spans and not _cmp_adjacent(nxt_t) and not _cmp_adjacent(prv_t):
            edits.append((start, toks[i][3], "struct"))
            return i + 1
    if name == "struct_insert":
        raise TranspileError(
            "duckdb struct_insert needs the struct's full field list "
            "(statically unknowable for columns); reconstruct with "
            "named_struct(...) listing every field"
        )
    if name in ("list_dot_product", "list_inner_product",
                "list_cosine_similarity", "list_distance",
                "list_cosine_distance"):
        # vector folds over lists — Spark's array_* vector functions
        # don't exist for plain arrays, but zip_with + aggregate is
        # exact (the llm/similarity module uses the same fold)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, b_ = _arg_text(spans[0]), _arg_text(spans[1])

            def dot(x, y):
                return (
                    f"aggregate(zip_with({x}, {y}, "
                    f"(_x, _y) -> CAST(_x AS DOUBLE) * _y), "
                    f"CAST(0 AS DOUBLE), (_acc, _e) -> _acc + _e)"
                )
            if name in ("list_dot_product", "list_inner_product"):
                repl = dot(f"({a_})", f"({b_})")
            elif name == "list_distance":
                repl = (
                    f"sqrt(aggregate(zip_with(({a_}), ({b_}), "
                    f"(_x, _y) -> (CAST(_x AS DOUBLE) - _y) * "
                    f"(CAST(_x AS DOUBLE) - _y)), CAST(0 AS DOUBLE), "
                    f"(_acc, _e) -> _acc + _e))"
                )
            else:
                cos = (
                    f"({dot(f'({a_})', f'({b_})')}) / "
                    f"(sqrt({dot(f'({a_})', f'({a_})')}) * "
                    f"sqrt({dot(f'({b_})', f'({b_})')}))"
                )
                repl = (
                    f"(1 - ({cos}))" if name == "list_cosine_distance"
                    else f"({cos})"
                )
            edits.append((start, toks[close][3], repl))
            return close + 1
    if name in ("list_reverse_sort", "array_reverse_sort"):
        # descending, NULLs LAST (pinned: [1,3,NULL,2] → [3,2,1,NULL])
        # — exactly Spark sort_array(x, false)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            edits.append(
                (start, toks[close][3],
                 f"sort_array(({_arg_text(spans[0])}), false)")
            )
            return close + 1
    if name in ("list_unique", "array_unique"):
        # COUNT of distinct non-NULL elements (pinned: [1,2,2,NULL]→2)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            edits.append(
                (start, toks[close][3],
                 f"size(array_distinct(filter(({_arg_text(spans[0])}), "
                 f"_ld -> _ld IS NOT NULL)))")  # _ld: the shared
                # array_distinct NULL-drop marker — re-reads skip it
            )
            return close + 1
    if name == "list_any_value":
        # first non-NULL element
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            edits.append(
                (start, toks[close][3],
                 f"try_element_at(filter(({_arg_text(spans[0])}), "
                 f"_e -> _e IS NOT NULL), 1)")
            )
            return close + 1
    if name in ("array_pop_back", "array_pop_front", "list_pop_back",
                "list_pop_front"):
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            a_ = _arg_text(spans[0])
            b = "1" if name.endswith("back") else "2"
            edits.append(
                (start, toks[close][3],
                 f"slice(({a_}), {b}, "
                 f"greatest(cardinality(({a_})) - 1, 0))")
            )
            return close + 1

    return None
