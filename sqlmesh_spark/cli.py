"""Command-line surface — a minimal mirror of the reference's CLI
(sqlmesh/cli/main.py: plan / run / diff / render / evaluate / test /
invalidate / janitor) wrapping ``core.context.Context``.

    python -m sqlmesh_spark -p <project_dir> plan  [env] [--start --end] [--forward-only] [--select-model ...] [--auto-apply/--dry-run]
    python -m sqlmesh_spark -p <project_dir> run   [env] [--start --end]
    python -m sqlmesh_spark -p <project_dir> diff  [env]
    python -m sqlmesh_spark -p <project_dir> test
    python -m sqlmesh_spark -p <project_dir> render   <model> [--start --end]
    python -m sqlmesh_spark -p <project_dir> evaluate <model> [--start --end] [--limit N]
    python -m sqlmesh_spark -p <project_dir> restate <model>... --start --end
    python -m sqlmesh_spark -p <project_dir> environments | table_name <model>
    python -m sqlmesh_spark -p <project_dir> fetchdf <sql> | lint
    python -m sqlmesh_spark -p <project_dir> janitor
    python -m sqlmesh_spark -p <project_dir> invalidate <env>

argparse instead of click (no extra deps in the sandbox); commands map
1:1 onto Context methods so programmatic and CLI behavior can't drift.
Exit codes: 0 success, 1 failure (plan errors, failed tests).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from typing import Optional


def _build_spark(cpus: int):
    from sqlmesh_spark.session import build_session

    return build_session(cpus=cpus)


def _context(args):
    from sqlmesh_spark.core.context import Context

    spark = _build_spark(args.cpus)
    return Context(spark, project_dir=args.project)


def _plan_summary(plan) -> str:
    lines = [f"plan: environment={plan.environment} [{plan.start} .. {plan.end}]"]
    diff = plan.diff
    for name in diff.added:
        lines.append(f"  + {name} (added)")
    for name in diff.modified:
        lines.append(f"  ~ {name} (modified)")
    for name in diff.removed:
        lines.append(f"  - {name} (removed)")
    if not diff.has_changes:
        lines.append("  no changes")
    return "\n".join(lines)


def cmd_plan(args) -> int:
    ctx = _context(args)
    plan = ctx.plan(
        environment=args.environment,
        start=args.start,
        end=args.end,
        forward_only=args.forward_only,
        select_models=args.select_model or None,
    )
    print(_plan_summary(plan))
    if args.dry_run:
        return 0
    executed = ctx.apply(plan)
    for name, n in sorted(executed.items()):
        print(f"  applied {name}: {n} interval(s)")
    return 0


def cmd_run(args) -> int:
    ctx = _context(args)
    executed = ctx.run(
        environment=args.environment, start=args.start, end=args.end
    )
    for name, n in sorted(executed.items()):
        print(f"  ran {name}: {n} interval(s)")
    return 0


def cmd_diff(args) -> int:
    """Show the context diff against an environment WITHOUT applying —
    reference `sqlmesh diff` (main.py diff command)."""
    ctx = _context(args)
    plan = ctx.plan(environment=args.environment, start=args.start, end=args.end)
    print(_plan_summary(plan))
    return 0 if not plan.diff.has_changes else 2  # 2 = changes pending


def cmd_render(args) -> int:
    ctx = _context(args)
    print(ctx.render(args.model, start=args.start, end=args.end))
    return 0


def cmd_evaluate(args) -> int:
    ctx = _context(args)
    df = ctx.evaluate(args.model, start=args.start, end=args.end)
    print(df.limit(args.limit).toPandas().to_string(index=False))
    return 0


def cmd_test(args) -> int:
    """Run the project's YAML model tests (tests/*.yaml) — reference
    `sqlmesh test` (core/test/definition.py)."""
    from sqlmesh_spark.core.model_test import ModelTestRunner

    ctx = _context(args)
    runner = ModelTestRunner(ctx.spark)
    paths = sorted(glob.glob(os.path.join(args.project, "tests", "*.yaml"))) + sorted(
        glob.glob(os.path.join(args.project, "tests", "*.yml"))
    )
    if not paths:
        print("no tests found")
        return 0
    n_pass = n_fail = 0
    for path in paths:
        with open(path) as f:
            results = runner.run_yaml(f.read(), ctx.models)
        for r in results:
            status = "PASS" if r.passed else "FAIL"
            print(f"  {status} {os.path.basename(path)}::{r.name}")
            for msg in r.failures:
                print(f"       {msg}")
            n_pass += r.passed
            n_fail += not r.passed
    print(f"{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


def cmd_restate(args) -> int:
    """Clear processed intervals for the named models (and dependents)
    over [start, end) and re-run — reference `sqlmesh plan --restate-model`."""
    ctx = _context(args)
    executed = ctx.restate(
        args.model, start=args.start, end=args.end, environment=args.environment
    )
    for name, n in sorted(executed.items()):
        print(f"  restated {name}: {n} interval(s)")
    return 0


def cmd_environments(args) -> int:
    """List environments with their model→version pointer sets —
    reference `sqlmesh environments`."""
    ctx = _context(args)
    envs = ctx.state._read("environments")
    if not envs:
        print("no environments")
        return 0
    for env in sorted(envs):
        meta = ctx.state.get_environment_meta(env)
        flags = []
        if meta.get("invalidated"):
            flags.append("invalidated")
        if meta.get("expiration_ts"):
            flags.append(f"expires@{meta['expiration_ts']}")
        suffix = f" [{', '.join(flags)}]" if flags else ""
        print(f"{env}{suffix}")
        for model, version in sorted(envs[env].items()):
            print(f"  {model} -> {version}")
    return 0


def cmd_table_name(args) -> int:
    """Print the physical snapshot table backing a model — reference
    `sqlmesh table_name`."""
    from sqlmesh_spark.core.plan import build_snapshots

    ctx = _context(args)
    snaps = build_snapshots(ctx.models)
    name = args.model.lower()
    if name not in snaps:
        print(f"error: unknown model {args.model!r}", file=sys.stderr)
        return 1
    print(snaps[name].table_name)
    return 0


def cmd_fetchdf(args) -> int:
    """Run an ad-hoc SQL query and print rows — reference `sqlmesh fetchdf`."""
    ctx = _context(args)
    print(ctx.spark.sql(args.sql).limit(args.limit).toPandas().to_string(index=False))
    return 0


def cmd_lint(args) -> int:
    """Run the builtin lint rules over the project's models — reference
    `sqlmesh lint`. Exit 1 when violations exist."""
    from sqlmesh_spark.core.linter import lint_models

    ctx = _context(args)
    violations = lint_models(ctx.models)
    for v in violations:
        print(f"  {v.model}: {v.rule} — {v.message}")
    print(f"{len(violations)} violation(s)")
    return 1 if violations else 0


def cmd_janitor(args) -> int:
    ctx = _context(args)
    removed = ctx.janitor()
    for obj in removed:
        print(f"  removed {obj}")
    print(f"janitor: {len(removed)} object(s) removed")
    return 0


def cmd_invalidate(args) -> int:
    ctx = _context(args)
    ctx.invalidate_environment(args.environment)
    print(f"environment {args.environment} invalidated (janitor will clean it)")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sqlmesh_spark",
        description="PySpark-native sqlmesh-class transformation framework",
    )
    p.add_argument("-p", "--project", required=True, help="project directory")
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp, env_positional: bool = True):
        if env_positional:
            sp.add_argument("environment", nargs="?", default="prod")
        sp.add_argument("--start", default="1992-01-01")
        sp.add_argument("--end", default="1998-12-31")

    sp = sub.add_parser("plan", help="compute and apply a plan")
    common(sp)
    sp.add_argument("--forward-only", action="store_true")
    sp.add_argument("--select-model", action="append")
    sp.add_argument("--dry-run", action="store_true", help="show the plan, don't apply")
    sp.set_defaults(fn=cmd_plan)

    sp = sub.add_parser("run", help="plan+apply missing intervals")
    common(sp)
    sp.set_defaults(fn=cmd_run)

    sp = sub.add_parser("diff", help="show pending changes vs an environment")
    common(sp)
    sp.set_defaults(fn=cmd_diff)

    sp = sub.add_parser("render", help="render a model's SQL")
    sp.add_argument("model")
    common(sp, env_positional=False)
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("evaluate", help="execute a model's query and print rows")
    sp.add_argument("model")
    common(sp, env_positional=False)
    sp.add_argument("--limit", type=int, default=20)
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("test", help="run YAML model tests")
    sp.set_defaults(fn=cmd_test)

    sp = sub.add_parser("restate", help="re-process a window for models + dependents")
    sp.add_argument("model", nargs="+")
    sp.add_argument("environment", nargs="?", default="prod")
    sp.add_argument("--start", required=True)
    sp.add_argument("--end", required=True)
    sp.set_defaults(fn=cmd_restate)

    sp = sub.add_parser("environments", help="list environments and their pointers")
    sp.set_defaults(fn=cmd_environments)

    sp = sub.add_parser("table_name", help="physical snapshot table for a model")
    sp.add_argument("model")
    sp.set_defaults(fn=cmd_table_name)

    sp = sub.add_parser("fetchdf", help="run ad-hoc SQL and print rows")
    sp.add_argument("sql")
    sp.add_argument("--limit", type=int, default=20)
    sp.set_defaults(fn=cmd_fetchdf)

    sp = sub.add_parser("lint", help="run builtin lint rules over the project")
    sp.set_defaults(fn=cmd_lint)

    sp = sub.add_parser("janitor", help="clean expired environments/snapshots")
    sp.set_defaults(fn=cmd_janitor)

    sp = sub.add_parser("invalidate", help="mark an environment for cleanup")
    sp.add_argument("environment")
    sp.set_defaults(fn=cmd_invalidate)
    return p


def main(argv: Optional[list[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except Exception as exc:  # noqa: BLE001 - CLI boundary
        print(f"error: {exc}", file=sys.stderr)
        return 1


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
