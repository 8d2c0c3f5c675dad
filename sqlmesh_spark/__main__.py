"""``python -m sqlmesh_spark`` — CLI entry point (reference:
sqlmesh/cli/main.py)."""

from sqlmesh_spark.cli import main

raise SystemExit(main())
