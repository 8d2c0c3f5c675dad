#!/bin/sh
# Bootstrap a local PostgreSQL for tests/test_dialect_fuzz_pg.py and
# dialect-semantics verification. initdb refuses to run as root, so the
# cluster lives under a throwaway user with a /tmp socket directory (no
# TCP, no network). Idempotent: re-running starts the existing cluster.
#
#   sh tools/pg_sandbox.sh        # then: psql -h /tmp/pgv -U postgres
set -e
PGV=${SPARK_GRAFT_PGHOST:-/tmp/pgv}
id pguser >/dev/null 2>&1 || useradd -m pguser
mkdir -p "$PGV" && chown pguser "$PGV"
if [ ! -d "$PGV/data" ]; then
  # UTF8 + C.UTF-8, not the locale-default SQL_ASCII/C: real
  # deployments are UTF8, and encoding/ctype change observable
  # semantics (ascii('λ') is the code point 955 under UTF8 but the
  # first byte 206 under SQL_ASCII; chr(>127) rejects under
  # SQL_ASCII; lower('Å') only folds under a Unicode-aware ctype) —
  # the fuzz corpus pins the UTF8 behavior, which is also what
  # Spark's UTF8 strings match.
  su pguser -s /bin/sh -c \
    "initdb -D '$PGV/data' -U postgres -A trust -E UTF8 --locale=C.UTF-8" \
    > "$PGV/init.log" 2>&1
fi
su pguser -s /bin/sh -c \
  "pg_ctl -D '$PGV/data' -o '-k $PGV -c listen_addresses=' -l '$PGV/pg.log' start" \
  || true
sleep 1
psql -h "$PGV" -U postgres -tAc "SELECT 'pg_sandbox ready: ' || version()"
