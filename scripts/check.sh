#!/bin/bash
# Static-analysis + test gate, mirroring the reference's CI
# (reference .github/workflows/ci.yml:14-56: ruff lint, ruff format check,
# pyright basic; this repo adds the test suite the reference lacks).
#
# Usage: scripts/check.sh [--fast]
#   --fast  skip the pytest run (lint/typecheck only)
#
# ruff/pyright are used when installed (configs in pyproject.toml); in
# environments without them (e.g. this build sandbox) the in-repo AST lint
# (scripts/lint.py) plus a compileall syntax pass is the fallback gate.
set -u
cd "$(dirname "$0")/.."
rc=0

if command -v ruff >/dev/null 2>&1; then
  echo "== ruff check"; ruff check spine_vision_tpu || rc=1
  echo "== ruff format --check"; ruff format --check spine_vision_tpu || rc=1
else
  echo "== ruff not installed; running in-repo AST lint (scripts/lint.py)"
  python scripts/lint.py spine_vision_tpu scripts tests examples bench.py __graft_entry__.py || rc=1
fi

if command -v pyright >/dev/null 2>&1; then
  echo "== pyright"; pyright spine_vision_tpu || rc=1
else
  echo "== pyright not installed; running compileall syntax gate"
  python -m compileall -q spine_vision_tpu scripts tests examples bench.py __graft_entry__.py || rc=1
fi

echo "== docs artifacts (deps graph + lock)"
python scripts/gen_deps.py || rc=1
python scripts/gen_lock.py || rc=1

if [ "${1:-}" != "--fast" ]; then
  echo "== pytest"
  python -m pytest tests/ -q || rc=1
fi

if [ $rc -eq 0 ]; then echo "CHECK: clean"; else echo "CHECK: FAILURES"; fi
exit $rc
