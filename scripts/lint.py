"""In-repo AST lint: a ruff-subset that runs with zero dependencies.

The reference's de-facto correctness gate is ruff + pyright CI (reference
.github/workflows/ci.yml:14-56, pyproject.toml:72-75). This repo mirrors
those configs in pyproject.toml + .github/workflows/ci.yml for environments
that have the tools; THIS script is the always-available fallback gate
(scripts/check.sh) for sandboxes without ruff/pyright installed.

Checks (ruff rule codes for familiarity):
  F401  unused import            (skipped in __init__.py: re-export surface)
  F811  top-level redefinition of a def/class
  E711  comparison to None with == / !=
  E722  bare ``except:``
  B006  mutable default argument (list/dict/set literal or constructor)
  F541  f-string without any placeholders

``# noqa`` (optionally with codes) on the flagged line suppresses findings.
Exit status 0 = clean, 1 = findings.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MUTABLE_CALLS = {"list", "dict", "set"}


def _noqa_lines(source: str) -> dict[int, str]:
    out: dict[int, str] = {}
    for i, line in enumerate(source.splitlines(), start=1):
        if "# noqa" in line:
            out[i] = line.split("# noqa", 1)[1]
    return out


def _suppressed(noqa: dict[int, str], lineno: int, code: str) -> bool:
    if lineno not in noqa:
        return False
    tail = noqa[lineno].strip()
    if not tail.startswith(":"):
        return True  # bare "# noqa" suppresses everything
    return code in tail


def _import_bindings(tree: ast.Module) -> list[tuple[str, int, str]]:
    """(bound name, lineno, display) for every module-level import."""
    out = []
    for node in tree.body:
        stmts = [node]
        # Gated-import idiom: try/except ImportError at module top level.
        if isinstance(node, ast.Try):
            stmts = list(node.body)
        for stmt in stmts:
            if isinstance(stmt, ast.Import):
                for alias in stmt.names:
                    bound = alias.asname or alias.name.split(".")[0]
                    out.append((bound, stmt.lineno, alias.name))
            elif isinstance(stmt, ast.ImportFrom):
                if stmt.module == "__future__":
                    continue
                for alias in stmt.names:
                    if alias.name == "*":
                        continue
                    bound = alias.asname or alias.name
                    out.append((bound, stmt.lineno, alias.name))
    return out


def _used_names(tree: ast.Module) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # getattr-style "module.attr" roots arrive as Name loads anyway;
            # nothing extra needed, but keep the attr for __all__ strings.
            pass
    # Names re-exported through __all__ count as used.
    for node in tree.body:
        targets = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AugAssign):
            targets = [node.target]
        for tgt in targets:
            if isinstance(tgt, ast.Name) and tgt.id == "__all__":
                for sub in ast.walk(node.value):
                    if isinstance(sub, ast.Constant) and isinstance(sub.value, str):
                        used.add(sub.value)
    return used


def _is_mutable_default(node: ast.expr) -> bool:
    if isinstance(node, (ast.List, ast.Dict, ast.Set)):
        return True
    return (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Name)
        and node.func.id in MUTABLE_CALLS
    )


def lint_file(path: Path) -> list[str]:
    source = path.read_text()
    try:
        tree = ast.parse(source, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]
    noqa = _noqa_lines(source)
    findings: list[str] = []

    def flag(lineno: int, code: str, msg: str) -> None:
        if not _suppressed(noqa, lineno, code):
            findings.append(f"{path}:{lineno}: {code} {msg}")

    # F401 — skip __init__.py (imports there ARE the public surface).
    if path.name != "__init__.py":
        used = _used_names(tree)
        for bound, lineno, display in _import_bindings(tree):
            if bound not in used and not bound.startswith("_"):
                flag(lineno, "F401", f"unused import: {display}")

    # F811 — duplicate top-level def/class (decorator-based re-registration
    # like @overload or @singledispatch variants is not used at module level
    # in this codebase).
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if any(
                isinstance(d, ast.Attribute) and d.attr in ("register", "setter")
                for d in node.decorator_list
            ):
                continue
            if node.name in seen:
                flag(
                    node.lineno,
                    "F811",
                    f"redefinition of '{node.name}' (first at line {seen[node.name]})",
                )
            seen[node.name] = node.lineno

    # A FormattedValue's format spec (":.4f") is itself a JoinedStr with no
    # placeholders — exclude those from the F541 walk.
    format_specs = {
        id(node.format_spec)
        for node in ast.walk(tree)
        if isinstance(node, ast.FormattedValue) and node.format_spec is not None
    }

    for node in ast.walk(tree):
        if isinstance(node, ast.Compare):
            for op, comparator in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) and (
                    isinstance(comparator, ast.Constant) and comparator.value is None
                ):
                    flag(node.lineno, "E711", "comparison to None (use 'is None')")
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            flag(node.lineno, "E722", "bare 'except:'")
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in [*node.args.defaults, *node.args.kw_defaults]:
                if default is not None and _is_mutable_default(default):
                    flag(default.lineno, "B006", "mutable default argument")
        elif isinstance(node, ast.JoinedStr) and id(node) not in format_specs:
            if not any(isinstance(v, ast.FormattedValue) for v in node.values):
                flag(node.lineno, "F541", "f-string without placeholders")

    return findings


def main(argv: list[str]) -> int:
    roots = [Path(a) for a in argv] or [Path("spine_vision_tpu")]
    files: list[Path] = []
    for root in roots:
        files.extend(sorted(root.rglob("*.py")) if root.is_dir() else [root])
    all_findings: list[str] = []
    for f in files:
        if "__pycache__" in f.parts:
            continue
        all_findings.extend(lint_file(f))
    for line in all_findings:
        print(line)
    print(f"lint: {len(files)} files, {len(all_findings)} findings")
    return 1 if all_findings else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
