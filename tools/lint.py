"""Dependency-free lint gate (pyflakes-lite).

The environment bakes in no flake8/ruff/pyflakes, and the reference's CI runs
flake8 before tests (/root/reference/.circleci/config.yml:44-52).  This script
covers the highest-value subset with the stdlib ``ast`` module:

  * syntax errors (ast.parse),
  * undefined names referenced from annotations — invisible at runtime under
    ``from __future__ import annotations`` (the exact class of bug that shipped
    as ``Optional`` used-but-unimported in slam/fusionutils.py),
  * undefined names loaded anywhere in a module body, with a scope-aware walk
    (functions, classes, lambdas, comprehensions, except handlers, walrus),
  * unused imports (module scope; ``__init__.py`` re-exports are exempt).

Exit status is non-zero when any finding is reported, so it works as a CI gate:

    python tools/lint.py            # lint the default tree
    python tools/lint.py path1 ...  # lint specific files/dirs
"""

from __future__ import annotations

import ast
import builtins
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_TARGETS = [
    "gradslam_tpu",
    "tests",
    "tools",
    "examples",
    "bench.py",
    "bench_scaling.py",
    "__graft_entry__.py",
]

BUILTIN_NAMES = set(dir(builtins)) | {
    "__file__",
    "__name__",
    "__doc__",
    "__package__",
    "__spec__",
    "__loader__",
    "__builtins__",
    "__debug__",
    "__annotations__",
    "__dict__",
    "__path__",
    "__all__",
    "__version__",
    "__class__",  # implicit closure cell inside methods (zero-arg super())
}


def _bound_names(target: ast.expr):
    """Yield names bound by an assignment/for/with target expression."""
    if isinstance(target, ast.Name):
        yield target.id
    elif isinstance(target, (ast.Tuple, ast.List)):
        for elt in target.elts:
            yield from _bound_names(elt)
    elif isinstance(target, ast.Starred):
        yield from _bound_names(target.value)
    # Attribute/Subscript targets bind nothing new.


class Scope:
    def __init__(self, parent=None, is_class=False):
        self.parent = parent
        self.is_class = is_class
        self.names: set[str] = set()
        self.globals: set[str] = set()

    def bind(self, name: str) -> None:
        self.names.add(name)

    def resolves(self, name: str) -> bool:
        scope, skip_class = self, False
        while scope is not None:
            # Class bodies are not enclosing scopes for nested functions.
            if not (skip_class and scope.is_class) and name in scope.names:
                return True
            if not scope.is_class:
                skip_class = True
            scope = scope.parent
        return name in BUILTIN_NAMES


class Checker(ast.NodeVisitor):
    """Two-pass, scope-aware undefined-name and unused-import checker.

    Pass 1 (per scope): collect every binding in the scope (hoisting, like
    Python's own symbol table — a name assigned anywhere in a function is local
    everywhere in it).  Pass 2: visit loads and nested scopes.
    """

    def __init__(self, path: Path, tree: ast.Module, is_init: bool):
        self.path = path
        self.is_init = is_init
        self.problems: list[tuple[int, str]] = []
        self.module_scope = Scope()
        self.import_lines: dict[str, int] = {}
        self.used_names: set[str] = set()
        self._tree = tree

    # -- binding collection ------------------------------------------------
    def _collect(self, body, scope: Scope) -> None:
        """Collect all names bound directly in this scope (no nested scopes)."""
        for node in body:
            self._collect_stmt(node, scope)

    def _collect_stmt(self, node: ast.stmt, scope: Scope) -> None:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            if isinstance(node, ast.ImportFrom) and node.module == "__future__":
                return
            for alias in node.names:
                name = alias.asname or alias.name.split(".")[0]
                if name == "*":
                    continue
                scope.bind(name)
                if scope is self.module_scope:
                    self.import_lines.setdefault(name, node.lineno)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            scope.bind(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                for n in _bound_names(t):
                    scope.bind(n)
            self._collect_walrus(node.value, scope)
        elif isinstance(node, ast.AnnAssign):
            for n in _bound_names(node.target):
                scope.bind(n)
            if node.value is not None:
                self._collect_walrus(node.value, scope)
        elif isinstance(node, ast.AugAssign):
            for n in _bound_names(node.target):
                scope.bind(n)
        elif isinstance(node, (ast.For, ast.AsyncFor)):
            for n in _bound_names(node.target):
                scope.bind(n)
            self._collect_walrus(node.iter, scope)
            self._collect(node.body, scope)
            self._collect(node.orelse, scope)
        elif isinstance(node, (ast.With, ast.AsyncWith)):
            for item in node.items:
                if item.optional_vars is not None:
                    for n in _bound_names(item.optional_vars):
                        scope.bind(n)
                self._collect_walrus(item.context_expr, scope)
            self._collect(node.body, scope)
        elif isinstance(node, (ast.If, ast.While)):
            self._collect_walrus(node.test, scope)
            self._collect(node.body, scope)
            self._collect(node.orelse, scope)
        elif isinstance(node, ast.Try):
            self._collect(node.body, scope)
            for h in node.handlers:
                if h.name:
                    scope.bind(h.name)
                self._collect(h.body, scope)
            self._collect(node.orelse, scope)
            self._collect(node.finalbody, scope)
        elif isinstance(node, ast.Global):
            for n in node.names:
                scope.globals.add(n)
                scope.bind(n)
                self.module_scope.bind(n)
        elif isinstance(node, ast.Nonlocal):
            for n in node.names:
                scope.bind(n)
        elif isinstance(node, (ast.Expr, ast.Return, ast.Raise, ast.Assert, ast.Delete)):
            for child in ast.iter_child_nodes(node):
                if isinstance(child, ast.expr):
                    self._collect_walrus(child, scope)
        elif isinstance(node, getattr(ast, "Match", ())):
            self._collect_walrus(node.subject, scope)
            for case in node.cases:
                self._collect_match_pattern(case.pattern, scope)
                self._collect(case.body, scope)

    def _collect_match_pattern(self, pat, scope: Scope) -> None:
        for node in ast.walk(pat):
            if isinstance(node, getattr(ast, "MatchAs", ())) and node.name:
                scope.bind(node.name)
            elif isinstance(node, getattr(ast, "MatchStar", ())) and node.name:
                scope.bind(node.name)
            elif isinstance(node, getattr(ast, "MatchMapping", ())) and node.rest:
                scope.bind(node.rest)

    def _collect_walrus(self, expr: ast.expr, scope: Scope) -> None:
        """Walrus targets bind in the containing scope (comprehensions excepted,
        close enough for a lint-lite)."""
        for node in ast.walk(expr):
            if isinstance(node, ast.NamedExpr) and isinstance(node.target, ast.Name):
                scope.bind(node.target.id)

    # -- load checking -----------------------------------------------------
    def run(self) -> list[tuple[int, str]]:
        self._collect(self._tree.body, self.module_scope)
        self._visit_body(self._tree.body, self.module_scope)
        if not self.is_init:
            dunder_all = set()
            for node in self._tree.body:
                if isinstance(node, ast.Assign) and any(
                    isinstance(t, ast.Name) and t.id == "__all__" for t in node.targets
                ):
                    for elt in ast.walk(node.value):
                        if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                            dunder_all.add(elt.value)
            for name, lineno in sorted(self.import_lines.items(), key=lambda kv: kv[1]):
                if name not in self.used_names and name not in dunder_all and name != "_":
                    self.problems.append((lineno, f"unused import '{name}'"))
        return sorted(self.problems)

    def _check_expr(self, expr: ast.expr | None, scope: Scope, ctx: str = "") -> None:
        if expr is None:
            return
        for node in ast.walk(expr):
            if isinstance(node, ast.Name):
                self.used_names.add(node.id)
                if isinstance(node.ctx, ast.Load) and not scope.resolves(node.id):
                    where = f" (in {ctx})" if ctx else ""
                    self.problems.append(
                        (node.lineno, f"undefined name '{node.id}'{where}")
                    )
            elif isinstance(node, (ast.Lambda, ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)):
                self._visit_nested_expr(node, scope)
                # ast.walk would descend anyway; prune by replacing: simplest is
                # to let walk descend but nested scopes re-check with their own
                # scope — duplicates avoided by handling here and skipping walk.
                # We instead rely on _iter_skipping below.
        # NOTE: ast.walk descends into lambdas/comprehensions whose params we
        # haven't bound; handled by _visit_nested_expr marking their names.

    def _annotation_str(self, expr: ast.expr, scope: Scope, ctx: str) -> None:
        """String annotations (and all annotations under ``from __future__ import
        annotations``) still reference names that must resolve at module scope
        for get_type_hints/docs tooling to work."""
        if isinstance(expr, ast.Constant) and isinstance(expr.value, str):
            try:
                sub = ast.parse(expr.value, mode="eval")
            except SyntaxError:
                self.problems.append((expr.lineno, f"unparsable string annotation {expr.value!r}"))
                return
            for node in ast.walk(sub):
                if isinstance(node, ast.Name):
                    self.used_names.add(node.id)
                    if not scope.resolves(node.id):
                        self.problems.append(
                            (expr.lineno, f"undefined name '{node.id}' in string annotation (in {ctx})")
                        )
        else:
            self._check_expr(expr, scope, ctx)

    def _visit_nested_expr(self, node: ast.expr, scope: Scope) -> None:
        inner = Scope(parent=scope)
        if isinstance(node, ast.Lambda):
            args = node.args
            for a in (
                list(args.posonlyargs) + list(args.args) + list(args.kwonlyargs)
            ):
                inner.bind(a.arg)
            if args.vararg:
                inner.bind(args.vararg.arg)
            if args.kwarg:
                inner.bind(args.kwarg.arg)
            self._check_expr_pruned(node.body, inner)
        else:  # comprehension
            for gen in node.generators:
                # First iterable evaluates in the enclosing scope.
                self._check_expr_pruned(gen.iter, scope if gen is node.generators[0] else inner)
                for n in _bound_names(gen.target):
                    inner.bind(n)
                for cond in gen.ifs:
                    self._check_expr_pruned(cond, inner)
            if isinstance(node, ast.DictComp):
                self._check_expr_pruned(node.key, inner)
                self._check_expr_pruned(node.value, inner)
            else:
                self._check_expr_pruned(node.elt, inner)

    def _check_expr_pruned(self, expr: ast.expr | None, scope: Scope) -> None:
        """Check loads in expr, recursing manually so nested lambdas and
        comprehensions get their own scopes instead of leaking."""
        if expr is None:
            return
        stack = [expr]
        while stack:
            node = stack.pop()
            if isinstance(node, ast.Name):
                self.used_names.add(node.id)
                if isinstance(node.ctx, ast.Load) and not scope.resolves(node.id):
                    self.problems.append((node.lineno, f"undefined name '{node.id}'"))
            elif isinstance(node, ast.NamedExpr):
                if isinstance(node.target, ast.Name):
                    scope.bind(node.target.id)
                stack.append(node.value)
            elif isinstance(node, (ast.Lambda, ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)):
                self._visit_nested_expr(node, scope)
            else:
                for child in ast.iter_child_nodes(node):
                    if isinstance(child, ast.expr):
                        stack.append(child)
                    elif isinstance(child, ast.keyword):
                        stack.append(child.value)
                    elif isinstance(child, ast.FormattedValue):
                        stack.append(child.value)

    def _visit_body(self, body, scope: Scope) -> None:
        for node in body:
            self._visit_stmt(node, scope)

    def _visit_stmt(self, node: ast.stmt, scope: Scope) -> None:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for dec in node.decorator_list:
                self._check_expr_pruned(dec, scope)
            args = node.args
            defaults = list(args.defaults) + [d for d in args.kw_defaults if d is not None]
            for d in defaults:
                self._check_expr_pruned(d, scope)
            ctx = f"def {node.name}"
            for a in (
                list(args.posonlyargs)
                + list(args.args)
                + list(args.kwonlyargs)
                + ([args.vararg] if args.vararg else [])
                + ([args.kwarg] if args.kwarg else [])
            ):
                if a.annotation is not None:
                    self._annotation_str(a.annotation, scope, ctx)
            if node.returns is not None:
                self._annotation_str(node.returns, scope, ctx)
            inner = Scope(parent=scope)
            for a in (
                list(args.posonlyargs)
                + list(args.args)
                + list(args.kwonlyargs)
                + ([args.vararg] if args.vararg else [])
                + ([args.kwarg] if args.kwarg else [])
            ):
                inner.bind(a.arg)
            self._collect(node.body, inner)
            self._visit_body(node.body, inner)
        elif isinstance(node, ast.ClassDef):
            for dec in node.decorator_list:
                self._check_expr_pruned(dec, scope)
            for base in list(node.bases) + [k.value for k in node.keywords]:
                self._check_expr_pruned(base, scope)
            inner = Scope(parent=scope, is_class=True)
            self._collect(node.body, inner)
            self._visit_body(node.body, inner)
        elif isinstance(node, ast.AnnAssign):
            ctx = "variable annotation"
            self._annotation_str(node.annotation, scope, ctx)
            self._check_expr_pruned(node.value, scope)
        elif isinstance(node, (ast.Assign, ast.AugAssign)):
            self._check_expr_pruned(node.value, scope)
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            for t in targets:
                # Subscript/attribute targets still load their base expression.
                for sub in ast.walk(t):
                    if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load):
                        self.used_names.add(sub.id)
                        if not scope.resolves(sub.id):
                            self.problems.append((sub.lineno, f"undefined name '{sub.id}'"))
        elif isinstance(node, (ast.For, ast.AsyncFor)):
            self._check_expr_pruned(node.iter, scope)
            self._visit_body(node.body, scope)
            self._visit_body(node.orelse, scope)
        elif isinstance(node, (ast.With, ast.AsyncWith)):
            for item in node.items:
                self._check_expr_pruned(item.context_expr, scope)
            self._visit_body(node.body, scope)
        elif isinstance(node, (ast.If, ast.While)):
            self._check_expr_pruned(node.test, scope)
            self._visit_body(node.body, scope)
            self._visit_body(node.orelse, scope)
        elif isinstance(node, ast.Try):
            self._visit_body(node.body, scope)
            for h in node.handlers:
                self._check_expr_pruned(h.type, scope)
                self._visit_body(h.body, scope)
            self._visit_body(node.orelse, scope)
            self._visit_body(node.finalbody, scope)
        elif isinstance(node, (ast.Expr, ast.Return, ast.Raise, ast.Assert, ast.Delete)):
            for child in ast.iter_child_nodes(node):
                if isinstance(child, ast.expr):
                    self._check_expr_pruned(child, scope)
        elif isinstance(node, getattr(ast, "Match", ())):
            self._check_expr_pruned(node.subject, scope)
            for case in node.cases:
                self._check_expr_pruned(case.guard, scope)
                self._visit_body(case.body, scope)


def lint_file(path: Path) -> list[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    checker = Checker(path, tree, is_init=path.name == "__init__.py")
    rel = path.relative_to(REPO) if path.is_relative_to(REPO) else path
    return [f"{rel}:{line}: {msg}" for line, msg in checker.run()]


def main(argv: list[str]) -> int:
    targets = argv or DEFAULT_TARGETS
    files: list[Path] = []
    for t in targets:
        p = (REPO / t) if not Path(t).is_absolute() else Path(t)
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.exists():
            files.append(p)
        else:
            print(f"lint: no such path {t}", file=sys.stderr)
            return 2
    problems: list[str] = []
    for f in files:
        if "refshims" in f.parts:
            continue  # intentionally reference-compatible stubs
        problems.extend(lint_file(f))
    for p in problems:
        print(p)
    print(f"lint: {len(files)} files, {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
