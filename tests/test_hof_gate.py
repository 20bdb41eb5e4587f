"""Source-scan gate for the HOF derived-array regression class.

Higher-order-function lambdas (`F.transform`, `F.aggregate`, `F.filter`,
`F.zip_with`, `F.exists`, `F.forall`) are interpreted (CodegenFallback)
and do NOT common-subexpression-eliminate references to derived arrays
captured from the enclosing scope: the r6 `shingles_of` bug re-evaluated
`filter(split(text))` inside every `element_at` — O(words^2) interpreted
work per document, a measured 16x slowdown on the sf0.1 shingle scan
(fixed in commit 0971aa5 by binding the array once as a lambda variable
via a single-element `transform` wrapper).

This gate makes that prose rule executable: inside any callable passed to
a HOF, an `element_at`/`try_element_at`/`get` whose array operand is NOT
a lambda variable (a parameter of some enclosing HOF callable) but a
derived-array expression — inline, or a captured name assigned from one —
is flagged. Cheap captures (`F.col`, `F.lit`, literals, function
parameters of ordinary defs carrying Columns built by the CALLER from
plain references) stay allowed: the expensive class is re-evaluating a
computation chain per element, not referencing a column."""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "clickhouse_github_log_importer_spark"

HOF_FUNCS = {"transform", "aggregate", "zip_with", "exists", "forall", "filter", "reduce"}
INDEXERS = {"element_at", "try_element_at", "get"}
# F.* constructors whose result is a computed expression chain — capturing
# one of these into a HOF body re-evaluates the chain per element
DERIVED_FUNCS = {
    "split", "filter", "transform", "aggregate", "sequence", "slice",
    "sort_array", "array_sort", "array_distinct", "flatten", "zip_with",
    "arrays_zip", "array_repeat", "expr", "concat", "collect_list",
    "collect_set", "array_agg", "from_json", "map_values", "map_keys",
}
# local helpers known to build derived arrays
DERIVED_HELPERS = {"words_of", "shingles_of"}


def _f_attr(node: ast.AST) -> str | None:
    """'x' when node is F.x, else None."""
    if (
        isinstance(node, ast.Attribute)
        and isinstance(node.value, ast.Name)
        and node.value.id == "F"
    ):
        return node.attr
    return None


def _is_derived_expr(node: ast.AST) -> bool:
    if isinstance(node, ast.Call):
        fa = _f_attr(node.func)
        if fa in DERIVED_FUNCS:
            return True
        if isinstance(node.func, ast.Name) and node.func.id in DERIVED_HELPERS:
            return True
    return False


class _Scope:
    def __init__(
        self, params: set[str], hof_bound: bool, assigns: dict, funcdefs: dict
    ):
        self.params = params
        self.hof_bound = hof_bound  # params are Spark lambda variables
        self.assigns = assigns  # name -> value AST node (this scope)
        self.funcdefs = funcdefs  # name -> FunctionDef node (this scope)


class Scanner(ast.NodeVisitor):
    def __init__(self, filename: str) -> None:
        self.filename = filename
        self.violations: list[str] = []
        self._scopes: list[_Scope] = []

    # --- scope bookkeeping -------------------------------------------
    def _collect_assigns(self, body) -> tuple[dict, dict]:
        out: dict[str, ast.AST] = {}
        fns: dict[str, ast.FunctionDef] = {}
        for stmt in body:
            for sub in ast.walk(stmt):
                if isinstance(sub, ast.Assign):
                    for tgt in sub.targets:
                        if isinstance(tgt, ast.Name):
                            out[tgt.id] = sub.value
                elif isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    fns[sub.name] = sub
        return out, fns

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        params = {a.arg for a in node.args.args + node.args.kwonlyargs}
        assigns, fns = self._collect_assigns(node.body)
        self._scopes.append(_Scope(params, False, assigns, fns))
        self.generic_visit(node)
        self._scopes.pop()

    visit_AsyncFunctionDef = visit_FunctionDef

    def _visit_hof_callable(self, fn: ast.AST) -> None:
        if isinstance(fn, ast.Lambda):
            params = {a.arg for a in fn.args.args}
            self._scopes.append(_Scope(params, True, {}, {}))
            self._check_body(fn.body)
            self.generic_visit(fn.body)
            self._scopes.pop()
        elif isinstance(fn, ast.Name):
            # a callable passed by name: a lambda assigned to a local,
            # or a nested def (shingles_of's `body` pattern) — both get
            # HOF-bound params, and a def's body is re-checked in that
            # scope (the def-by-name form of the shingles bug was a
            # review-caught gate hole)
            target = None
            for scope in reversed(self._scopes):
                val = scope.funcdefs.get(fn.id) or scope.assigns.get(fn.id)
                if val is not None:
                    target = val
                    break
            if isinstance(target, ast.Lambda):
                self._visit_hof_callable(target)
            elif isinstance(target, (ast.FunctionDef, ast.AsyncFunctionDef)):
                params = {
                    a.arg for a in target.args.args + target.args.kwonlyargs
                }
                assigns, fns = self._collect_assigns(target.body)
                self._scopes.append(_Scope(params, True, assigns, fns))
                for stmt in target.body:
                    self._check_body(stmt)
                    self.generic_visit(stmt)
                self._scopes.pop()

    def visit_Call(self, node: ast.Call) -> None:
        fa = _f_attr(node.func)
        if fa in HOF_FUNCS:
            # non-callable args visited normally; callable args get a
            # HOF-bound scope
            for arg in list(node.args) + [kw.value for kw in node.keywords]:
                if isinstance(arg, (ast.Lambda, ast.Name)):
                    self._visit_hof_callable(arg)
                else:
                    self.visit(arg)
            return
        self.generic_visit(node)

    # --- the actual check --------------------------------------------
    def _lookup(self, name: str) -> ast.AST | None:
        for scope in reversed(self._scopes):
            if name in scope.params:
                return "param-hof" if scope.hof_bound else "param-plain"
            if name in scope.assigns:
                return scope.assigns[name]
        return None

    def _iter_skip_lambdas(self, node: ast.AST):
        """Descendants of `node`, pruning nested Lambda subtrees — those
        get their own HOF-bound scope when visited in HOF position."""
        for child in ast.iter_child_nodes(node):
            if isinstance(child, ast.Lambda):
                continue
            yield child
            yield from self._iter_skip_lambdas(child)

    def _check_body(self, body: ast.AST) -> None:
        for sub in [body, *self._iter_skip_lambdas(body)]:
            if not isinstance(sub, ast.Call):
                continue
            fa = _f_attr(sub.func)
            if fa not in INDEXERS or not sub.args:
                continue
            arr = sub.args[0]
            where = f"{self.filename}:{getattr(sub, 'lineno', '?')}"
            if _is_derived_expr(arr):
                self.violations.append(
                    f"{where}: F.{fa} over an INLINE derived array inside "
                    "a HOF lambda — bind it as a lambda variable first"
                )
            elif isinstance(arr, ast.Name):
                resolved = self._lookup(arr.id)
                if resolved == "param-hof" or resolved == "param-plain":
                    continue  # lambda variable / plain function param: ok
                if resolved is not None and _is_derived_expr(resolved):
                    self.violations.append(
                        f"{where}: F.{fa}({arr.id}, ...) inside a HOF "
                        f"lambda captures derived array `{arr.id}` from "
                        "the enclosing scope — HOF lambdas are "
                        "CodegenFallback and re-evaluate it per element; "
                        "bind it once via a single-element transform "
                        "wrapper (see dedup_text.shingles_of)"
                    )


def scan_source(src: str, filename: str = "<mem>") -> list[str]:
    tree = ast.parse(src)
    sc = Scanner(filename)
    # wrap module in a pseudo-scope holding module-level assigns
    assigns, fns = sc._collect_assigns(tree.body)
    sc._scopes.append(_Scope(set(), False, assigns, fns))
    sc.visit(tree)
    # a def passed by name to a HOF is visited twice (normal traversal +
    # HOF-position re-check); dedupe identical findings
    return list(dict.fromkeys(sc.violations))


def test_package_has_no_unbound_derived_arrays_in_hofs():
    all_violations: list[str] = []
    for path in sorted(PKG.rglob("*.py")):
        all_violations += scan_source(path.read_text(), str(path.relative_to(PKG.parent)))
    assert not all_violations, "\n".join(all_violations)


def test_gate_catches_reintroduced_unbound_hof():
    # the exact r6 shingles_of bug shape, deliberately reintroduced
    bad = (
        "def shingles(text, n=3):\n"
        "    wa = F.filter(F.split(F.col(text), ' '), lambda w: w != '')\n"
        "    idx = F.sequence(F.lit(1), F.size(wa) - (n - 1))\n"
        "    return F.transform(idx, lambda i: F.concat_ws(' ',\n"
        "        *[F.element_at(wa, i + k) for k in range(n)]))\n"
    )
    v = scan_source(bad)
    assert len(v) >= 1 and "wa" in v[0], v


def test_gate_catches_inline_derived_array():
    bad = (
        "def f(c):\n"
        "    return F.transform(F.sequence(F.lit(1), F.lit(3)),\n"
        "        lambda i: F.element_at(F.split(F.col(c), ' '), i))\n"
    )
    v = scan_source(bad)
    assert len(v) == 1 and "INLINE" in v[0], v


def test_gate_allows_bound_lambda_variable():
    # the fixed shingles_of shape: array bound once as a lambda variable
    good = (
        "def shingles(text, n=3):\n"
        "    w = F.filter(F.split(F.col(text), ' '), lambda x: x != '')\n"
        "    def body(wa):\n"
        "        idx = F.sequence(F.lit(1), F.size(wa) - (n - 1))\n"
        "        gram = lambda i: F.concat_ws(' ',\n"
        "            *[F.element_at(wa, i + k) for k in range(n)])\n"
        "        return F.transform(idx, gram)\n"
        "    return F.get(F.transform(F.array(w), body), 0)\n"
    )
    assert scan_source(good) == []


def test_gate_catches_def_passed_by_name():
    # the review-caught hole: the shingles bug rewritten with a nested
    # def instead of a lambda must still be flagged
    bad = (
        "def shingles(text, n=3):\n"
        "    wa = F.filter(F.split(F.col(text), ' '), lambda w: w != '')\n"
        "    idx = F.sequence(F.lit(1), F.size(wa) - (n - 1))\n"
        "    def gram(i):\n"
        "        return F.concat_ws(' ',\n"
        "            *[F.element_at(wa, i + k) for k in range(n)])\n"
        "    return F.transform(idx, gram)\n"
    )
    v = scan_source(bad)
    assert len(v) >= 1 and "wa" in v[0], v


def test_gate_allows_plain_column_reference():
    # referencing F.col-built arrays is cheap; only derived chains flag
    good = (
        "def f():\n"
        "    vals = F.col('vals')\n"
        "    return F.transform(F.col('idx'), lambda i: F.element_at(vals, i))\n"
    )
    assert scan_source(good) == []
