"""One-shot mechanical sweep (r6): gate every eager validation guard in
``ops/`` behind ``if validation_enabled():``.

A "guard" is the loud-refusal idiom and nothing else:

  Form A:   <var> = <expr containing an eager action>     # .count()/
            if <test referencing var>:                    # .first()/...
                raise ...
            ...and <var> is never read again in the enclosing body.

  Form B:   if <test containing an eager action>:
                raise ...

Both forms compute data ONLY to decide a refusal, so gating them cannot
change any op's output on valid input.  Assignments whose value feeds
real computation never match (the var is read later / no if-raise
follows).  The tool refuses to touch a site whose line range contains a
triple-quoted string (re-indenting would edit the literal).

Usage: python tools/gate_validation.py [--apply] [files...]
Without --apply it only lists the sites.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

EAGER = {"count", "first", "head", "take", "collect", "isEmpty"}
GATE = "if validation_enabled():"
IMPORT = "from .validate import validation_enabled"


def _has_eager_call(node: ast.AST) -> bool:
    for n in ast.walk(node):
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr in EAGER
        ):
            return True
    return False


def _names_loaded(node: ast.AST) -> set[str]:
    return {
        n.id
        for n in ast.walk(node)
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
    }


def _is_raise_only(stmts: list[ast.stmt]) -> bool:
    return len(stmts) == 1 and isinstance(stmts[0], ast.Raise)


def _find_sites(tree: ast.Module) -> list[tuple[int, int]]:
    """(first_line, last_line) of each guard site, 1-based inclusive."""
    sites: list[tuple[int, int]] = []

    def visit_body(body: list[ast.stmt]) -> None:
        i = 0
        while i < len(body):
            s = body[i]
            matched = False
            if (
                isinstance(s, ast.Assign)
                and len(s.targets) == 1
                and isinstance(s.targets[0], ast.Name)
                and _has_eager_call(s.value)
                and i + 1 < len(body)
            ):
                var = s.targets[0].id
                nxt = body[i + 1]
                if (
                    isinstance(nxt, ast.If)
                    and _is_raise_only(nxt.body)
                    and not nxt.orelse
                    and var in _names_loaded(nxt.test)
                ):
                    used_later = any(
                        var in _names_loaded(later) for later in body[i + 2 :]
                    )
                    if not used_later:
                        sites.append((s.lineno, nxt.end_lineno))
                        i += 2
                        matched = True
            if not matched and (
                isinstance(s, ast.If)
                and _is_raise_only(s.body)
                and not s.orelse
                and _has_eager_call(s.test)
            ):
                sites.append((s.lineno, s.end_lineno))
                i += 1
                matched = True
            if not matched:
                for child_body in (
                    getattr(s, "body", None),
                    getattr(s, "orelse", None),
                    getattr(s, "finalbody", None),
                ):
                    if child_body:
                        visit_body(child_body)
                for h in getattr(s, "handlers", []) or []:
                    visit_body(h.body)
                i += 1

    visit_body(tree.body)
    return sites


def process(path: Path, apply: bool) -> int:
    src = path.read_text()
    tree = ast.parse(src)
    sites = _find_sites(tree)
    if not sites:
        return 0
    lines = src.splitlines(keepends=True)
    ok_sites = []
    for lo, hi in sites:
        chunk = "".join(lines[lo - 1 : hi])
        if '"""' in chunk or "'''" in chunk:
            print(f"  SKIP (triple-quote in range) {path.name}:{lo}-{hi}")
            continue
        first = lines[lo - 1]
        indent = first[: len(first) - len(first.lstrip())]
        already = lo >= 2 and lines[lo - 2].strip() == GATE
        if already:
            continue
        ok_sites.append((lo, hi, indent))
        print(f"  {path.name}:{lo}-{hi}")
    if not apply or not ok_sites:
        return len(ok_sites)
    for lo, hi, indent in reversed(ok_sites):
        block = [indent + GATE + "\n"] + [
            ("    " + l if l.strip() else l) for l in lines[lo - 1 : hi]
        ]
        lines[lo - 1 : hi] = block
    out = "".join(lines)
    if "validation_enabled" not in src:
        # add the import after the last top-level import line
        t2 = ast.parse(src)
        last_imp = max(
            (s.end_lineno for s in t2.body if isinstance(s, (ast.Import, ast.ImportFrom))),
            default=0,
        )
        ls = out.splitlines(keepends=True)
        ls.insert(last_imp, IMPORT + "\n")
        out = "".join(ls)
    ast.parse(out)  # must still parse
    path.write_text(out)
    return len(ok_sites)


def main():
    args = [a for a in sys.argv[1:] if a != "--apply"]
    apply = "--apply" in sys.argv
    files = (
        [Path(a) for a in args]
        if args
        else sorted(Path("lmss_entity_extractor_spark/ops").glob("*.py"))
    )
    total = 0
    for p in files:
        if p.name in ("validate.py", "__init__.py"):
            continue
        n = process(p, apply)
        total += n
    print(f"{'gated' if apply else 'found'} {total} sites")


if __name__ == "__main__":
    main()
