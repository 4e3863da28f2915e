#!/usr/bin/env python
"""Self-contained lint gate (no third-party tools in this environment).

Checks, per file:
  * the file parses (syntax);
  * no unused imports (AST-based; ``__init__.py`` re-export facades and
    lines marked ``# noqa`` are exempt);
  * no lines longer than MAX_LINE characters;
  * no trailing whitespace, no tabs in indentation;
  * no ``except:`` bare handlers and no ``except Exception: pass``
    (silent swallowing -- the checkpoint bug class);
  * no ``print(`` in library code (krypy_tpu/) unless marked ``# noqa``.

Exit code 0 = clean.
"""

import ast
import pathlib
import sys

MAX_LINE = 95
ROOT = pathlib.Path(__file__).resolve().parent.parent
TARGETS = [
    "krypy_tpu",
    "tests",
    "benchmarks",
    "examples",
    "tools",
    "bench.py",
    "__graft_entry__.py",
    "example.py",
]
#: library modules where print() is an allowed UI (factories report mode)
PRINT_OK = {"krypy_tpu/recycling/factories.py"}


def iter_files():
    for t in TARGETS:
        p = ROOT / t
        if p.is_file():
            yield p
        else:
            yield from sorted(p.rglob("*.py"))


class ImportTracker(ast.NodeVisitor):
    def __init__(self):
        self.imported = {}  # name -> lineno
        self.used = set()

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imported[name] = node.lineno
        self.generic_visit(node)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            self.imported[a.asname or a.name] = node.lineno
        self.generic_visit(node)

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def check_file(path):
    rel = path.relative_to(ROOT).as_posix()
    src = path.read_text()
    lines = src.splitlines()
    problems = []

    try:
        tree = ast.parse(src)
    except SyntaxError as e:
        return [f"{rel}:{e.lineno}: syntax error: {e.msg}"]

    noqa = {
        i for i, line in enumerate(lines, 1) if "# noqa" in line
    }

    for i, line in enumerate(lines, 1):
        if i in noqa:
            continue
        if len(line) > MAX_LINE:
            problems.append(f"{rel}:{i}: line too long ({len(line)})")
        if line != line.rstrip():
            problems.append(f"{rel}:{i}: trailing whitespace")
        stripped = line.lstrip("\t ")
        if "\t" in line[: len(line) - len(stripped)]:
            problems.append(f"{rel}:{i}: tab in indentation")

    # unused imports (skip re-export facades)
    is_facade = path.name == "__init__.py"
    if not is_facade:
        tracker = ImportTracker()
        tracker.visit(tree)
        # names used in __all__ strings count as used
        for node in ast.walk(tree):
            if isinstance(node, ast.Constant) and isinstance(
                node.value, str
            ):
                tracker.used.add(node.value)
        for name, lineno in tracker.imported.items():
            if name not in tracker.used and lineno not in noqa:
                problems.append(f"{rel}:{lineno}: unused import '{name}'")

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler):
            if node.lineno in noqa:
                continue
            if node.type is None:
                problems.append(
                    f"{rel}:{node.lineno}: bare 'except:'"
                )
            elif (
                isinstance(node.type, ast.Name)
                and node.type.id == "Exception"
                and len(node.body) == 1
                and isinstance(node.body[0], ast.Pass)
            ):
                problems.append(
                    f"{rel}:{node.lineno}: silent 'except Exception: "
                    "pass'"
                )
        if (
            rel.startswith("krypy_tpu/")
            and rel not in PRINT_OK
            and isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "print"
            and node.lineno not in noqa
        ):
            problems.append(
                f"{rel}:{node.lineno}: print() in library code"
            )
    return problems


def main():
    all_problems = []
    n = 0
    for path in iter_files():
        n += 1
        all_problems.extend(check_file(path))
    for p in all_problems:
        print(p)
    print(f"lint: {n} files, {len(all_problems)} problem(s)")
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
