"""Interactive expression tester — `python -m dumb_crawler_ray.expr_cli`.

The rebuild of the reference's expression REPL
(J/expression/ExpressionTesterCli.java:20-97, `java -jar crawler.jar
test`): set a URL, evaluate DSL expressions against it, inspect the parsed
URL variables. Also usable non-interactively:

    python -m dumb_crawler_ray.expr_cli --url https://x.com/a 'MATCHES(path, "/a")'
"""

from __future__ import annotations

import sys

from .functions.expr import compile_expression
from .functions.urlparts import split_batch


def evaluate(expr_text: str, url: str):
    ctx = split_batch([url])
    return bool(compile_expression(expr_text).evaluate(ctx)[0])


def show_vars(url: str) -> str:
    ctx = split_batch([url])
    return "\n".join(
        f"  {name:>10} = {col[0].as_py()!r}" for name, col in ctx.items()
    )


def repl() -> None:
    url = "https://example.com/path?q=1"
    print("expression tester — commands: url <u>, vars, quit; anything "
          "else evaluates as an expression")
    print(f"url = {url}")
    while True:
        try:
            line = input("> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        if line in ("quit", "exit"):
            break
        if line == "vars":
            print(show_vars(url))
            continue
        if line.startswith("url "):
            url = line[4:].strip()
            print(f"url = {url}")
            continue
        try:
            print(evaluate(line, url))
        except Exception as e:  # REPL: show, don't crash
            print(f"error: {e}")


def main(argv: list[str]) -> int:
    if "--url" in argv:
        i = argv.index("--url")
        url = argv[i + 1]
        exprs = argv[:i] + argv[i + 2:]
        for e in exprs:
            print(f"{e!r} -> {evaluate(e, url)}")
        return 0
    repl()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
