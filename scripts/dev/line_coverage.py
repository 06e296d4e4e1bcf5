#!/usr/bin/env python3
"""Line-coverage collector with no third-party dependencies.

This environment has no pytest-cov/coverage.py (no network egress, no pip);
CI runs the real pytest-cov gate (.github/workflows/ci.yml).  For local,
publishable numbers this uses CPython 3.12's ``sys.monitoring`` the same way
coverage.py's sysmon core does: a LINE callback records each (file, line)
once and then returns DISABLE for that location, so steady-state overhead is
near zero.

Executable lines are enumerated by compiling every package file and walking
its code objects' ``co_lines()`` — the same universe coverage.py reports.

Usage:
    python scripts/dev/line_coverage.py -m pytest tests/ -q
    python scripts/dev/line_coverage.py --report  # reprint last run's table
"""

from __future__ import annotations

import json
import os
import sys

PKG = "llama_gguf_inference_tpu"
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
PKG_DIR = os.path.join(REPO, PKG)
OUT = os.path.join(REPO, ".line_coverage.json")
TOOL_ID = 4                      # sys.monitoring tool slot (coverage.py uses 1)

_hits: dict[str, set[int]] = {}


def _on_line(code, line, _pkg=PKG_DIR, _hits=_hits, _sys=sys):
    # defaults bind the objects: module globals are cleared at interpreter
    # shutdown while monitoring can still fire
    fn = code.co_filename
    if fn.startswith(_pkg):
        _hits.setdefault(fn, set()).add(line)
    return _sys.monitoring.DISABLE


def start() -> None:
    mon = sys.monitoring
    mon.use_tool_id(TOOL_ID, "line_coverage")
    mon.register_callback(TOOL_ID, mon.events.LINE, _on_line)
    mon.set_events(TOOL_ID, mon.events.LINE)


def _executable_lines(path: str) -> set[int]:
    with open(path, "rb") as f:
        src = f.read()
    try:
        code = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [code]
    while stack:
        co = stack.pop()
        for _, _, ln in co.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def stop() -> None:
    try:
        sys.monitoring.set_events(TOOL_ID, 0)
        sys.monitoring.free_tool_id(TOOL_ID)
    except Exception:  # noqa: BLE001
        pass


def report(save: bool = True) -> int:
    stop()
    per_module: dict[str, tuple[int, int]] = {}
    for root, _dirs, files in os.walk(PKG_DIR):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, REPO)
            total = _executable_lines(path)
            hit = _hits.get(path, set()) & total
            mod = os.path.dirname(os.path.relpath(path, PKG_DIR)) or "."
            t, h = per_module.get(mod, (0, 0))
            per_module[mod] = (t + len(total), h + len(hit))

    print(f"\n{'module':<28} {'stmts':>7} {'miss':>7} {'cover':>7}")
    print("-" * 52)
    gt = gh = 0
    rows = {}
    for mod in sorted(per_module):
        t, h = per_module[mod]
        gt += t
        gh += h
        pct = 100.0 * h / t if t else 100.0
        rows[mod] = {"stmts": t, "miss": t - h, "pct": round(pct, 1)}
        print(f"{mod:<28} {t:>7} {t - h:>7} {pct:>6.1f}%")
    total_pct = 100.0 * gh / gt if gt else 100.0
    print("-" * 52)
    print(f"{'TOTAL':<28} {gt:>7} {gt - gh:>7} {total_pct:>6.1f}%")
    if save:
        with open(OUT, "w") as f:
            json.dump({"total_pct": round(total_pct, 1), "modules": rows}, f,
                      indent=1)
        print(f"[saved {OUT}]")
    return 0 if total_pct >= 70 else 1


def main() -> None:
    if "--report" in sys.argv:
        data = json.load(open(OUT))
        print(json.dumps(data, indent=1))
        return
    if sys.argv[1] != "-m":
        raise SystemExit("usage: line_coverage.py -m <module> [args...]")
    mod = sys.argv[2]
    sys.argv = sys.argv[2:]
    # runpy(run_name="__main__") swaps this script out of sys.modules;
    # without another reference CPython reclaims the module and CLEARS its
    # globals, so the callback would see PKG_DIR=None and record nothing
    sys.modules["_line_coverage_keepalive"] = sys.modules["__main__"]
    # script mode puts scripts/dev/ at sys.path[0]; tests import the package
    # from the repo root
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    start()
    import runpy
    code = 0
    try:
        runpy.run_module(mod, run_name="__main__")
    except SystemExit as e:
        code = e.code if isinstance(e.code, int) else 0
    gate = report()
    raise SystemExit(code or gate)


if __name__ == "__main__":
    main()
