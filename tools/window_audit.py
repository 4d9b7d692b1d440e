#!/usr/bin/env python
"""Driver-window rotation audit.

The driver records the FIRST 50 ``queries()`` entries each round. This
tool reads every CORRECTNESS_r*.json and reports, for the current
registry order:

  - window composition (the first 50 names) and their best recorded
    driver status across all rounds;
  - oracled pipelines that have NEVER been driver hash-green (the
    rotation backlog the next round's window should draw from);
  - pipelines never recorded by the driver at all.

Run from the repo root: ``python tools/window_audit.py``.
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import sys


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)  # resolve pdf_parser_ray from any cwd
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(root, "__ray_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    names = list(entry.queries().keys())
    oracled = set(entry.oracle_sql().keys())

    green: set[str] = set()
    recorded: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r0*.json"))):
        for k, v in json.load(open(path)).items():
            recorded.add(k)
            if v.get("hash_match"):
                green.add(k)

    window = names[:50]
    print(f"registry: {len(names)}  oracled: {len(oracled)}  "
          f"driver-recorded: {len(recorded)}  driver-green: {len(green)}")
    print("\nwindow (first 50):")
    for i, n in enumerate(window, 1):
        status = ("green" if n in green
                  else "recorded" if n in recorded else "NEW")
        o = "oracled" if n in oracled else "rows-only"
        print(f"  {i:2d}. {n:40s} {o:9s} {status}")
    backlog = [n for n in names if n in oracled and n not in green]
    never = [n for n in names if n not in recorded]
    print(f"\noracled, never driver-green: {len(backlog)}")
    print(f"never driver-recorded:        {len(never)}")
    in_window = [n for n in window if n in backlog]
    print(f"window entries drawing down the backlog: {len(in_window)}")


if __name__ == "__main__":
    main()
