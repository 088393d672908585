#!/usr/bin/env python
"""Verify every reference citation in the repo resolves.

Scans dedup_ray/ and SURVEY.md for ``<file>.<ext>:<line>[-<line>]``
patterns whose file exists in the reference tree, and flags:

- citations naming a file that does NOT exist in /root/reference
- citations whose line range exceeds the cited file's length

Repo-internal citations (files under dedup_ray/) are checked against the
repo tree the same way.  Exit code 1 on any dangling citation.
"""
from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

CITE = re.compile(r"``?([\w./-]+\.(?:R|py|org|md|json))[:](\d+)(?:-(\d+))?")

# file stems that are repo modules, not reference files
_REPO_FILES = set()
for root, _dirs, files in os.walk(os.path.join(REPO, "dedup_ray")):
    for f in files:
        if f.endswith(".py"):
            _REPO_FILES.add(os.path.relpath(os.path.join(root, f), REPO))
            _REPO_FILES.add(f)

_ref_files = {f for f in os.listdir(REF) if os.path.isfile(os.path.join(REF, f))}
_line_cache: dict[str, int] = {}


def _nlines(path: str) -> int:
    if path not in _line_cache:
        with open(path, "rb") as fh:
            _line_cache[path] = sum(1 for _ in fh)
    return _line_cache[path]


def check_file(path: str) -> list[str]:
    bad = []
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    for m in CITE.finditer(text):
        fname, lo, hi = m.group(1), int(m.group(2)), m.group(3)
        hi = int(hi) if hi else lo
        base = os.path.basename(fname)
        where = f"{os.path.relpath(path, REPO)}: cites {fname}:{lo}" + (
            f"-{hi}" if hi != lo else ""
        )
        if base in _ref_files:
            n = _nlines(os.path.join(REF, base))
            if hi > n:
                bad.append(f"{where} — {base} has only {n} lines")
        elif fname in _REPO_FILES or base in _REPO_FILES:
            rel = fname if fname in _REPO_FILES else None
            if rel:
                n = _nlines(os.path.join(REPO, rel))
                if hi > n:
                    bad.append(f"{where} — repo file has only {n} lines")
            # bare module-name repo cites: existence is enough (lines drift)
        elif base in {"SURVEY.md", "BASELINE.md", "README.md", "scores.org",
                      "BASELINE.json"}:
            continue  # repo docs cited by name
        else:
            bad.append(f"{where} — no such file in reference or repo")
    return bad


def main() -> int:
    targets = []
    for root, dirs, files in os.walk(os.path.join(REPO, "dedup_ray")):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        targets += [os.path.join(root, f) for f in files if f.endswith(".py")]
    for doc in ("SURVEY.md",):
        p = os.path.join(REPO, doc)
        if os.path.exists(p):
            targets.append(p)
    bad = []
    for t in targets:
        bad += check_file(t)
    for b in bad:
        print("DANGLING:", b)
    print(f"{len(targets)} files scanned, {len(bad)} dangling citations")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
