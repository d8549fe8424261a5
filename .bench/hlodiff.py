"""Structural diff of two saved TPU executables (.hlo from compile().as_text()).

Strips source-location metadata/tables and normalizes E-derived constants so
only genuine structural differences (ops, layouts, memory spaces, fusions,
backend configs) remain. Used for the round-3 valley diagnosis
(PERF.md "The valley, diagnosed").
"""

import difflib
import re
import sys


def clean(path, subs):
    out = []
    for l in open(path):
        ls = l.rstrip("\n")
        if re.match(r'\s*\d+ (\{|")', ls):  # source-location / name tables
            continue
        ls = re.sub(r",?\s*metadata=\{[^}]*\}", "", ls)
        for v, s in subs:
            ls = re.sub(rf"\b{v}\b", s, ls)
        out.append(ls)
    return out


def diff_files(f1, e1, f2, e2):
    a = clean(f1, [(e1 + 1, "EP1"), (e1, "E")])
    b = clean(f2, [(e2 + 1, "EP1"), (e2, "E")])
    d = [
        l
        for l in difflib.unified_diff(a, b, lineterm="", n=0)
        if l[:1] in "+-" and l[:3] not in ("+++", "---")
    ]
    return a, b, d


if __name__ == "__main__":
    f1, e1, f2, e2 = sys.argv[1], int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
    a, b, d = diff_files(f1, e1, f2, e2)
    print(f"{f1} ({len(a)} lines) vs {f2} ({len(b)} lines): {len(d)} differing")
    for l in d:
        print(l[:240])
