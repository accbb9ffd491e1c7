#!/usr/bin/env python3
"""Diff two GoldenSweep reports: status flips and assert-count drops.

Usage: sweep_diff.py OLD.tsv NEW.tsv
"""
import sys


def load(p):
    m = {}
    for line in open(p):
        parts = line.rstrip("\n").split("\t")
        if len(parts) >= 3:
            m[parts[0]] = (parts[1], int(parts[2]) if parts[2].isdigit()
                           else 0)
    return m


old, new = load(sys.argv[1]), load(sys.argv[2])
reg = [(f, old[f], new.get(f, ("missing", 0)))
       for f in old if old[f][0] == "pass" and
       new.get(f, ("missing", 0))[0] != "pass"]
won = [(f, old.get(f, ("missing", 0)), new[f])
       for f in new if new[f][0] == "pass" and
       old.get(f, ("missing", 0))[0] != "pass"]
drops = [(f, old[f][1], new[f][1]) for f in old
         if f in new and old[f][0] == "pass" and new[f][0] == "pass" and
         new[f][1] < old[f][1]]
print(f"regressions (pass -> not): {len(reg)}")
for f, o, n in sorted(reg):
    print(f"  {f}: {o} -> {n}")
print(f"wins (not -> pass): {len(won)}")
for f, o, n in sorted(won):
    print(f"  {f}: {o} -> {n}")
print(f"assert-count drops: {len(drops)}")
for f, o, n in sorted(drops):
    print(f"  {f}: {o} -> {n}")
