#!/usr/bin/env python3
# Python-3 port of the reference qtest script
# ref: data/scripts/dumpdata_script.py — ignores stdin, dumps
# 50*5*20022 numbers (1000022 distinct values).
import sys

for i in range(50):
    for j in range(5):
        for k in range(20022):
            print(20000 * i + k)

for line in sys.stdin:
    pass
