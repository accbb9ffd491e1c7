#!/usr/bin/env python3
# Python-3 port of the reference qtest script
# ref: data/scripts/input20_script.py — uniq -c over sorted stdin,
# emitting "<run-length>\t<line with tabs replaced by _>".
import sys
import re
line = sys.stdin.readline()
x = 1
while line:
    tem = sys.stdin.readline()
    if line == tem:
        x = x + 1
    else:
        print(str(x).strip() + '\t' + re.sub('\t', '_', line.strip()))
        line = tem
        x = 1
