#!/usr/bin/env python3
# Replays Hive's schema-less TRANSFORM output contract
# (ql/exec/ScriptOperator + TextRecordReader): the line splits at the
# FIRST tab only — key = first field, value = rest of line, tabs
# preserved. Downstream the harness declares the output delimited by
# \x01, so this filter rewrites just the first tab of each line.
import sys

for line in sys.stdin:
    sys.stdout.write(line.replace("\t", "\x01", 1))
