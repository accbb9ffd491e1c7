#!/usr/bin/env python3
# Audited port of the reference qtest helper
# itests/util/src/main/java/org/apache/hadoop/hive/scripts/extracturl.java:
# emit `<url>\t1` for every `<a href="http://<w>.html">link</a>` match
# (case-insensitive), one line per match, reading stdin line by line.
import re
import sys

pattern = re.compile(r'<a href="http://([\w\d]+\.html)">link</a>', re.I)

for line in sys.stdin:
    for m in pattern.finditer(line):
        sys.stdout.write(m.group(1) + "\t1\n")
