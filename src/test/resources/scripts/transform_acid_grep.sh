#!/bin/bash
# Audited port of the reference qtest TRANSFORM script
# ql/src/test/scripts/transform_acid_grep.sh: print any hive.txn
# validity env vars the script operator injected, then a constant row.
env | grep hive.txn.valid.txns
echo a
exit 0
