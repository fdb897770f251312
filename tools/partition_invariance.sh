#!/usr/bin/env bash
# Empirical partitioning-invariance proof: re-run the graded registry
# under 7 shuffle partitions (vs the default 32). Different partition
# boundaries, same oracle hashes — backs the README's determinism
# claim. Exits nonzero on any mismatch.
#
# Default: the FULL registry, split in halves (one ~190-query sweep in
# a single JVM exceeds a 10-minute shell window on a noisy host). Pass
# query names to restrict the sweep to a subset instead.
set -euo pipefail
cd "$(dirname "$0")/.."

if [ "$#" -gt 0 ]; then
  SPARK_GRAFT_CPUS=7 exec python tools/check.py /root/testdata/sf0.01 "$@"
fi

python - <<'PY'
import sys
sys.path.insert(0, ".")
import __spark_entry__ as e
names = sorted(e.queries())
h = len(names) // 2
open("/tmp/pi_q1.txt", "w").write("\n".join(names[:h]))
open("/tmp/pi_q2.txt", "w").write("\n".join(names[h:]))
print(f"{len(names)} queries -> two halves at 7 partitions")
PY
SPARK_GRAFT_CPUS=7 python tools/check.py /root/testdata/sf0.01 \
  $(tr '\n' ' ' < /tmp/pi_q1.txt)
SPARK_GRAFT_CPUS=7 python tools/check.py /root/testdata/sf0.01 \
  $(tr '\n' ' ' < /tmp/pi_q2.txt)
