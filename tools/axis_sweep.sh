#!/usr/bin/env bash
# Full-registry closing axis sweeps: partitions7 + alternate seeds 7/13.
set -euo pipefail
cd "$(dirname "$0")/.."
python - <<'PY'
import sys
sys.path.insert(0, ".")
import __spark_entry__ as e
names = sorted(e.queries())
h = len(names) // 2
open("/tmp/ax_q1.txt", "w").write("\n".join(names[:h]))
open("/tmp/ax_q2.txt", "w").write("\n".join(names[h:]))
print(f"{len(names)} queries -> two halves")
PY
echo "== partitions7 full sweep =="
SPARK_GRAFT_CPUS=7 python tools/check.py /root/testdata/sf0.01 $(tr '\n' ' ' < /tmp/ax_q1.txt)
SPARK_GRAFT_CPUS=7 python tools/check.py /root/testdata/sf0.01 $(tr '\n' ' ' < /tmp/ax_q2.txt)
for SEED in 7 13; do
  echo "== seed $SEED full sweep =="
  python tools/check.py "/tmp/testdata_seed$SEED/sf0.01" $(tr '\n' ' ' < /tmp/ax_q1.txt)
  python tools/check.py "/tmp/testdata_seed$SEED/sf0.01" $(tr '\n' ' ' < /tmp/ax_q2.txt)
done
echo "AXIS SWEEPS ALL GREEN"
