#!/bin/bash
# Round-5 cache evidence: bench.py twice, cold then warm (VERDICT r4 ask #3).
cd /root/repo
echo "=== COLD ==="
python bench.py 2>&1
echo "=== WARM ==="
python bench.py 2>&1
echo "=== DONE ==="
