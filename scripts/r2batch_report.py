"""Summarize a tpu_batch_r2.sh run: one table from the per-run logs.

Reads /tmp/r2batch/*.log (or a directory given as argv[1], e.g. the
results/tpu_batch_r2 mirror), extracts the bench JSON line or the probe
timing line from each, and prints a ranked table so the gate-flip decision
is one glance: which env-gated kernels beat the 83.3 tok/s default, what
the probes say about the weight-stream plateau.
"""

import json
import re
import sys
from pathlib import Path

d = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r2batch")
rows = []
for f in sorted(d.glob("*.log")):
    if f.name in ("summary.log", "ping.log"):
        continue
    text = f.read_text(errors="replace")
    metric = None
    # bench.py prints one JSON line
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                j = json.loads(line)
                metric = (
                    f"{j['value']:8.1f} {j['unit']}"
                    f"  (vs_baseline {j.get('vs_baseline', '?')})"
                )
            except (json.JSONDecodeError, KeyError):
                pass
    if metric is None:
        # probe scripts print "<variant> ...: X ms/token (... GB/s effective)"
        m = re.findall(
            r"^(\S.*?:\s*[\d.]+ ms/token.*GB/s effective\))",
            text,
            re.MULTILINE,
        )
        if m:
            metric = m[-1]
    if metric is None:
        m = re.findall(r"(parity ok.*|PARITY.*|OK.*)", text)
        metric = m[-1] if m else "?? (no metric line — inspect log)"
    # wedge/crash markers
    for bad in ("RESOURCE_EXHAUSTED", "Traceback", "kernel fault"):
        if bad in text:
            metric += f"  [!{bad}]"
            break
    rows.append((f.stem, metric))

width = max((len(n) for n, _ in rows), default=10)
for name, metric in rows:
    print(f"{name:<{width}}  {metric}")
if not rows:
    print(f"no logs under {d}")
