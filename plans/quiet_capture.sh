#!/bin/bash
# Steal-gated bench capture: probe host steal with a short CPU burn,
# run plans/steal_bench.py only in a quiet window, stop at the first
# capture with steal < 2% of busy (bench-steal protocol, round 14).
#
# Usage: bash plans/quiet_capture.sh <out-prefix> [max_tries] [cpus]
# Writes <out-prefix>_tryN.json per attempt; prints the kept file.
set -u
PREFIX="$1"; MAX="${2:-12}"; CPUS="${3:-}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

probe_steal() {  # 5s burn on 8 cores, echo steal% of busy
  python3 - <<'EOF'
import multiprocessing as mp, time

def burn(stop):
    x = 0
    while time.time() < stop:
        x += 1

def ticks():
    with open("/proc/stat") as f:
        return [int(v) for v in f.readline().split()[1:]]

b = ticks()
stop = time.time() + 5
ps = [mp.Process(target=burn, args=(stop,)) for _ in range(8)]
[p.start() for p in ps]
[p.join() for p in ps]
a = ticks()
d = [y - x for x, y in zip(b, a)]
busy = sum(d) - d[3] - d[4]
steal = d[7] if len(d) > 7 else 0
print(round(100.0 * steal / busy, 2) if busy else 0.0)
EOF
}

for i in $(seq 1 "$MAX"); do
  s=$(probe_steal)
  echo "try $i: probe steal=${s}%" >&2
  if python3 -c "import sys; sys.exit(0 if float('$s') < 3.0 else 1)"; then
    out="${PREFIX}_try${i}.json"
    args=(--out "$out")
    [ -n "$CPUS" ] && args+=(--cpus "$CPUS")
    python3 "$REPO/plans/steal_bench.py" "${args[@]}" >/dev/null 2>"${out}.log"
    got=$(python3 -c "import json; print(json.load(open('$out'))['steal_pct_busy'])" 2>/dev/null || echo 999)
    echo "try $i: bench steal=${got}%" >&2
    if python3 -c "import sys; sys.exit(0 if float('$got') < 2.0 else 1)"; then
      echo "$out"
      exit 0
    fi
  fi
  sleep 45
done
echo "no quiet window found in $MAX tries" >&2
exit 1
