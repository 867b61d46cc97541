#!/usr/bin/env bash
# Round-4 lesson drill: a kill -9 at ANY minute of a bench run must
# still leave a complete, parseable final-format JSON line on stdout
# (the driver parses stdout's last JSON line; round 4 lost BOTH
# artifacts to an rc-124 kill mid-pass-1 before streaming emission
# existed). This script starts graft.Bench, hard-kills the JVM after
# a fixed delay, and asserts the captured stdout still parses.
#
# Usage: tools/kill_bench_test.sh [delay_seconds] [sfdir]
set -u
DELAY="${1:-30}"
SFDIR="${2:-/root/testdata/sf0.001}"
OUT=$(mktemp /tmp/killbench.XXXX.out)

# launch through sbt in its own process group so the kill takes the
# whole JVM tree, exactly like the driver's session reaper
setsid env SPARK_GRAFT_SF_DIR="$SFDIR" \
  sbt -batch "runMain graft.Bench" >"$OUT" 2>/dev/null &
PG=$!
sleep "$DELAY"
kill -9 -- "-$PG" 2>/dev/null
wait "$PG" 2>/dev/null

python3 - "$OUT" <<'EOF'
import json, sys
lines = [l for l in open(sys.argv[1], encoding="utf-8", errors="replace")
         if l.startswith("{")]
if not lines:
    print("KILL-TEST FAIL: no JSON line on stdout (kill landed before "
          "the first query finished — rerun with a longer delay)")
    sys.exit(1)
j = json.loads(lines[-1])  # driver semantics: last JSON line wins
assert j["metric"] == "total" and "queries" in j and "failed" in j, j
print(f"KILL-TEST OK: last line parses; covers {j['n_queries']} queries, "
      f"partial={j.get('partial')}, elapsed={j['elapsed_wall']}s")
EOF
STATUS=$?
rm -f "$OUT"
exit $STATUS
