#!/usr/bin/env bash
# Standing tri-SF oracle gate (§7.5.20 → r19 standing gate).
#
# The driver's correctness gate runs at sf0.01 only; r18's sweep proved
# that is necessary but NOT sufficient — 13 boundary rows hid behind 17
# rounds of sf0.01-only green. This script runs the full Verify + DuckDB
# compare at the OTHER two scale factors (sf0.001, sf0.1) and fails on
# any mismatch. Run it at HEAD every round; record the result in
# SCALE.md.
#
# Usage: tools/trisf_gate.sh  (from /root/repo; ~10 min total)
set -euo pipefail
cd "$(dirname "$0")/.."
fail=0
for sf in 0.001 0.1; do
  out="target/verify_sf${sf}_gate"
  echo "== tri-SF gate: sf$sf =="
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out" \
    > "/tmp/trisf_sf$sf.log" 2>&1 || true
  grep "\[verify\]" "/tmp/trisf_sf$sf.log" || true
  if ! python3 tools/check.py "/root/testdata/sf$sf" "$out" \
      | tee "/tmp/trisf_check_sf$sf.log" | tail -1 \
      | grep -q ", 0 fail"; then
    grep "^FAIL" "/tmp/trisf_check_sf$sf.log" | head -20
    fail=1
  fi
done
if [ "$fail" -ne 0 ]; then
  echo "TRI-SF GATE: FAIL"
  exit 1
fi
echo "TRI-SF GATE: PASS (435/435 at sf0.001 and sf0.1)"
