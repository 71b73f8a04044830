#!/usr/bin/env bash
# Round-close gate: the closing commit must include the artifact this
# script writes, produced AFTER the last engine/oracle edit. It fails
# (non-zero) unless the full suite is green AND the DuckDB oracle
# compare has zero fails — the mechanical version of "never advance
# round markers over a red gate" (rounds 6-8 all did).
#
# Usage: scripts/close_round.sh <round-number> [sf-dir]
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: close_round.sh <round-number> [sf-dir]}"
SF="${2:-/root/testdata/sf0.01}"
OUT="/tmp/close_round_verify"
ART="CLOSEOUT_r${ROUND}.md"

echo "[close] sbt test"
sbt -batch test 2>&1 | tail -4 | tee /tmp/close_round_test.txt
grep -q "All tests passed." /tmp/close_round_test.txt

echo "[close] graft.Verify -> ${OUT}"
sbt -batch "runMain graft.Verify ${SF} ${OUT}" >/dev/null 2>&1

echo "[close] DuckDB oracle compare"
# capture the exit status explicitly: a compare that CRASHES (missing
# duckdb, absent oracle_sql.json) must read as a red gate, not as
# "no FAIL lines found"
COMPARE_RC=0
python3 scripts/compare_oracle.py "${SF}" "${OUT}" \
  > /tmp/close_round_compare.txt 2>&1 || COMPARE_RC=$?
tail -2 /tmp/close_round_compare.txt
if grep -q "^FAIL" /tmp/close_round_compare.txt; then
  echo "[close] RED GATE — do not close the round:"
  grep "^FAIL" /tmp/close_round_compare.txt
  exit 1
fi
# the compare must have actually completed: its summary line is the
# proof of execution, AND the exit code must agree (a crash after the
# summary flushed must still read red)
if [ "${COMPARE_RC}" -ne 0 ] || ! tail -1 /tmp/close_round_compare.txt \
    | grep -qE "^[0-9]+ pass, 0 fail$"; then
  echo "[close] RED GATE — compare did not complete cleanly" \
    "(rc=${COMPARE_RC}):"
  tail -5 /tmp/close_round_compare.txt
  exit 1
fi

# Bench-certification gate (round 19, verdict "What's wrong" #1): the
# round's committed bench artifact must be a CERTIFIED capture —
# r18's driver-visible BENCH json self-reported noise_ok:false (+15%
# vs the quiet-band capture sitting in bench_evidence/) and anyone
# reading only it saw an inflated number. A close now requires a
# bench_out.json that is complete, quiet-band certified (noise_ok),
# and repeatability-certified (band_ok — two full passes within 5%).
echo "[close] bench certification gate"
BENCH_JSON="${BENCH_JSON:-bench_out.json}"
if [ ! -f "${BENCH_JSON}" ]; then
  echo "[close] RED GATE — no ${BENCH_JSON}: run graft.Bench on a"
  echo "        quiet host before closing (SPARK_GRAFT_BENCH_OUT to"
  echo "        point elsewhere, BENCH_JSON=path to override here)."
  exit 1
fi
BENCH_SUMMARY=$(python3 - "${BENCH_JSON}" <<'PYEOF'
import json, sys
d = json.load(open(sys.argv[1]))
ok = bool(d.get("complete")) and bool(d.get("noise_ok")) \
    and bool(d.get("band_ok"))
print("OK" if ok else "RED", d.get("value"),
      d.get("noise_ok"), d.get("band_ok"),
      d.get("min_full_pass_steal"), d.get("n_measured"))
PYEOF
)
echo "[close] bench: ${BENCH_SUMMARY}"
case "${BENCH_SUMMARY}" in
  OK\ *) : ;;
  *)
    echo "[close] RED GATE — ${BENCH_JSON} is not a certified capture"
    echo "        (need complete:true, noise_ok:true, band_ok:true);"
    echo "        re-run graft.Bench in a quiet window."
    exit 1 ;;
esac

TESTS=$(grep -o "Tests: succeeded [0-9]*" /tmp/close_round_test.txt)
PASS=$(tail -1 /tmp/close_round_compare.txt)
ROWS=$(grep -c "^rows" /tmp/close_round_compare.txt || true)
# Orphan-function guard (the round-10 failure class): every public
# function added since the previous round-close must be referenced
# somewhere OUTSIDE its defining file — a query, a test, or another
# operator. A def that only its own file mentions shipped with zero
# proof and fails the close.
echo "[close] orphan-function guard"
BASE=$(git log --oneline | grep -m1 -E "round [0-9]+: end-of-round|Round [0-9]+ close" | cut -d' ' -f1 || true)
ORPHANS=""
if [ -n "${BASE}" ]; then
  # member-level public defs only (2-4 space indent; local defs sit
  # deeper or get cleared by the cross-file reference check below);
  # >3-char names to skip loop-helper noise
  # `|| true`: an empty diff (no new defs since the base commit) makes
  # grep exit 1, which under set -e/pipefail would kill the script
  # BEFORE the closeout write — silently, with rc masked by callers
  # that pipe the output (bit this round: CLOSEOUT stayed stale)
  NEWDEFS=$(git diff "${BASE}"..HEAD -- 'src/main/scala/*.scala' \
    | grep -E '^\+ {2,4}def [a-zA-Z][a-zA-Z0-9_]{3,}' \
    | grep -vE 'private|override' \
    | sed -E 's/^\+ +def ([a-zA-Z0-9_]+).*/\1/' | sort -u || true)
  for fn in ${NEWDEFS}; do
    # uses = occurrences in files OTHER than the one holding the def
    # (the documented rule; counting same-file lines let a def with a
    # local helper call slip the guard — advisor round-11 finding)
    DEFFILES=$(grep -rl --include='*.scala' -E "def ${fn}\b" src/ \
      | tr '\n' ' ' || true)
    USES=0
    while IFS= read -r f; do
      [ -z "${f}" ] && continue
      case " ${DEFFILES} " in *" ${f} "*) continue ;; esac
      N=$(grep -cw "${fn}" "${f}" || true)
      USES=$((USES + N))
    done <<EOF
$(grep -rlw --include='*.scala' "${fn}" src/ || true)
EOF
    if [ "${USES}" -eq 0 ]; then
      ORPHANS="${ORPHANS} ${fn}"
    fi
  done
fi
if [ -n "${ORPHANS}" ]; then
  echo "[close] RED GATE — public functions added this round with no"
  echo "        reference outside their defining file:${ORPHANS}"
  echo "        wire each into a query/spec or make it private."
  exit 1
fi

{
  echo "# CLOSEOUT round ${ROUND}"
  echo
  echo "Produced by scripts/close_round.sh AFTER the last engine/oracle"
  echo "edit of the round; a red gate makes this script exit non-zero,"
  echo "so this file existing in the closing commit certifies:"
  echo
  echo "- suite: ${TESTS}, 0 failed"
  echo "- oracle compare (${SF}): ${PASS}"
  echo "- rows-only (no-oracle sketch/hash) queries: ${ROWS}"
  echo "- bench capture (${BENCH_JSON}): ${BENCH_SUMMARY}"
  echo "- verify dump: ${OUT} (not committed)"
} > "${ART}"
echo "[close] wrote ${ART}"
