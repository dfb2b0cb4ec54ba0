#!/bin/bash
# Round-end artifact staging — the recurrence-stopper for the lapse
# flagged in BOTH round-10 and round-11 verdicts (BENCH_r{N}.json /
# CORRECTNESS_r{N}.json left untracked, BENCH_FULL.json / LEAKCHECK.json
# modified-unstaged at round end). Run before the round closes; it
# stages every round artifact the judge reads and shows what changed.
set -euo pipefail
cd "$(dirname "$0")/.."
# one git-add per pathspec: a single add with ALL specs stages NOTHING
# when any one spec matches no file (git errors on the unmatched spec
# and the || true swallowed it — the script silently did nothing when
# e.g. COPYCHECK.json was absent)
for spec in 'BENCH_*.json' 'CORRECTNESS_*.json' 'MATCHECK*.json' \
    'SHUFFLE_*.json' 'STREAMBENCH*.json' 'BASELINE*.json' \
    'COPYCHECK.json' 'LEAKCHECK.json' 'IVF2_*.json' \
    'PLANS.md' 'SCALE.md' 'SURVEY.md' 'README.md' 'FIXTURES.md'; do
  git add -A -- "$spec" 2>/dev/null || true
done
echo "== staged artifact changes =="
git status --short -- '*.json' '*.md'
UNTRACKED=$(git status --porcelain | grep -c '^??' || true)
if [ "$UNTRACKED" != "0" ]; then
  echo "WARNING: $UNTRACKED untracked path(s) remain:"
  git status --porcelain | grep '^??'
fi
