#!/bin/bash
# Auto-commit parity results as a chain produces them (runs/ is gitignored;
# a session cutoff must not lose a finished table).
#
# Race hardening (round-4 lessons: the green world table sat uncommitted, and
# a mid-write cp could commit truncated JSON): only copy files that VALIDATE
# as JSON, commit with an explicit pathspec so concurrently staged files are
# not swept in, and do one final sweep AFTER seeing ALL_DONE instead of
# exiting in the same iteration.
cd /root/repo || exit 1

sweep() {
  for t in obb segment rtdetr v10 world; do
    src=runs/parity/$t/parity.json
    dst=parity_artifacts/$t.json
    if [ -f "$src" ] && ! cmp -s "$src" "$dst" 2>/dev/null; then
      python -m json.tool "$src" > /dev/null 2>&1 || continue  # quiescent + valid
      cp "$src" "$dst"
      git add "$dst" && git commit -q -m "parity artifact: $t scaled-protocol result" -- "$dst" || true
    fi
  done
}

while true; do
  sweep
  if grep -q ALL_DONE runs/parity_chain.log 2>/dev/null; then
    sleep 2   # let any in-flight final write land
    sweep
    exit 0
  fi
  sleep 30
done
