#!/bin/bash
# Auto-commit parity results as the round-4 chain produces them (runs/ is
# gitignored; a session cutoff must not lose a finished table).
cd /root/repo
while true; do
  for t in obb segment rtdetr v10 world; do
    src=runs/parity/$t/parity.json
    dst=parity_artifacts/$t.json
    if [ -f "$src" ] && ! cmp -s "$src" "$dst" 2>/dev/null; then
      cp "$src" "$dst"
      git add "$dst" && git commit -q -m "parity artifact: $t scaled-protocol result" || true
    fi
  done
  grep -q ALL_DONE runs/parity_chain.log 2>/dev/null && exit 0
  sleep 30
done
