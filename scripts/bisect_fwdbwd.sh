#!/bin/bash
# Same-session A/B of the small fwd+bwd config across commits (VERDICT r4
# item 2): one git worktree per sha, shared compile cache, one subprocess
# bench run each. Usage: scripts/bisect_fwdbwd.sh <sha> [<sha> ...]
set -u
for sha in "$@"; do
  wt=/tmp/ws_$sha
  git -C /root/repo worktree add -f "$wt" "$sha" >/dev/null 2>&1 || true
  ln -sfn /root/repo/.jax_cache "$wt/.jax_cache"
  echo "=== $sha $(git -C /root/repo log -1 --format=%s $sha | cut -c1-60)"
  (cd "$wt" && timeout 2400 python bench.py --config example-fwd+bwd 2>/dev/null)
done
