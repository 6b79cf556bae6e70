#!/bin/bash
# Run the staged-config ladder (BASELINE.json configs 1-5) on the real
# chip, one subprocess per config so an OOM/timeout in one config is an
# honest JSON record instead of sinking the whole ladder.
# Output: one JSON line per config on stdout (collect into STAGED_rN.json).
set -u
cd "$(dirname "$0")/.."

run_cfg() {
  local label="$1"; shift
  local tmo="$1"; shift
  local out
  out=$(timeout "$tmo" python benchmarks/staged_configs.py "$@" 2>/tmp/staged_err_$label.log)
  local rc=$?
  if [ $rc -eq 0 ] && [ -n "$out" ]; then
    echo "$out"
  else
    local reason="exit_code_$rc"
    [ $rc -eq 124 ] && reason="timeout_${tmo}s"
    grep -qiE 'RESOURCE_EXHAUSTED|out of memory|OOM' /tmp/staged_err_$label.log && reason="oom"
    # python handles all JSON escaping (backslashes/control chars in
    # tracebacks would make hand-quoted records invalid JSON lines)
    CFG_LABEL="$label" CFG_REASON="$reason" python - <<'PYEOF'
import json, os, sys
tail = open(f"/tmp/staged_err_{os.environ['CFG_LABEL']}.log", "rb").read()[-300:]
print(json.dumps({"config": os.environ["CFG_LABEL"], "failed": True,
                  "reason": os.environ["CFG_REASON"],
                  "stderr_tail": tail.decode("utf-8", "replace")}))
PYEOF
  fi
}

run_cfg 1 600 --configs 1
run_cfg 2 600 --configs 2
run_cfg 3 1200 --configs 3
run_cfg 4 900 --configs 4
run_cfg 5 900 --configs 5
run_cfg 5full 1500 --configs 5 --full
