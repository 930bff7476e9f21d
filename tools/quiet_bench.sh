#!/bin/bash
# Wait until the shared host is quiet (1-min loadavg below threshold for
# two consecutive polls), then run the N-vs-4N scaling bench. Shared-host
# discipline: measuring under co-tenant load measures the neighbors, not
# the engine.
THRESH="${QUIET_THRESH:-3.0}"
POLL="${QUIET_POLL:-60}"
MAX_WAIT="${QUIET_MAX_WAIT:-7200}"
waited=0
quiet_streak=0
while [ "$waited" -lt "$MAX_WAIT" ]; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if $load < $THRESH else 0)")
  if [ "$ok" = "1" ]; then
    quiet_streak=$((quiet_streak+1))
    if [ "$quiet_streak" -ge 2 ]; then
      echo "host quiet (load $load), starting scaling bench" >&2
      exec python "$(dirname "$0")/scaling_bench.py"
    fi
  else
    quiet_streak=0
  fi
  sleep "$POLL"
  waited=$((waited+POLL))
done
echo "host never went quiet below $THRESH in ${MAX_WAIT}s; running anyway" >&2
exec python "$(dirname "$0")/scaling_bench.py"
