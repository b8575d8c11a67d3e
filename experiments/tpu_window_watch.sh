#!/bin/bash
# Outer retry loop for experiments/tpu_window.py: the relay flaps for
# hours, so keep re-probing until the window deadline. tpu_window.py
# exits 3 when the relay is down and is resumable (stamps), so each
# retry is cheap. Run detached:
#   WINDOW_DEADLINE_EPOCH=... setsid nohup bash experiments/tpu_window_watch.sh \
#       > experiments/.tpu_window/watch.log 2>&1 & echo $! > /tmp/tpuwatch.pid
set -u
DEADLINE="${WINDOW_DEADLINE_EPOCH:?set WINDOW_DEADLINE_EPOCH}"
SLEEP="${WATCH_SLEEP_S:-420}"
cd "$(dirname "$0")/.."
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  echo "[watch] $(date +%T) invoking tpu_window.py"
  WINDOW_DEADLINE_EPOCH="$DEADLINE" python experiments/tpu_window.py
  rc=$?
  echo "[watch] $(date +%T) tpu_window rc=$rc"
  if [ "$rc" -eq 0 ]; then
    echo "[watch] window complete"
    exit 0
  fi
  sleep "$SLEEP"
done
echo "[watch] deadline reached"
exit 1
