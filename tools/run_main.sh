#!/bin/bash
# Run a graft main class directly against the compiled classes + Spark jars
# (bypasses sbt startup; used for bench/verify loops).
# Usage: tools/run_main.sh <mainClass> [args...]
#
# Quiet-rig protocol (SCALING.md "rig contention"): the container's tmux
# server busy-spins ~94% of a core whenever any session exists, and killed
# sbt shells leave orphan JVMs that contend for cores — both measurably
# contaminate bench timings. For graft.Bench (or GRAFT_QUIET=1) this script
# kills the tmux server and any straggler sbt JVMs BEFORE timing, so every
# bench reading — ours or the driver's — runs on a quiet rig by default.
# Opt out with GRAFT_QUIET=0 (e.g. to keep a live sbt shell during dev).
#
# GRAFT_CLASSES overrides the classes dir (A/B runs against a snapshot).
set -e
cd "$(dirname "$0")/.."
MAIN="$1"; shift

QUIET="${GRAFT_QUIET:-}"
if [ -z "$QUIET" ] && [ "$MAIN" = "graft.Bench" ]; then QUIET=1; fi
if [ "$QUIET" = "1" ]; then
  # never kill the server we are running INSIDE of — that SIGHUPs this
  # very script before the bench starts; warn and leave it to the caller
  if [ -n "$TMUX" ]; then
    echo "[run_main] inside tmux: NOT killing the server; bench timings will include its busy-spin" >&2
  else
    tmux kill-server 2>/dev/null || true
  fi
  # straggler sbt launchers/servers (jps tags them "sbt-launch.jar" / "Main")
  for pid in $(jps -l 2>/dev/null | awk '/sbt-launch|xsbt|sbt\.internal/ {print $1}'); do
    kill "$pid" 2>/dev/null || true
  done
  sleep 1
fi

ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "${GRAFT_CLASSES:-target/scala-2.13/classes}:src/main/resources:/opt/spark/jars/*" \
  "$MAIN" "$@"
