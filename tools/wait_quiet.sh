#!/bin/bash
# Wait until host steal time and load are low enough for timing runs.
# Usage: tools/wait_quiet.sh [max_wait_seconds]
max=${1:-600}
start=$(date +%s)
while true; do
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 2
  s2=$(awk '/^cpu /{print $9}' /proc/stat)
  steal=$(( (s2 - s1) / 2 ))   # jiffies/sec of steal across all cpus
  load1=$(awk '{print int($1*100)}' /proc/loadavg)
  now=$(date +%s)
  if [ "$steal" -lt 20 ] && [ "$load1" -lt 150 ]; then
    echo "quiet: steal=${steal}j/s load=$(awk '{print $1}' /proc/loadavg)"
    exit 0
  fi
  if [ $((now - start)) -gt "$max" ]; then
    echo "timeout: steal=${steal}j/s load=$(awk '{print $1}' /proc/loadavg)"
    exit 1
  fi
  sleep 5
done
