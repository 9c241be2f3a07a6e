#!/bin/bash
# Block until the axon remote-compile relay (127.0.0.1:8103) accepts TCP.
# Usage: tpu_gate.sh [max_wait_seconds]   (default 4h; exits 1 on timeout)
deadline=$(( $(date +%s) + ${1:-14400} ))
while true; do
  if python3 - <<'EOF'
import socket, sys
try:
    socket.create_connection(("127.0.0.1", 8103), 2).close()
except OSError:
    sys.exit(1)
EOF
  then echo "tunnel up ($(date -u +%H:%M:%S))"; exit 0; fi
  if [ "$(date +%s)" -gt "$deadline" ]; then echo "tunnel wait timed out"; exit 1; fi
  sleep 60
done
