#!/bin/bash
# Executes the ORIGINAL reference test suites (/root/reference/tests/*.sh)
# against tpuvf via gst-launch-1.0 / gst-inspect-1.0 shims.
# Usage: scripts/run-reference-suites.sh [suite ...]   (default: all)
set -u
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
export PATH="$SCRIPT_DIR/gst-shim:$PATH"
export TPUVF_PLATFORM="${TPUVF_PLATFORM:-cpu}"   # fast per-invocation startup
REF="${REFERENCE_TESTS:-/root/reference/tests}"
SUITES=("$@")
if [ ${#SUITES[@]} -eq 0 ]; then
  SUITES=(test-convertscale test-videofilter test-compositor test-transform
          test-deinterlace test-overlay test-videosink test-multi-element)
fi
overall=0
for s in "${SUITES[@]}"; do
  echo "=========== reference suite: $s ==========="
  bash "$REF/$s.sh" || overall=1
done
exit $overall
