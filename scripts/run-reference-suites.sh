#!/bin/bash
# Executes the ORIGINAL reference test suites (/root/reference/tests/*.sh)
# against tpuvf via gst-launch-1.0 / gst-inspect-1.0 shims.
# Usage: scripts/run-reference-suites.sh [suite ...]   (default: all)
set -u
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
export PATH="$SCRIPT_DIR/gst-shim:$PATH"
export TPUVF_PLATFORM="${TPUVF_PLATFORM:-cpu}"   # fast per-invocation startup
REF_SRC="${REFERENCE_TESTS:-/root/reference/tests}"
# Stage a copy: several suites require ../build/gstvfmetal.dylib to exist
# before running anything (tests/test-videofilter.sh:20-ish); satisfy the
# existence check with a placeholder (the shims provide the elements).
STAGE="$(mktemp -d /tmp/tpuvf-refsuites.XXXXXX)"
mkdir -p "$STAGE/tests" "$STAGE/build"
cp "$REF_SRC"/*.sh "$STAGE/tests/"
touch "$STAGE/build/gstvfmetal.dylib"
REF="$STAGE/tests"
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
