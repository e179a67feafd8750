#!/usr/bin/env bash
# Test orchestrator — the tests/test-all.sh analog (reference runs 8 suites
# sequentially and aggregates pass/fail; here each suite is a pytest module).
set -u
cd "$(dirname "$0")/.."

SUITES=(
  "convertscale:tests/test_pipeline_convertscale.py tests/test_kernels_convert.py"
  "videofilter:tests/test_videofilter.py"
  "compositor:tests/test_compositor.py"
  "transform+overlay:tests/test_transform_overlay.py"
  "deinterlace:tests/test_deinterlace.py"
  "videosink+codecs:tests/test_videosink_codecs.py"
  "multi-element:tests/test_multi_element.py"
  "parallel:tests/test_parallel.py"
  "native:tests/test_native.py"
  "core:tests/test_core.py tests/test_schemas.py"
  "sources+observability:tests/test_sources_observability.py"
  "pallas:tests/test_pallas_kernels.py"
  "split-links:tests/test_split_links.py"
  "cross-validation:tests/test_cross_validation.py"
  "sp-sharding:tests/test_sp_sharding.py"
  "tee:tests/test_tee.py"
  "caps-ranges:tests/test_caps_ranges.py"
  "overlay-fold:tests/test_overlay_fold.py"
  "fuzz:tests/test_fuzz_pipelines.py"
  "fuzz-sp:tests/test_fuzz_sp.py tests/test_fuzz_sp_compositor.py"
)

pass=0; fail=0; failed=()
for entry in "${SUITES[@]}"; do
  name="${entry%%:*}"; files="${entry#*:}"
  echo "=== suite: $name ==="
  if python -m pytest $files -q; then
    pass=$((pass+1))
  else
    fail=$((fail+1)); failed+=("$name")
  fi
done

echo
echo "suites passed: $pass, failed: $fail"
if [ $fail -gt 0 ]; then
  echo "failed suites: ${failed[*]}"
  exit 1
fi
