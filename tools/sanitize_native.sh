#!/bin/sh
# ASan+UBSan run of the native host tier (native/vsearch_tpu_native.c),
# modeled on the reference's sanitizer CI job
# (/root/reference/.github/workflows/build-and-test.yml:48-74, which builds
# libvsearch.a with -fsanitize=address,undefined and runs the API examples
# under halt_on_error=1).
#
# Builds an instrumented .so, then runs the parity test suite against it
# with libasan preloaded into the (uninstrumented) python interpreter.
# Leak checking is off: the interpreter and JAX hold allocations for the
# process lifetime by design; ASan still catches overflows/UAF/UB in our C.
#
# Usage: sh tools/sanitize_native.sh [pytest args...]
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SRC="$REPO/native/vsearch_tpu_native.c"
SO="$REPO/native/libvsearch_tpu_native_asan.so"

cc -O1 -g -march=native -fopenmp -shared -fPIC \
   -fsanitize=address,undefined -fno-sanitize-recover=all \
   "$SRC" -o "$SO"
echo "built $SO"

LIBASAN="$(cc -print-file-name=libasan.so)"
LIBUBSAN="$(cc -print-file-name=libubsan.so)"

cd "$REPO"
env \
  VSEARCH_TPU_NATIVE_SO="$SO" \
  LD_PRELOAD="$LIBASAN $LIBUBSAN" \
  ASAN_OPTIONS="detect_leaks=0:halt_on_error=1:abort_on_error=1" \
  UBSAN_OPTIONS="halt_on_error=1:print_stacktrace=1" \
  PYTHONPATH="$REPO" \
  JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest "${@:-tests/}" -x -q
echo "sanitized native tier: suite green"
