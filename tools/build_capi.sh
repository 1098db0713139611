#!/bin/sh
# Build the C-ABI embedding shim (native/vsearch_tpu_capi.c) as a shared
# library plus the demo embedder (native/capi_demo.c).
#
#   sh tools/build_capi.sh [outdir]
#
# Produces $outdir/libvsearch_tpu_capi.so and $outdir/capi_demo.
set -e
cd "$(dirname "$0")/.."
OUT="${1:-native}"
PYINC=$(python3 -c "import sysconfig; print(sysconfig.get_paths()['include'])")
PYLIB=$(python3 -c "import sysconfig; print(sysconfig.get_config_var('LIBDIR'))")
PYVER=$(python3 -c "import sysconfig; print(sysconfig.get_config_var('LDVERSION'))")
cc -O2 -fPIC -shared -I"$PYINC" native/vsearch_tpu_capi.c \
   -L"$PYLIB" -lpython"$PYVER" -o "$OUT/libvsearch_tpu_capi.so"
cc -O2 -I native native/capi_demo.c \
   -L"$OUT" -lvsearch_tpu_capi -L"$PYLIB" -lpython"$PYVER" \
   -Wl,-rpath,"$(cd "$OUT" && pwd)" -Wl,-rpath,"$PYLIB" \
   -o "$OUT/capi_demo"
echo "built $OUT/libvsearch_tpu_capi.so + $OUT/capi_demo"
