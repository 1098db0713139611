#!/bin/sh
# Build the reference vsearch binary into .refbuild/ (out-of-tree autotools
# build of /root/reference).  The parity test-suite and bench.py require
# .refbuild/bin/vsearch; run this once in a fresh clone.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF_SRC="${REF_SRC:-/root/reference}"
BUILD="$REPO/.refbuild"

if [ -x "$BUILD/bin/vsearch" ]; then
    echo "reference binary already built: $BUILD/bin/vsearch"
    exit 0
fi

mkdir -p "$BUILD"
cd "$BUILD"
"$REF_SRC/configure" CXXFLAGS=-O2 --prefix="$BUILD" >configure.log 2>&1
make -j"$(nproc)" >make.log 2>&1
mkdir -p bin
if [ ! -x bin/vsearch ]; then
    cp src/vsearch bin/vsearch
fi
"$BUILD/bin/vsearch" --version
