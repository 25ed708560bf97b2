#!/bin/bash
# Build the reference rawhash2 binary hermetically for the PAF-equivalence
# harness: HDF5 and POD5 disabled (-DNHDF5RH -DNPOD5RH, the reference's own
# guards), SLOW5 provided by the ASCII stub in slow5_stub/.  The reference
# tree is never modified (compiled straight out of /root/reference/src).
set -e
REF=${1:-/root/reference/src}
OUT=${2:-$HOME/.cache/rawhash_tpu_ref/rawhash2}
HERE=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$(dirname "$OUT")"
BUILD=$(mktemp -d)
trap 'rm -rf "$BUILD"' EXIT
CPPFLAGS="-std=c++11 -w -O3 -march=native -pthread -DHAVE_KALLOC -DNHDF5RH -DNPOD5RH -I$HERE/slow5_stub -I$REF"
gcc -w -O3 -march=native -I"$REF" -c "$HERE/slow5_stub/slow5_stub.c" -o "$BUILD/slow5_stub.o"
for src in "$REF"/*.c "$REF"/*.cpp; do
  base=$(basename "$src"); base=${base%.*}
  g++ $CPPFLAGS -x c++ -c "$src" -o "$BUILD/$base.o"
done
g++ $CPPFLAGS "$BUILD"/*.o -o "$OUT" -lz -lm -lpthread
echo "$OUT"
