#!/bin/sh
# Build the darknet_tpu C ABI shim (embeds CPython) + the demo client.
# usage: build.sh <out_dir>
set -e
OUT=${1:-/tmp/dtpu_capi}
HERE=$(dirname "$0")
mkdir -p "$OUT"
PYCFG=python3-config
CFLAGS="$($PYCFG --includes) -O2 -fPIC -Wall"
LDFLAGS="$($PYCFG --ldflags --embed 2>/dev/null || $PYCFG --ldflags)"
gcc $CFLAGS -shared -o "$OUT/libdarknet_tpu_c.so" "$HERE/darknet_tpu_c.c" \
    $LDFLAGS
gcc $CFLAGS -o "$OUT/dtpu_demo" "$HERE/demo.c" -I"$HERE" \
    -L"$OUT" -ldarknet_tpu_c -Wl,-rpath,"$OUT" $LDFLAGS
echo "$OUT/dtpu_demo"
