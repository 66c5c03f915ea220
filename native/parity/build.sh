#!/bin/sh
# Build the golden-parity harness: compiles the REFERENCE sources
# (read-only, out-of-tree) plus our harness.cpp into one CPU binary that
# loads cfg+weights, runs NetworkPredict and dumps detections + the final
# layer's raw output.  Used by tests/test_reference_parity.py to compare
# the actual reference implementation against darknet_tpu bit-for-bit.
#
# usage: build.sh <reference_src_dir> <out_dir>
set -e
SRC=${1:-/root/reference}/src
STB=${1:-/root/reference}/3rdparty/stb/include
OUT=${2:-/tmp/refbuild}
HERE=$(dirname "$0")
mkdir -p "$OUT"
cd "$OUT"

FILES="parser.cpp network.cpp convolutional_layer.cpp batchnorm_layer.cpp \
connected_layer.cpp activation_layer.cpp avgpool_layer.cpp cost_layer.c \
crop_layer.c detection_layer.cpp dropout_layer.c gaussian_yolo_layer.cpp \
local_layer.c maxpool_layer.cpp reorg_layer.c reorg_old_layer.c \
route_layer.c scale_channels_layer.c shortcut_layer.c upsample_layer.c \
yolo_layer.cpp layer.cpp box.cpp blas.c gemm.c cpu_gemm.c im2col.c \
col2im.c activations.c utils.cpp list.cpp option_list.cpp matrix.c \
image.cpp dark_cuda.c data.cpp"

for f in $FILES; do
  o="${f%.*}.o"
  [ -f "$o" ] && [ "$o" -nt "$SRC/$f" ] && continue
  g++ -O2 -mavx2 -mfma -fopenmp -w -x c++ -c "$SRC/$f" \
      -I"$SRC" -I"$STB" -o "$o"
done
g++ -O2 -fopenmp -DOPENCV -w -x c++ -c "$SRC/image_opencv.cpp" \
    -I"$SRC" -I"$STB" $(pkg-config --cflags opencv4) -o image_opencv.o
g++ -O2 -fopenmp -DOPENCV -w -x c++ -c "$SRC/visualize.cpp" \
    -I"$SRC" -I"$STB" $(pkg-config --cflags opencv4) -o visualize.o
g++ -O2 -fopenmp -DOPENCV -w -x c++ -c "$SRC/detector.cpp" \
    -I"$SRC" -I"$STB" $(pkg-config --cflags opencv4) -o detector.o
g++ -O2 -fopenmp -DOPENCV -w -x c++ -c "$SRC/track_manager.cpp" \
    -I"$SRC" -I"$STB" $(pkg-config --cflags opencv4) -o track_manager.o
g++ -O2 -fopenmp -w -x c++ -c "$SRC/hungarian/Hungarian.cpp" \
    -I"$SRC" -o hungarian.o
g++ -O2 -fopenmp -w -x c++ -c "$SRC/hungarian/BipartiteGraph.cpp" \
    -I"$SRC" -o bipartite.o
g++ -O2 -fopenmp -w -x c++ -c "$HERE/harness.cpp" -I"$SRC" -o harness.o
g++ -O2 -fopenmp -o ref_harness harness.o \
    $(ls ./*.o | grep -v harness) -lpthread -lm $(pkg-config --libs opencv4)
echo "$OUT/ref_harness"
