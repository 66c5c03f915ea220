// Golden-parity harness: load cfg+weights, run NetworkPredict on raw input
// read from stdin/file, dump raw outputs + detections to stdout as binary.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include "yolo_core.h"

extern "C" void init_cpu();

int main(int argc, char** argv)
{
  // args: cfg weights in.bin out.bin [thresh] [nms]
  if (argc < 5) { fprintf(stderr, "usage: harness cfg weights in.bin out.bin [thresh] [nms]\n"); return 1; }
  float thresh = argc > 5 ? atof(argv[5]) : 0.25f;
  float nms = argc > 6 ? atof(argv[6]) : 0.45f;
  init_cpu();
  Network net = {0};
  if (!LoadNetwork(&net, argv[1], argv[2], false, false)) { fprintf(stderr, "load failed\n"); return 2; }
  int insz = net.w * net.h * net.c;
  float* input = (float*)malloc(insz * sizeof(float));
  FILE* fi = fopen(argv[3], "rb");
  fread(input, sizeof(float), insz, fi);
  fclose(fi);
  NetworkPredict(&net, input);
  int nboxes = 0;
  Detection* dets = GetNetworkBoxes(&net, thresh, &nboxes);
  layer* l = &net.layers[net.n - 1];
  NmsSort(dets, nboxes, l->classes, nms, l->nms_kind, l->beta_nms);
  FILE* fo = fopen(argv[4], "wb");
  fwrite(&nboxes, sizeof(int), 1, fo);
  int classes = l->classes;
  fwrite(&classes, sizeof(int), 1, fo);
  for (int i = 0; i < nboxes; i++) {
    float row[5] = {dets[i].bbox.x, dets[i].bbox.y, dets[i].bbox.w, dets[i].bbox.h, dets[i].objectness};
    fwrite(row, sizeof(float), 5, fo);
    fwrite(dets[i].prob, sizeof(float), classes, fo);
  }
  // also dump the final layer raw output for activation-level parity
  int outs = l->outputs;
  fwrite(&outs, sizeof(int), 1, fo);
  fwrite(l->output, sizeof(float), outs, fo);
  fclose(fo);
  fprintf(stderr, "ok %d boxes\n", nboxes);
  return 0;
}
