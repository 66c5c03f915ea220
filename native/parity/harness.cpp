// Golden-parity harness against the REFERENCE implementation.
//
// Modes:
//   predict (default, arg-compatible with round 1):
//     harness cfg weights in.bin out.bin [thresh] [nms]
//     -> NetworkPredict + GetNetworkBoxes + NmsSort; dumps detections and
//        the final layer's raw output.
//   train:
//     harness train cfg weights in.bin truth.bin out.bin
//     -> LoadNetwork(train=1) + TrainNetworkDatum on one batch; dumps
//        *net.cost and every head layer's delta array (the training-math
//        oracle: yolo_layer.cpp:430-757, network.cpp:188-215).
//   valid:
//     harness valid data.cfg cfg weights iou_thresh out.bin
//     -> ValidateDetector (detector.cpp:326-561), the de-facto mAP
//        pipeline; dumps the returned mAP as one float.
//   trainloop:
//     harness trainloop cfg weights train.list n_iters out.weights losses.bin
//     -> the reference's FULL training loop (detector.cpp:27-324 minus
//        multi-GPU/chart): its own threaded augmenting loader
//        (load_data, data.cpp:829) + TrainNetwork per iteration +
//        SaveWeights at the end; dumps the per-iteration loss curve.
//        weights may be "-" for random init.  This is the oracle for the
//        end-to-end train-A/B gate (tests/test_reference_trainloop.py).
//   trainsteps:
//     harness trainsteps cfg weights x.bin y.bin n_batches n_iters
//                        out.weights costs.bin
//     -> deterministic multi-step training on caller-provided batches
//        (no loader/augmentation randomness): the weight-TRAJECTORY
//        oracle (optimizer + BN rolling stats + burn-in integration).
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include "data.h"
#include "network.h"
#include "option_list.h"
#include "parser.h"
#include "yolo_core.h"

extern "C" void init_cpu();

static int mode_predict(int argc, char** argv)
{
  if (argc < 5) { fprintf(stderr, "usage: harness cfg weights in.bin out.bin [thresh] [nms]\n"); return 1; }
  float thresh = argc > 5 ? atof(argv[5]) : 0.25f;
  float nms = argc > 6 ? atof(argv[6]) : 0.45f;
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

static int mode_train(int argc, char** argv)
{
  // harness train cfg weights in.bin truth.bin out.bin
  if (argc < 7) { fprintf(stderr, "usage: harness train cfg weights in.bin truth.bin out.bin\n"); return 1; }
  Network net = {0};
  if (!LoadNetwork(&net, argv[2], argv[3], true, false)) { fprintf(stderr, "load failed\n"); return 2; }
  int insz = net.batch * net.w * net.h * net.c;
  // this fork's parser never sets net.truths; take the max over layers
  // (yolo/gaussian: max_boxes*5, detection: side^2*(1+coords+classes))
  int truths = 0;
  for (int i = 0; i < net.n; i++)
    if (net.layers[i].truths > truths) truths = net.layers[i].truths;
  int tsz = net.batch * truths;
  float* x = (float*)calloc(insz, sizeof(float));
  float* y = (float*)calloc(tsz > 0 ? tsz : 1, sizeof(float));
  FILE* fi = fopen(argv[4], "rb");
  fread(x, sizeof(float), insz, fi);
  fclose(fi);
  fi = fopen(argv[5], "rb");
  if (tsz > 0) fread(y, sizeof(float), tsz, fi);
  fclose(fi);

  float cost = TrainNetworkDatum(&net, x, y);

  FILE* fo = fopen(argv[6], "wb");
  fwrite(&cost, sizeof(float), 1, fo);
  // every head layer's delta (gradient-ascent direction on its output)
  int nheads = 0;
  for (int i = 0; i < net.n; i++) {
    LAYER_TYPE t = net.layers[i].type;
    if (t == YOLO || t == GAUSSIAN_YOLO || t == DETECTION || t == COST)
      nheads++;
  }
  fwrite(&nheads, sizeof(int), 1, fo);
  for (int i = 0; i < net.n; i++) {
    layer* l = &net.layers[i];
    LAYER_TYPE t = l->type;
    if (t != YOLO && t != GAUSSIAN_YOLO && t != DETECTION && t != COST)
      continue;
    int sz = l->outputs * net.batch;
    fwrite(&i, sizeof(int), 1, fo);
    fwrite(&sz, sizeof(int), 1, fo);
    float lcost = l->cost ? *l->cost : 0.0f;
    fwrite(&lcost, sizeof(float), 1, fo);
    fwrite(l->delta, sizeof(float), sz, fo);
  }
  fclose(fo);
  fprintf(stderr, "ok train cost=%f heads=%d\n", cost, nheads);
  return 0;
}

static int mode_valid(int argc, char** argv)
{
  // harness valid data.cfg cfg weights iou_thresh out.bin
  if (argc < 7) { fprintf(stderr, "usage: harness valid data cfg weights iou out.bin\n"); return 1; }
  Metadata md(argv[2]);
  Network net = {0};
  if (!LoadNetwork(&net, argv[3], argv[4], false, false)) { fprintf(stderr, "load failed\n"); return 2; }
  float iou = atof(argv[5]);
  float map = ValidateDetector(md, &net, iou);
  FILE* fo = fopen(argv[6], "wb");
  fwrite(&map, sizeof(float), 1, fo);
  fclose(fo);
  fprintf(stderr, "ok valid map=%f\n", map);
  return 0;
}

static int mode_trainloop(int argc, char** argv)
{
  // harness trainloop cfg weights train.list n_iters out.weights losses.bin
  if (argc < 8) {
    fprintf(stderr, "usage: harness trainloop cfg weights train.list "
                    "n_iters out.weights losses.bin\n");
    return 1;
  }
  char const* weights = strcmp(argv[3], "-") == 0 ? nullptr : argv[3];
  int n_iters = atoi(argv[5]);
  Network net = {0};
  if (!LoadNetwork(&net, argv[2], weights, true, true)) {
    fprintf(stderr, "load failed\n");
    return 2;
  }
  list* plist = get_paths(argv[4]);
  char** paths = (char**)ListToArray(plist);
  layer* l = &net.layers[net.n - 1];

  // mirror detector.cpp:96-130 (single GPU-count, fixed resolution)
  data buffer = {0};
  load_args args = {0};
  args.w = net.w;
  args.h = net.h;
  args.c = net.c;
  args.paths = paths;
  args.n = net.batch * net.subdiv;
  args.m = plist->size;
  args.classes = l->classes;
  args.flip = net.flip;
  args.jitter = l->jitter;
  args.num_boxes = l->max_boxes;
  args.d = &buffer;
  args.type = DETECTION_DATA;
  args.gaussian_noise = net.gaussian_noise;
  args.blur = net.blur;
  args.mixup = net.mixup;
  args.exposure = net.exposure;
  args.saturation = net.saturation;
  args.hue = net.hue;
  args.threads = 4;

  net.max_iter = n_iters;
  pthread_t load_thread = load_data(args);
  std::vector<float> losses;
  while (GetCurrIter(&net) < n_iters) {
    pthread_join(load_thread, nullptr);
    data train = buffer;
    load_thread = load_data(args);
    float loss = TrainNetwork(&net, train);
    free_data(train);
    losses.push_back(loss);
    fprintf(stderr, "[%04ld] loss=%f\n", (long)GetCurrIter(&net), loss);
  }
  pthread_join(load_thread, nullptr);
  free_data(buffer);

  SaveWeights(&net, argv[6]);
  FILE* fo = fopen(argv[7], "wb");
  int n = (int)losses.size();
  fwrite(&n, sizeof(int), 1, fo);
  fwrite(losses.data(), sizeof(float), n, fo);
  fclose(fo);
  fprintf(stderr, "ok trainloop %d iters\n", n);
  return 0;
}

static int mode_trainsteps(int argc, char** argv)
{
  // harness trainsteps cfg weights x.bin y.bin n_batches n_iters
  //                    out.weights costs.bin
  // -> LoadNetwork(train=1), then n_iters DETERMINISTIC training
  //    iterations over caller-provided batches (iter i uses batch
  //    i % n_batches), each mirroring TrainNetwork (network.cpp:210-239):
  //    TrainNetworkDatum + curr_iter++ + UpdateNetwork.  The full
  //    optimizer trajectory (momentum/decay/burn-in LR, BN rolling
  //    stats) with NO loader/augmentation randomness — the oracle for
  //    the multi-step weight-trajectory gates
  //    (tests/test_reference_trainloop.py).  weights may be "-".
  if (argc < 10) {
    fprintf(stderr, "usage: harness trainsteps cfg weights x.bin y.bin "
                    "n_batches n_iters out.weights costs.bin\n");
    return 1;
  }
  char const* weights = strcmp(argv[3], "-") == 0 ? nullptr : argv[3];
  int n_batches = atoi(argv[6]);
  int n_iters = atoi(argv[7]);
  Network net = {0};
  if (!LoadNetwork(&net, argv[2], weights, true, true)) {
    fprintf(stderr, "load failed\n");
    return 2;
  }
  net.max_iter = n_iters;
  int insz = net.batch * net.w * net.h * net.c;
  int truths = 0;
  for (int i = 0; i < net.n; i++)
    if (net.layers[i].truths > truths) truths = net.layers[i].truths;
  int tsz = net.batch * truths;
  float* x = (float*)calloc((size_t)insz * n_batches, sizeof(float));
  float* y = (float*)calloc((size_t)(tsz > 0 ? tsz : 1) * n_batches,
                            sizeof(float));
  FILE* fi = fopen(argv[4], "rb");
  if (fread(x, sizeof(float), (size_t)insz * n_batches, fi) !=
      (size_t)insz * n_batches) {
    fprintf(stderr, "x.bin short read\n");
    return 3;
  }
  fclose(fi);
  fi = fopen(argv[5], "rb");
  if (tsz > 0 && fread(y, sizeof(float), (size_t)tsz * n_batches, fi) !=
      (size_t)tsz * n_batches) {
    fprintf(stderr, "y.bin short read\n");
    return 3;
  }
  fclose(fi);

  std::vector<float> costs;
  for (int it = 0; it < n_iters; it++) {
    int b = it % n_batches;
    net.curr_subdiv = 0;
    float cost = TrainNetworkDatum(&net, x + (size_t)b * insz,
                                   y + (size_t)b * tsz);
    net.curr_iter++;
    UpdateNetwork(&net);
    costs.push_back(cost / (net.batch * net.subdiv));
  }
  SaveWeights(&net, argv[8]);
  FILE* fo = fopen(argv[9], "wb");
  int n = (int)costs.size();
  fwrite(&n, sizeof(int), 1, fo);
  fwrite(costs.data(), sizeof(float), n, fo);
  fclose(fo);
  fprintf(stderr, "ok trainsteps %d iters\n", n);
  free(x);
  free(y);
  return 0;
}

static int mode_resize(int argc, char** argv)
{
  // harness resize cfg weights new_w new_h in.bin out.bin [thresh] [nms]
  // -> LoadNetwork at the cfg dims, then the reference's OWN
  //    ResizeNetwork (network.cpp:255-410) before predicting — the
  //    multi-scale resize path, distinct from re-parsing the cfg.
  if (argc < 8) {
    fprintf(stderr,
            "usage: harness resize cfg weights w h in.bin out.bin\n");
    return 1;
  }
  float thresh = argc > 8 ? atof(argv[8]) : 0.25f;
  float nms = argc > 9 ? atof(argv[9]) : 0.45f;
  Network net = {0};
  if (!LoadNetwork(&net, argv[2], argv[3], false, false)) {
    fprintf(stderr, "load failed\n");
    return 2;
  }
  int w = atoi(argv[4]), h = atoi(argv[5]);
  ResizeNetwork(&net, w, h);
  int insz = net.w * net.h * net.c;
  float* input = (float*)malloc(insz * sizeof(float));
  FILE* fi = fopen(argv[6], "rb");
  fread(input, sizeof(float), insz, fi);
  fclose(fi);
  NetworkPredict(&net, input);
  int nboxes = 0;
  Detection* dets = GetNetworkBoxes(&net, thresh, &nboxes);
  layer* l = &net.layers[net.n - 1];
  NmsSort(dets, nboxes, l->classes, nms, l->nms_kind, l->beta_nms);
  FILE* fo = fopen(argv[7], "wb");
  fwrite(&nboxes, sizeof(int), 1, fo);
  int classes = l->classes;
  fwrite(&classes, sizeof(int), 1, fo);
  for (int i = 0; i < nboxes; i++) {
    float row[5] = {dets[i].bbox.x, dets[i].bbox.y, dets[i].bbox.w,
                    dets[i].bbox.h, dets[i].objectness};
    fwrite(row, sizeof(float), 5, fo);
    fwrite(dets[i].prob, sizeof(float), classes, fo);
  }
  int outs = l->outputs;
  fwrite(&outs, sizeof(int), 1, fo);
  fwrite(l->output, sizeof(float), outs, fo);
  fclose(fo);
  fprintf(stderr, "ok resize %dx%d %d boxes\n", w, h, nboxes);
  return 0;
}

int main(int argc, char** argv)
{
  init_cpu();
  if (argc > 1 && strcmp(argv[1], "train") == 0) return mode_train(argc, argv);
  if (argc > 1 && strcmp(argv[1], "valid") == 0) return mode_valid(argc, argv);
  if (argc > 1 && strcmp(argv[1], "trainloop") == 0)
    return mode_trainloop(argc, argv);
  if (argc > 1 && strcmp(argv[1], "trainsteps") == 0)
    return mode_trainsteps(argc, argv);
  if (argc > 1 && strcmp(argv[1], "resize") == 0)
    return mode_resize(argc, argv);
  return mode_predict(argc, argv);
}
