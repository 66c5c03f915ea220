/* Minimal C client of the darknet_tpu C ABI: load a cfg, run one
 * detection pass, print the results.  Exercised by tests/test_capi.py. */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "darknet_tpu_c.h"

int main(int argc, char** argv)
{
  if (argc < 2) {
    fprintf(stderr, "usage: demo cfg [weights] [thresh]\n");
    return 1;
  }
  const char* weights = argc > 2 && argv[2][0] ? argv[2] : NULL;
  float thresh = argc > 3 ? (float)atof(argv[3]) : 0.25f;

  dtpu_net net = dtpu_load(argv[1], weights);
  if (!net) { fprintf(stderr, "load failed\n"); return 2; }
  int w = dtpu_input_w(net), h = dtpu_input_h(net), c = dtpu_input_c(net);
  printf("net %dx%dx%d classes=%d\n", w, h, c, dtpu_classes(net));

  float* img = (float*)calloc((size_t)w * h * c, sizeof(float));
  for (int y = h / 4; y < 3 * h / 4; y++)
    for (int x = w / 4; x < 3 * w / 4; x++)
      for (int k = 0; k < c; k++) img[(y * w + x) * c + k] = 0.7f;

  dtpu_detection dets[64];
  int n = dtpu_detect(net, img, thresh, 0.45f, dets, 64);
  if (n < 0) { fprintf(stderr, "detect failed\n"); return 3; }
  printf("detections: %d\n", n);
  for (int i = 0; i < n && i < 5; i++)
    printf("  [%d] cls=%d prob=%.3f box=(%.3f,%.3f,%.3f,%.3f)\n", i,
        dets[i].best_class, dets[i].best_prob, dets[i].x, dets[i].y,
        dets[i].w, dets[i].h);

  char* js = dtpu_detect_json(net, img, thresh, 0.45f, 7, "demo.jpg");
  if (!js) { fprintf(stderr, "json failed\n"); return 4; }
  printf("json head: %.40s\n", js);
  if (!strstr(js, "\"frame_id\": 7") || !strstr(js, "demo.jpg")) {
    fprintf(stderr, "json missing fields\n");
    return 4;
  }
  dtpu_free_str(js);

  /* saving needs unfused BN: load train-style (LoadNetwork train flag),
     and the fused inference net must REFUSE to serialize */
  if (dtpu_save_weights(net, "/tmp/dtpu_demo.weights") == 0) {
    fprintf(stderr, "fused save should have failed\n");
    return 5;
  }
  dtpu_net tnet = dtpu_load2(argv[1], weights, 1, 0);
  if (!tnet || dtpu_save_weights(tnet, "/tmp/dtpu_demo.weights") != 0) {
    fprintf(stderr, "train-load save failed\n");
    return 5;
  }
  dtpu_free(tnet);
  printf("weights saved\n");

  if (argc > 4 && argv[4][0]) {
    float m = dtpu_validate(net, argv[4], 0.5f);
    if (m < 0) { fprintf(stderr, "validate failed\n"); return 6; }
    printf("mAP: %.4f\n", m);
  }

  /* tracker (track_manager.h surface): feed the same detections for a
     few frames; a confirmed track with a stable label must emerge */
  if (n > 0) {
    dtpu_tracker tm = dtpu_tracker_new(10.0f, 0.3f);
    if (!tm) { fprintf(stderr, "tracker_new failed\n"); return 7; }
    dtpu_track_info tracks[16];
    int nt = 0;
    for (int f = 0; f < 4; f++) {
      if (dtpu_tracker_update(tm, dets, n > 4 ? 4 : n) != 0) {
        fprintf(stderr, "tracker_update failed\n");
        return 7;
      }
      nt = dtpu_tracker_tracks(tm, tracks, 16);
      if (nt < 0) { fprintf(stderr, "tracker_tracks failed\n"); return 7; }
    }
    printf("tracks: %d", nt);
    if (nt > 0)
      printf(" label0=%d cls=%d prob=%.2f stationary=%d", tracks[0].label,
             tracks[0].cid, tracks[0].prob, tracks[0].stationary);
    printf("\n");
    if (nt <= 0 || tracks[0].label < 0) {
      fprintf(stderr, "expected a confirmed labeled track\n");
      return 7;
    }
    dtpu_tracker_free(tm);
  }

  /* TrainDetector from C: two bounded iterations over the .data file */
  if (argc > 5 && argv[5][0]) {
    float loss = dtpu_train(argv[5], argv[1], NULL, 0, 2);
    if (isnan(loss)) { fprintf(stderr, "train failed\n"); return 8; }
    printf("train avg loss: %.3f\n", loss);
  }

  free(img);
  dtpu_free(net);
  printf("ok\n");
  return 0;
}
