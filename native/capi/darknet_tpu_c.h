/* darknet_tpu C ABI — mirrors the reference's public surface
 * (yolo_core.h:625-663: LoadNetwork / NetworkPredict / GetNetworkBoxes /
 * NmsSort / FreeDetections) for C/C++ clients of the TPU runtime.
 *
 * The implementation embeds CPython and drives the darknet_tpu package;
 * the compute runs wherever JAX is configured (TPU by default; set
 * DTPU_PLATFORM=cpu to force CPU).  All calls are GIL-safe.
 */
#ifndef DARKNET_TPU_C_H
#define DARKNET_TPU_C_H

#ifdef __cplusplus
extern "C" {
#endif

typedef void* dtpu_net;

typedef struct {
  /* relative center-format box, like the reference Detection (box.h:68) */
  float x, y, w, h;
  float objectness;
  int best_class;
  float best_prob;
} dtpu_detection;

/* LoadNetwork: parse cfg, optionally load .weights (NULL -> random init),
 * fuse BN for inference.  Returns NULL on failure. */
dtpu_net dtpu_load(const char* cfg_path, const char* weights_path);

/* LoadNetwork with the full reference signature (yolo_core.h:625-626):
 * train != 0 keeps BN unfused (required before dtpu_save_weights);
 * clear != 0 resets the seen counter. */
dtpu_net dtpu_load2(const char* cfg_path, const char* weights_path,
                    int train, int clear);

/* Network input geometry. */
int dtpu_input_w(dtpu_net net);
int dtpu_input_h(dtpu_net net);
int dtpu_input_c(dtpu_net net);
int dtpu_classes(dtpu_net net);

/* NetworkPredict + GetNetworkBoxes + NmsSort in one call.
 * rgb: HWC float32 in [0,1] with the network's input dims.
 * Returns the number of detections written (<= max_out), or -1 on error. */
int dtpu_detect(dtpu_net net, const float* rgb, float thresh, float nms,
                dtpu_detection* out, int max_out);

/* SaveWeights: write the byte-exact .weights stream (parser.cpp:1590).
 * Returns 0 on success, -1 on error. */
int dtpu_save_weights(dtpu_net net, const char* path);

/* Detection2Json (network.cpp:531-593): run detect and return the JSON
 * string for the frame.  Caller frees with dtpu_free_str.  NULL on
 * error.  filename may be NULL. */
char* dtpu_detect_json(dtpu_net net, const float* rgb, float thresh,
                       float nms, long long frame_id, const char* filename);
void dtpu_free_str(char* s);

/* ValidateDetector (detector.cpp:326-561): mAP@iou_thresh over the
 * .data file's valid list using an already-loaded net.  Returns mAP in
 * [0,1], or -1.0 on error. */
float dtpu_validate(dtpu_net net, const char* data_file, float iou_thresh);

/* FreeNetwork. */
void dtpu_free(dtpu_net net);

#ifdef __cplusplus
}
#endif
#endif /* DARKNET_TPU_C_H */
