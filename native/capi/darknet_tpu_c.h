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

/* FreeNetwork. */
void dtpu_free(dtpu_net net);

#ifdef __cplusplus
}
#endif
#endif /* DARKNET_TPU_C_H */
