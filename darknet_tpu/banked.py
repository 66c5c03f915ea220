"""Banked performance numbers — the single source of truth for every
gate/floor constant that derives from an on-chip measurement.

Update these ONLY from an official measurement (bench.py /
tools/meas_train.py on the real chip); each constant cites where the
number was measured.  Tests import from here so the constants cannot
silently diverge from the banked results (VERDICT r4 weak #3).
"""

# One-chip yolov4-608 training rate for the committed recipe
# (b8 no-remat act16 stem-on bf16, metric_lag=3 dispatch regime) —
# round-5 `tools/meas_train.py bench`: 69.5 ms/step = 115.1 img/s
# (2026-08-21, uncontended; a second contended run measured 68.9/116.1)
# after the fused BN+act train epilogue, the separable SPP maxpool
# backward and the lane-friendly loss layout.  Round-4 was 74.5/107.4.
# The BLOCKING (one loss fetch per step, includes tunnel RTT) number
# is ~10% lower; a production host co-located with the chip sits
# between the two.
TRAIN_608_IMG_S = 115.1
TRAIN_608_IMG_S_BLOCKING = 96.3

# Serving floors (bench.py official runs, BENCH_r04.json):
# int8 headline 913.45 img/s = 1.142x, bf16 740.09 = 0.925x vs the
# 800 img/s 2x-A100-TensorRT baseline.  The floor constants below are
# what tests/test_bench_floors.py asserts against the newest
# BENCH_r*.json so a silent regression fails CI (VERDICT r4 weak #4).
SERVING_BASELINE_IMG_S = 800.0
INT8_FLOOR_VS_BASELINE = 1.10
# bf16 ratchet: the best official bf16 run is 0.925x (BENCH_r04) — the
# known gap to 1.0x is the tail convs the int8 path wins (NOTES.md).
# This floor asserts "no silent rot" at the measured level; raise it to
# 1.00 the round an official run crosses it.
BF16_FLOOR_VS_BASELINE = 0.92
