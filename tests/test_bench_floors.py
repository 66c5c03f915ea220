"""Performance-floor ratchet (VERDICT r4 weak #4): assert the newest
driver bench artifact against the floors in darknet_tpu/banked.py so a
serving or training regression can't land silently.

The BENCH_r*.json files are written by the driver from bench.py's JSON
line at the end of every round; banked.py's constants change only from
official on-chip measurements.  This test is pure file reading — it
never touches a device — so it lives in the quick tier.
"""

import glob
import json
import os
import re

import pytest

from darknet_tpu import banked

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_bench():
    files = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
                   key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if not files:
        pytest.skip("no BENCH_r*.json artifacts (pre-first-round tree)")
    with open(files[-1]) as f:
        data = json.load(f)
    # the driver wraps bench.py's JSON line under "parsed"
    name, b = os.path.basename(files[-1]), data.get("parsed", data)
    # transport-outage artifacts are not perf data: the dev tunnel has
    # degraded episodes (2026-08-21: trivial-add p50 24 ms, the serving
    # program ~65x its healthy time).  A real code regression cannot
    # blow the amortized DEVICE time or the trivial round trip up by an
    # order of magnitude, so gate on the artifact's own health stamps.
    if b.get("tunnel_rtt_floor_ms", 0) > 100 or \
            b.get("batch1_ms_amortized", 0) > 25:
        pytest.skip(f"{name} was measured through a degraded tunnel "
                    f"(rtt_floor={b.get('tunnel_rtt_floor_ms')} ms, "
                    f"b1_amortized={b.get('batch1_ms_amortized')} ms) — "
                    "not comparable perf data")
    return name, b


def test_int8_serving_floor():
    name, b = _newest_bench()
    assert b["vs_baseline"] >= banked.INT8_FLOOR_VS_BASELINE, (
        f"{name}: int8 serving {b['vs_baseline']}x fell below the "
        f"{banked.INT8_FLOOR_VS_BASELINE}x floor")


def test_bf16_serving_floor():
    name, b = _newest_bench()
    if "bf16_vs_baseline" not in b:
        pytest.skip(f"{name} predates the bf16 field (round <= 3)")
    assert b["bf16_vs_baseline"] >= banked.BF16_FLOOR_VS_BASELINE, (
        f"{name}: bf16 serving {b['bf16_vs_baseline']}x fell below the "
        f"{banked.BF16_FLOOR_VS_BASELINE}x floor")


def test_training_rate_floor():
    name, b = _newest_bench()
    if "train_608_img_s" not in b:
        pytest.skip(f"{name} predates the training field (round <= 4)")
    # 5% grace: the tunnel's run-to-run spread on the training number is
    # a few percent (NOTES.md); the ratchet catches real regressions,
    # not measurement noise.
    floor = 0.95 * banked.TRAIN_608_IMG_S
    assert b["train_608_img_s"] >= floor, (
        f"{name}: training {b['train_608_img_s']} img/s fell below "
        f"0.95x the banked {banked.TRAIN_608_IMG_S}")
