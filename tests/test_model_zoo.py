"""Structural validation of the generated model-zoo cfgs: shape inference
must succeed and known landmark shapes/BFLOPs must match the canonical
architectures."""

import pytest

from darknet_tpu.graph.builder import build_graph
from darknet_tpu import model_zoo as zoo


def test_yolov4_608():
    g = build_graph(zoo.yolov4_cfg(608, 608))
    assert len(g.layers) == 162
    heads = g.heads()
    assert [l.mask for l in heads] == [(0, 1, 2), (3, 4, 5), (6, 7, 8)]
    assert [(l.out_h, l.out_w) for l in heads] == [(76, 76), (38, 38),
                                                  (19, 19)]
    assert [l.scale_x_y for l in heads] == [1.2, 1.1, 1.05]
    assert all(l.iou_loss == "ciou" for l in heads)
    # landmark backbone shapes
    assert (g.layers[54].out_h, g.layers[54].out_c) == (76, 256)   # P3
    assert (g.layers[85].out_h, g.layers[85].out_c) == (38, 512)   # P4
    assert (g.layers[104].out_h, g.layers[104].out_c) == (19, 1024)  # P5
    # SPP concat
    assert g.layers[113].out_c == 2048
    # canonical yolov4-608 is ~128.5 BFLOPs
    assert abs(g.total_bflops - 128.46) < 2.0


def test_yolov4_512_bflops():
    g = build_graph(zoo.yolov4_cfg(512, 512))
    # canonical yolov4-512 prints 91.1 BFLOPs
    assert abs(g.total_bflops - 91.1) < 1.5


def test_yolov3_416():
    g = build_graph(zoo.yolov3_cfg(416, 416))
    assert len(g.layers) == 107
    heads = g.heads()
    assert [(l.out_h, l.out_w) for l in heads] == [(13, 13), (26, 26),
                                                  (52, 52)]
    # canonical yolov3-416 is 65.9 BFLOPs
    assert abs(g.total_bflops - 65.86) < 1.0


def test_gaussian_yolov3():
    g = build_graph(zoo.gaussian_yolov3_cfg(416, 416))
    heads = g.heads()
    assert all(l.kind == "gaussian_yolo" for l in heads)
    assert all(l.out_c == 3 * (80 + 9) for l in heads)


def test_yolov4_tiny():
    g = build_graph(zoo.yolov4_tiny_cfg(416, 416))
    assert len(g.layers) == 38
    heads = g.heads()
    assert [(l.out_h, l.out_w) for l in heads] == [(13, 13), (26, 26)]
    assert [l.mask for l in heads] == [(3, 4, 5), (1, 2, 3)]
    # canonical yolov4-tiny-416 is 6.79 BFLOPs
    assert abs(g.total_bflops - 6.79) < 0.3


def test_yolov3_tiny_generator_matches_fixture(fixtures_dir):
    import os

    g1 = build_graph(zoo.yolov3_tiny_cfg(416, 416))
    g2 = build_graph(os.path.join(fixtures_dir, "yolov3-tiny.cfg"))
    assert len(g1.layers) == len(g2.layers)
    for a, b in zip(g1.layers, g2.layers):
        assert a.kind == b.kind
        assert (a.out_h, a.out_w, a.out_c) == (b.out_h, b.out_w, b.out_c)
