"""cfg front-end + graph builder tests against reference parser semantics
(reference parser.cpp shape threading, shown in SURVEY.md §2.1)."""

import os

import pytest

from darknet_tpu.config.cfg import parse_cfg_text
from darknet_tpu.graph.builder import build_graph


def test_parse_sections_comments_and_strip():
    text = """
; comment
# another
[net]
width = 32
height=32
channels=3
batch= 4
subdivisions=2

[convolutional]
filters = 8
size=3
pad=1
activation=leaky
"""
    sections = parse_cfg_text(text)
    assert [s.type for s in sections] == ["[net]", "[convolutional]"]
    assert sections[0].options["width"] == "32"
    assert sections[1].options["filters"] == "8"


def test_first_occurrence_wins():
    text = "[net]\nwidth=32\nwidth=64\nheight=32\nchannels=3\n[avgpool]\n"
    sections = parse_cfg_text(text)
    assert sections[0].get_int("width") == 32


def test_net_batch_division():
    # batch /= subdivisions (parser.cpp:929); inference forces batch=1
    text = ("[net]\nbatch=64\nsubdivisions=16\nwidth=32\nheight=32\n"
            "channels=3\n[avgpool]\n")
    g_train = build_graph(text, train=True)
    assert g_train.net.batch == 4
    assert g_train.net.optimizer_batch == 64
    g_inf = build_graph(text, train=False)
    assert g_inf.net.batch == 1


def test_yolov3_tiny_shapes(fixtures_dir):
    g = build_graph(os.path.join(fixtures_dir, "yolov3-tiny.cfg"))
    assert len(g.layers) == 24
    kinds = [l.kind for l in g.layers]
    assert kinds == (
        ["convolutional", "maxpool"] * 6 +
        ["convolutional"] * 4 +
        ["yolo", "route", "convolutional", "upsample", "route",
         "convolutional", "convolutional", "yolo"])

    # spot-check the shape threading
    l0 = g.layers[0]
    assert (l0.out_h, l0.out_w, l0.out_c) == (416, 416, 16)
    # maxpool stride 2 chain: 416->208->104->52->26->13
    assert (g.layers[9].out_h, g.layers[9].out_w) == (13, 13)
    # maxpool size 2 stride 1 keeps 13x13 (padding=size-1=1)
    l11 = g.layers[11]
    assert (l11.out_h, l11.out_w, l11.out_c) == (13, 13, 512)
    # head 1: 13x13x255
    l15 = g.layers[15]
    assert (l15.out_h, l15.out_w, l15.out_c) == (13, 13, 255)
    # yolo 1
    l16 = g.layers[16]
    assert l16.kind == "yolo"
    assert l16.mask == (3, 4, 5)
    assert l16.outputs == 13 * 13 * 255
    # route -4 points to layer 13 (conv 256 1x1)
    l17 = g.layers[17]
    assert l17.layers == (13,)
    assert (l17.out_h, l17.out_w, l17.out_c) == (13, 13, 256)
    # upsample to 26
    l19 = g.layers[19]
    assert (l19.out_h, l19.out_w, l19.out_c) == (26, 26, 128)
    # route -1,8 concat
    l20 = g.layers[20]
    assert l20.layers == (19, 8)
    assert (l20.out_h, l20.out_w, l20.out_c) == (26, 26, 128 + 256)
    # head 2
    l23 = g.layers[23]
    assert l23.kind == "yolo"
    assert l23.mask == (0, 1, 2)
    assert l23.anchors[:4] == (10, 14, 23, 27)


def test_yolov3_tiny_bflops(fixtures_dir):
    g = build_graph(os.path.join(fixtures_dir, "yolov3-tiny.cfg"))
    # known value for yolov3-tiny at 416x416 (darknet prints ~5.571 BFLOPs)
    assert abs(g.total_bflops - 5.571) < 0.05


def test_route_groups():
    text = """[net]
width=8
height=8
channels=4
[convolutional]
filters=8
size=1
activation=linear
[route]
layers=-1
groups=2
group_id=1
"""
    g = build_graph(text)
    r = g.layers[1]
    assert r.out_c == 4
    assert r.groups == 2 and r.group_id == 1


def test_steps_policy_requires_scales():
    text = ("[net]\nwidth=32\nheight=32\nchannels=3\npolicy=steps\n"
            "steps=0.5,0.8\n[avgpool]\n")
    with pytest.raises(ValueError):
        build_graph(text)


def test_yolo_filters_mismatch_raises():
    text = """[net]
width=32
height=32
channels=3
[convolutional]
filters=10
size=1
activation=linear
[yolo]
mask=0
num=1
classes=80
"""
    with pytest.raises(ValueError):
        build_graph(text)


def test_maxpool_defaults():
    # size defaults to stride; padding defaults to size-1
    text = ("[net]\nwidth=16\nheight=16\nchannels=3\n"
            "[maxpool]\nstride=2\n")
    g = build_graph(text)
    m = g.layers[0]
    assert m.size == 2 and m.pad == 1
    assert (m.out_h, m.out_w) == (8, 8)


def test_backref_out_of_range_raises():
    # a too-negative reference must not WRAP to a wrong-but-valid layer
    # (Python list semantics) nor read out of bounds (reference UB,
    # parser.cpp:745-748)
    base = ("[net]\nwidth=16\nheight=16\nchannels=3\n"
            "[convolutional]\nfilters=4\nsize=1\nactivation=linear\n")
    with pytest.raises(ValueError, match="route.*outside"):
        build_graph(base + "[route]\nlayers=-5\n")
    with pytest.raises(ValueError, match="shortcut.*outside"):
        build_graph(base + "[shortcut]\nfrom=-9\nactivation=linear\n")
    with pytest.raises(ValueError, match="outside"):
        build_graph(base + "[route]\nlayers=7\n")   # forward reference
    with pytest.raises(ValueError, match="scale_channels.*outside"):
        build_graph(base + "[scale_channels]\nfrom=-4\n")


def test_shortcut_channel_mismatch_builds():
    # channel-count mismatch is the GPU-kernel-defined prefix add
    # (PARITY.md DEVIATIONS #16) — must parse, with out_c = input's c
    text = ("[net]\nwidth=16\nheight=16\nchannels=3\n"
            "[convolutional]\nfilters=4\nsize=1\nactivation=linear\n"
            "[convolutional]\nfilters=8\nsize=1\nactivation=linear\n"
            "[shortcut]\nfrom=-2\nactivation=linear\n")
    g = build_graph(text)
    assert g.layers[-1].out_c == 8


def test_unused_option_warnings():
    # the reference warns for cfg keys nothing read (UnusedOption,
    # option_list.cpp:232, parser.cpp:1370); typos must not be silent
    import warnings as w

    text = ("[net]\nwidth=16\nheight=16\nchannels=3\nmispeled_key=1\n"
            "[convolutional]\nfilters=4\nsize=1\nactivation=linear\n")
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        build_graph(text)
    msgs = [str(r.message) for r in rec if "Unused option" in str(r.message)]
    assert any("mispeled_key" in m for m in msgs), msgs
    # a fully-consumed cfg stays silent
    clean = ("[net]\nwidth=16\nheight=16\nchannels=3\n"
             "[convolutional]\nfilters=4\nsize=1\nactivation=linear\n")
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        build_graph(clean)
    assert not [r for r in rec if "Unused option" in str(r.message)]
