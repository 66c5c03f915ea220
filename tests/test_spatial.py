"""Spatial (H-axis) sharding: GSPMD-partitioned forward must equal the
single-device result — halo exchanges inserted by XLA, not by us."""

import os

import numpy as np
import pytest

import jax

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.parallel.mesh import replicate
from darknet_tpu.parallel.spatial import (make_spatial_forward,
                                          make_spatial_mesh, shard_spatial)
from darknet_tpu import model_zoo


def test_spatial_sharded_inference_matches(rng):
    # yolov4-tiny at 128: strides reach /32, grids 4 and 8; shard H over 4
    cfg = model_zoo.yolov4_tiny_cfg(128, 128)
    g = build_graph(cfg)
    params = paramlib.fuse_conv_batchnorm(g, paramlib.init_params(g, seed=0))
    x = rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)

    mesh = make_spatial_mesh(2, 4)          # 2-way dp x 4-way spatial
    f = make_spatial_forward(g, mesh, fused_bn=True)
    pr = replicate(mesh, params)
    xs = shard_spatial(mesh, x)
    boxes_s, obj_s, cls_s = f(pr, xs)

    # single-device reference
    from darknet_tpu.nn.emit import make_forward
    from darknet_tpu.ops import yolo as yoloops
    import jax.numpy as jnp

    fwd = make_forward(g, fused_bn=True)
    r = fwd(params, jnp.asarray(x))
    heads = g.heads()
    outs = [yoloops.yolo_decode(t, l, 128, 128)
            for t, l in zip(r["heads"], heads)]
    boxes = np.concatenate([np.asarray(o[0]) for o in outs], axis=1)
    obj = np.concatenate([np.asarray(o[1]) for o in outs], axis=1)

    np.testing.assert_allclose(np.asarray(boxes_s), boxes, rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(obj_s), obj, rtol=2e-4, atol=2e-5)
