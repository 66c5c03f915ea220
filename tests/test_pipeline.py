"""Pipeline (stage-axis) parallelism: stage-partitioned inference must
match the single-device forward exactly — stages reuse the stock emitter
in slice mode, so this gates the cut planning + cross-stage dataflow."""

import numpy as np

import jax
import jax.numpy as jnp

from darknet_tpu import model_zoo
from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.nn.emit import make_forward
from darknet_tpu.parallel.pipeline import (PipelineForward, crossing_set,
                                           plan_cuts)


def test_crossing_set_tracks_route_backrefs():
    g = build_graph(model_zoo.yolov4_cfg(96, 96))
    # the yolov4 neck routes back into the backbone (layers 54/85); a cut
    # in the neck must carry those backbone outputs forward
    cs = crossing_set(g, 100)
    assert 54 in cs and 85 in cs
    # nothing in the set is at/after the cut and nothing is the cur layer
    assert all(j < 99 for j in cs)


def test_plan_cuts_balanced_and_monotonic():
    g = build_graph(model_zoo.yolov4_cfg(96, 96))
    cuts = plan_cuts(g, 4)
    assert len(cuts) == 3 and cuts == sorted(cuts)
    bf = [l.bflops or 0 for l in g.layers]
    bounds = [0] + cuts + [len(g.layers)]
    shares = [sum(bf[a:b]) for a, b in zip(bounds, bounds[1:])]
    assert max(shares) < 2.2 * (sum(bf) / 4)    # roughly balanced


def test_pipeline_tiny_matches_single_device(rng):
    g = build_graph(model_zoo.yolov4_tiny_cfg(128, 128))
    params = paramlib.fuse_conv_batchnorm(g, paramlib.init_params(g, seed=0))
    x = rng.uniform(0, 1, (4, 128, 128, 3)).astype(np.float32)

    ref = make_forward(g, fused_bn=True, fuse_regions=False,
                       stem_s2d=False)(params, jnp.asarray(x))["heads"]

    pf = PipelineForward(g, params, jax.devices()[:4], microbatches=2)
    heads = pf(x)
    assert len(heads) == len(ref)
    for a, b in zip(heads, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_pipeline_yolov4_neck_backrefs(rng):
    """Full yolov4 at 96²: cuts land in the neck, forcing multi-stage
    carry of backbone outputs (the hard dataflow case)."""
    g = build_graph(model_zoo.yolov4_cfg(96, 96))
    params = paramlib.fuse_conv_batchnorm(g, paramlib.init_params(g, seed=1))
    x = rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)

    ref = make_forward(g, fused_bn=True, fuse_regions=False,
                       stem_s2d=False)(params, jnp.asarray(x))["heads"]

    pf = PipelineForward(g, params, jax.devices()[:4], microbatches=1)
    heads = pf(x)
    for a, b in zip(heads, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
