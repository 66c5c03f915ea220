"""Checkpoint/resume tests: exact state round-trip and resumed training
determinism."""

import numpy as np

import jax
import jax.numpy as jnp

from darknet_tpu.graph.builder import build_graph
from darknet_tpu.nn import params as paramlib
from darknet_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from darknet_tpu.train.step import init_opt_state, make_train_step

CFG = """[net]
width=32
height=32
channels=3
learning_rate=0.01
momentum=0.9
decay=0.0005
[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky
[convolutional]
filters=16
size=1
activation=linear
[yolo]
mask=0,1
num=2
classes=3
anchors=8,8, 16,16
iou_loss=ciou
max_delta=5
"""


def test_checkpoint_roundtrip(tmp_path, rng):
    g = build_graph(CFG, train=True)
    params = paramlib.init_params(g, seed=0)
    opt = init_opt_state(g, params)
    step = make_train_step(g, donate=False)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    truths = np.zeros((2, 4, 5), np.float32)
    truths[:, 0] = [0.5, 0.5, 0.25, 0.25, 1]
    truths = jnp.asarray(truths)
    key = jax.random.PRNGKey(0)

    # 3 warmup steps, checkpoint, 2 more steps -> reference trajectory
    for _ in range(3):
        params, opt, _, _ = step(params, opt, x, truths, key, 0.01)
    path = tmp_path / "state.ckpt.npz"
    save_checkpoint(path, jax.device_get(params), jax.device_get(opt),
                    seen=3 * 2, rng_key=np.asarray(key))
    pa, oa = params, opt
    for _ in range(2):
        pa, oa, ca, _ = step(pa, oa, x, truths, key, 0.01)

    # restore and replay the same 2 steps -> identical result
    params2, opt2, seen, rkey = load_checkpoint(path, params, opt)
    assert seen == 6
    pb, ob = params2, opt2
    for _ in range(2):
        pb, ob, cb, _ = step(pb, ob, x, truths, key, 0.01)
    np.testing.assert_allclose(float(ca), float(cb), rtol=1e-6)
    for a, b in zip(pa, pb):
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-6, atol=1e-7)
    # optimizer momentum buffers restored exactly too
    for a, b in zip(oa["u"], ob["u"]):
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-6, atol=1e-7)
