"""PROPERTY-BASED GOLDEN FUZZ: random valid cfgs vs the reference binary.

The hand-written gates cover the model-zoo families; this fuzzer samples
random layer graphs (conv variants x pool x upsample x shortcut x route
concats, random activations/BN/strides) with shape tracking, and gates
each one's raw head activations + pre-NMS detections against the
compiled reference — combinatorial layer interactions the fixed gates
can't enumerate.  Seeds are fixed for reproducibility.
"""

import os

import numpy as np
import pytest

from tests.test_reference_parity import REF, _compare, harness  # noqa: F401

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")),
    reason="reference tree not available")

ACTS = ["leaky", "mish", "relu", "logistic", "swish", "linear", "tanh",
        "elu", "gelu"]


def random_cfg(seed: int, size: int = 64, classes: int = 5,
               width: int | None = None, no_dropout: bool = False,
               train_safe: bool | None = None) -> str:
    """Sample a random, shape-valid detection cfg (non-square when
    `width` differs from `size` — exercises every op's h/w handling).

    train_safe restricts to the move set whose backward pass the
    reference binary survives — its training path SEGFAULTS on several
    exotic layers the inference path handles (maxpool_depth /
    standalone batchnorm / reorg_old / scale_wh training combos);
    defaults to no_dropout (the training fuzz passes that)."""
    if train_safe is None:
        train_safe = no_dropout
    rng = np.random.default_rng(seed)
    width = size if width is None else width
    lines = [f"[net]\nbatch=1\nsubdivisions=1\nwidth={width}\n"
             f"height={size}\nchannels=3\n"]
    h = c = None
    shapes = []            # per-layer (h, w, c)
    aa = []                # per-layer: is an antialiased conv (stale-tail
                           # stride-1 buffer — illegal as a shortcut source)
    h, w, c = size, width, 3

    def emit(s, nh, nw, nc, is_aa=False):
        nonlocal h, w, c
        lines.append(s)
        shapes.append((nh, nw, nc))
        aa.append(is_aa)
        h, w, c = nh, nw, nc

    # opener: conv so BN/route bookkeeping is sane
    f0 = int(rng.choice([8, 16]))
    emit(f"[convolutional]\nbatch_normalize=1\nfilters={f0}\nsize=3\n"
         f"stride=1\npad=1\nactivation={rng.choice(ACTS[:5])}\n",
         h, w, f0)

    n_body = int(rng.integers(4, 9))
    for _ in range(n_body):
        moves = ["conv", "conv"]
        if h % 2 == 0 and h >= 16:
            moves += ["conv_s2", "maxpool"]
        if h <= 32:
            moves.append("upsample")
        li = len(shapes)
        if li >= 3 and shapes[-1] == shapes[-3] and not aa[-3]:
            # (antialiased convs excluded: the reference's shortcut would
            # read their oversized stride-1 stale-tail buffer — our
            # builder rejects that combination loudly instead)
            moves.append("shortcut3")
        if li >= 2 and shapes[-1][:2] == shapes[-2][:2] \
                and not (aa[-1] or aa[-2]):
            # (routes compare the IR out dims, which for antialiased
            # convs are the pre-blur stride-1 dims — the reference
            # zeroes mismatched-size routes and the next layer aborts)
            moves.append("route2")
        if c % 2 == 0:
            if not aa[-1]:
                moves.append("route_groups")  # CSP-style partial split
            moves.append("conv_groups")
        if h >= 8:
            moves.append("conv_dil")
            if not no_dropout:                # train fuzz: rand() masks
                moves.append("dropout")       # inference: buffer-alias no-op
        if h % 2 == 0 and w % 2 == 0 and h >= 16 and c <= 16:
            moves.append("reorg3d")
            if not train_safe:
                moves.append("reorg_old")     # historical flat permutation
        if h % 2 == 0 and h >= 16:
            moves.append("conv_antialias")    # stride rewired into blur
            if not train_safe:
                moves.append("maxpool_aa")    # antialiased maxpool
        if w % 2 == 0 and w >= 16:
            moves.append("conv_asym")         # stride_x=2, stride_y=1
        if c <= 32 and not aa[-1]:
            # (scale_channels from= an antialiased conv trips the
            # reference's own dim asserts — its out_* are stride-1 dims)
            moves.append("se_block")          # avgpool->1x1->scale_channels
            if not train_safe:
                moves.append("scale_wh")      # per-pixel gate variant
        if not train_safe:
            if c % 2 == 0:
                moves.append("maxpool_depth")  # max over channel groups
            moves.append("maxpool_spp")       # size 3 stride 1, pad 0
            if w % 2 == 0 and w >= 16:
                moves.append("maxpool_asym")  # stride_x=2, stride_y=1
            if h % 2 == 0 and w % 2 == 0 and h >= 16:
                moves.append("upsample_rev")  # reverse=1: NN downsample
            moves.append("bn_layer")          # standalone [batchnorm]
            moves.append("act_layer")         # standalone [activation]
        mv = rng.choice(moves)
        act = rng.choice(ACTS)
        bn = int(rng.integers(0, 2))
        filters = int(rng.choice([8, 16, 24, 32]))
        ksz = int(rng.choice([1, 3]))
        if mv == "conv":
            emit(f"[convolutional]\nbatch_normalize={bn}\n"
                 f"filters={filters}\nsize={ksz}\nstride=1\npad=1\n"
                 f"activation={act}\n", h, w, filters)
        elif mv == "conv_s2":
            emit(f"[convolutional]\nbatch_normalize={bn}\n"
                 f"filters={filters}\nsize=3\nstride=2\npad=1\n"
                 f"activation={act}\n", h // 2, w // 2, filters)
        elif mv == "maxpool":
            emit("[maxpool]\nsize=2\nstride=2\n", h // 2, w // 2, c)
        elif mv == "upsample":
            emit("[upsample]\nstride=2\n", h * 2, w * 2, c)
        elif mv == "shortcut3":
            emit(f"[shortcut]\nfrom=-3\nactivation={rng.choice(ACTS[:5])}\n",
                 h, w, c)
        elif mv == "route_groups":
            gid = int(rng.integers(0, 2))
            emit(f"[route]\nlayers=-1\ngroups=2\ngroup_id={gid}\n",
                 h, w, c // 2)
        elif mv == "conv_groups":
            gf = int(rng.choice([8, 16, 32]))
            emit(f"[convolutional]\nbatch_normalize={bn}\nfilters={gf}\n"
                 f"size=3\nstride=1\npad=1\ngroups=2\nactivation={act}\n",
                 h, w, gf)
        elif mv == "conv_dil":
            emit(f"[convolutional]\nbatch_normalize={bn}\n"
                 f"filters={filters}\nsize=3\nstride=1\npad=2\n"
                 f"dilation=2\nactivation={act}\n", h, w, filters)
        elif mv == "reorg3d":
            emit("[reorg3d]\nstride=2\n", h // 2, w // 2, c * 4)
        elif mv == "dropout":
            # parser aliases the dropout output onto the previous layer's
            # buffer (parser.cpp:1235-1241); inference must be identity
            emit("[dropout]\nprobability=.3\n", h, w, c)
        elif mv == "conv_antialias":
            emit(f"[convolutional]\nbatch_normalize=1\n"
                 f"filters={filters}\nsize=3\nstride=2\npad=1\n"
                 f"antialiasing=1\nactivation={act}\n",
                 h // 2, w // 2, filters, is_aa=True)
        elif mv == "conv_asym":
            emit(f"[convolutional]\nbatch_normalize={bn}\n"
                 f"filters={filters}\nsize=3\nstride_x=2\nstride_y=1\n"
                 f"pad=1\nactivation={act}\n", h, w // 2, filters)
        elif mv == "se_block":
            fh, fw = h, w                     # emit() mutates h/w
            emit("[avgpool]\n", 1, 1, c)
            emit(f"[convolutional]\nfilters={c}\nsize=1\nstride=1\npad=0\n"
                 f"activation=logistic\n", 1, 1, c)
            # reuse the iteration's act draw (a fresh draw would shift
            # every later seed); the reference's scale_channels forward
            # uses plain activate_array — no swish/mish support
            sca = act if act in ("leaky", "relu", "logistic", "linear",
                                 "tanh") else "leaky"
            emit(f"[scale_channels]\nfrom=-3\nactivation={sca}\n",
                 fh, fw, c)
        elif mv == "scale_wh":
            # per-pixel gate (scale_channels_layer.c:22-33: prev c==1,
            # from same h/w): 1-channel logistic map scales the features
            fc = c                            # emit() mutates c
            emit(f"[convolutional]\nfilters=1\nsize=1\nstride=1\npad=0\n"
                 f"activation=logistic\n", h, w, 1)
            sca = act if act in ("leaky", "relu", "logistic", "linear",
                                 "tanh") else "leaky"
            emit(f"[scale_channels]\nfrom=-2\nscale_wh=1\n"
                 f"activation={sca}\n", h, w, fc)
        elif mv == "maxpool_depth":
            oc = c // 2
            emit(f"[maxpool]\nmaxpool_depth=1\nout_channels={oc}\n"
                 "size=2\nstride=1\n", h, w, oc)
        elif mv == "maxpool_spp":
            # stride-1 pool, EXPLICIT padding=0: the reference's CPU-AVX
            # stride-1 maxpool drops left-edge taps for the first 8
            # output columns when pad/2 > 0 (gemm.c:2126-2148 tests tap
            # validity only for the vector-base lane) — see
            # test_reference_avx_maxpool_left_edge_quirk; padding=0 keeps
            # every window in-range so the oracle binary is exact
            emit("[maxpool]\nsize=3\nstride=1\npadding=0\n",
                 h - 2, w - 2, c)
        elif mv == "maxpool_asym":
            emit("[maxpool]\nsize=2\nstride_x=2\nstride_y=1\n",
                 h, w // 2, c)
        elif mv == "maxpool_aa":
            emit("[maxpool]\nsize=2\nstride=2\nantialiasing=1\n",
                 h // 2, w // 2, c)
        elif mv == "upsample_rev":
            # reverse = NEGATIVE stride in this fork
            # (upsample_layer.c:19-25; a `reverse=` key is ignored with
            # an Unused-field warning)
            emit("[upsample]\nstride=-2\n", h // 2, w // 2, c)
        elif mv == "reorg_old":
            # the reference spells the old variant "[reorg]"
            # (parser.cpp:132; "[reorg3d]" is the new one)
            emit("[reorg]\nstride=2\n", h // 2, w // 2, c * 4)
        elif mv == "bn_layer":
            emit("[batchnorm]\n", h, w, c)
        elif mv == "act_layer":
            emit(f"[activation]\nactivation={act}\n", h, w, c)
        else:  # route2: concat previous two
            emit("[route]\nlayers=-1,-2\n", h, w,
                 shapes[-1][2] + shapes[-2][2])

    n_mask = 2
    f = n_mask * (5 + classes)
    emit(f"[convolutional]\nfilters={f}\nsize=1\nstride=1\npad=1\n"
         f"activation=linear\n", h, w, f)
    lines.append(f"[yolo]\nmask=0,1\nnum=3\nclasses={classes}\nmax=12\n"
                 "anchors=10,14, 23,27, 37,58\nscale_x_y=1.05\n")
    return "\n".join(lines)


@pytest.mark.parametrize("seed", [11, 23, 37, 41, 59, 67, 101, 137, 211,
                                  251, 263, 307, 331, 389, 401, 433, 467,
                                  499, 523, 571, 601, 643, 677, 709, 751,
                                  773, 809, 857, 907, 953, 977, 1009, 1049,
                                  1091, 1123, 1181, 1213, 1259, 1297,
                                  1327, 1381, 1423, 1453, 1489, 1531,
                                  1579, 1613])
def test_random_graph_parity(harness, tmp_path, rng, seed):
    cfg = random_cfg(seed)
    _compare(cfg, tmp_path, harness, rng, 64, atol_act=2e-5, thresh=0.2)


@pytest.mark.parametrize("seed", [17, 73, 131, 197, 229, 283, 353, 419,
                                  461, 509, 547, 587, 613, 653, 691, 727,
                                  757, 787, 821, 853, 883, 919, 947])
def test_random_graph_parity_nonsquare(harness, tmp_path, rng, seed):
    """Rectangular nets (width != height): every op's h/w handling."""
    cfg = random_cfg(seed, size=48, width=64)
    _compare(cfg, tmp_path, harness, rng, (48, 64), atol_act=2e-5,
             thresh=0.2)


@pytest.mark.parametrize("seed", [59, 331, 433])
def test_random_graph_resize_parity(harness, tmp_path, rng, seed):
    """Network.resize (the ResizeNetwork analogue, network.cpp:255-410):
    a random graph built at 64 and resized to 96 must match the binary
    parsing the SAME cfg at 96 directly — shapes re-derive through every
    op's resize semantics with parameters carried over unchanged."""
    import jax  # noqa: F401  (env check only)

    from darknet_tpu.config.cfg import patch_cfg_dims
    from darknet_tpu.nn.network import Network
    from tests.test_reference_parity import _run_reference

    cfg = random_cfg(seed)
    cfg_path = str(tmp_path / "m.cfg")
    with open(cfg_path, "w") as f:
        f.write(cfg)
    weights = str(tmp_path / "m.weights")
    Network.from_cfg(cfg_path, train=True, fuse=False,
                     seed=11).save_weights(weights)

    # ours: build at 64, RESIZE to 96 (params carry over)
    net = Network.from_cfg(cfg_path, weights=weights, fuse=True)
    net96 = net.resize(96, 96)
    assert (net96.net.w, net96.net.h) == (96, 96)

    # reference: parse the patched cfg at 96 (its ResizeNetwork re-derives
    # the same shapes the parser would)
    cfg96_path = str(tmp_path / "m96.cfg")
    with open(cfg96_path, "w") as f:
        f.write(patch_cfg_dims(cfg, 96, 96))

    x = rng.uniform(0, 1, (96, 96, 3)).astype(np.float32)
    _, ref_raw = _run_reference(harness, cfg96_path, weights, x, thresh=0.2)
    heads, _ = net96.forward_heads(x[None])
    ours_raw = np.transpose(np.asarray(heads[-1][0]), (2, 0, 1)).ravel()
    np.testing.assert_allclose(ours_raw, ref_raw, rtol=2e-3, atol=2e-5)

    # and against the binary's OWN ResizeNetwork path
    # (network.cpp:255-410 — the in-training multi-scale resize, distinct
    # from re-parsing the cfg at the new dims).  Antialiased graphs are
    # excluded: the reference's resize loop threads the PRE-blur dims
    # downstream (network.cpp:374-375 has no antialiasing case, unlike
    # its parse loop at parser.cpp:1383-1398) and never resizes the blur
    # sublayer, so its own resize disagrees with its own parser — see
    # test_reference_resize_antialias_quirk / PARITY DEVIATIONS #15.
    if "antialiasing=1" not in cfg:
        rz_raw = _run_reference_resize(harness, cfg_path, weights, 96, 96, x)
        np.testing.assert_allclose(ours_raw, rz_raw, rtol=2e-3, atol=2e-5,
                                   err_msg="vs the binary's ResizeNetwork")


def _run_reference_resize(harness, cfg_path, weights, w, h, x_hwc,
                          thresh=0.2):
    import struct
    import subprocess

    from tests.test_reference_parity import BUILD_DIR

    x_chw = np.ascontiguousarray(np.transpose(x_hwc, (2, 0, 1)))
    inb = os.path.join(BUILD_DIR, "rz_in.bin")
    outb = os.path.join(BUILD_DIR, "rz_out.bin")
    x_chw.astype("<f4").tofile(inb)
    r = subprocess.run([harness, "resize", cfg_path, weights, str(w),
                        str(h), inb, outb, str(thresh)],
                       capture_output=True, timeout=900, cwd=BUILD_DIR)
    assert r.returncode == 0, r.stderr[-500:]
    data = open(outb, "rb").read()
    nboxes, classes = struct.unpack("<ii", data[:8])
    off = 8 + nboxes * 4 * (5 + classes)
    (outs,) = struct.unpack("<i", data[off:off + 4])
    return np.frombuffer(data[off + 4:off + 4 + 4 * outs], dtype="<f4")


def test_reference_resize_antialias_quirk(harness, tmp_path, rng):
    """DOCUMENTED REFERENCE BUG (not reproduced): ResizeNetwork threads
    each layer's own out dims downstream (network.cpp:374-375) with NO
    antialiasing special-case, while the parse loop explicitly threads
    the blur sublayer's dims (parser.cpp:1383-1398) — and the blur
    sublayer itself is never resized.  So for any cfg with an
    antialiased layer, the reference's multi-scale resize path produces
    a DIFFERENT geometry than its own parser at the same dims (every
    post-antialias layer runs 2x per spatial dim).  Our resize
    re-derives shapes exactly like the parse loop.  Pinned here: on a
    seed-331 fuzz graph (antialiased maxpool), the binary's
    ResizeNetwork head is 4x the size of its own re-parse head."""
    from darknet_tpu.nn.network import Network
    from tests.test_reference_parity import _run_reference

    cfg = random_cfg(331)
    assert "antialiasing=1" in cfg
    cfg_path = str(tmp_path / "m.cfg")
    with open(cfg_path, "w") as f:
        f.write(cfg)
    weights = str(tmp_path / "m.weights")
    Network.from_cfg(cfg_path, train=True, fuse=False,
                     seed=11).save_weights(weights)

    from darknet_tpu.config.cfg import patch_cfg_dims

    cfg96_path = str(tmp_path / "m96.cfg")
    with open(cfg96_path, "w") as f:
        f.write(patch_cfg_dims(cfg, 96, 96))

    x = rng.uniform(0, 1, (96, 96, 3)).astype(np.float32)
    _, parse_raw = _run_reference(harness, cfg96_path, weights, x,
                                  thresh=0.2)
    resize_raw = _run_reference_resize(harness, cfg_path, weights, 96, 96,
                                       x)
    # the reference disagrees with itself: resize threads pre-blur dims
    assert resize_raw.size == 4 * parse_raw.size, \
        (resize_raw.size, parse_raw.size)
    # ours agrees with its parser (the consistent semantics)
    net96 = Network.from_cfg(cfg_path, weights=weights, fuse=True) \
        .resize(96, 96)
    heads, _ = net96.forward_heads(x[None])
    ours_raw = np.transpose(np.asarray(heads[-1][0]), (2, 0, 1)).ravel()
    np.testing.assert_allclose(ours_raw, parse_raw, rtol=2e-3, atol=2e-5)
