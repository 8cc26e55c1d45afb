import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visualdet3d_tpu.ops import (
    boxes_iou3d,
    concat_volume,
    correlation_volume_pallas,
    correlation_volume_xla,
    grid_sample,
    modulated_deform_conv,
    nms,
    rotated_iou,
    rotated_nms,
)


# ---------------------------------------------------------------- NMS

def _nms_numpy(boxes, scores, thr):
    """Plain greedy NMS reference (the torchvision.ops.nms contract)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            ix1 = max(boxes[i, 0], boxes[j, 0]); iy1 = max(boxes[i, 1], boxes[j, 1])
            ix2 = min(boxes[i, 2], boxes[j, 2]); iy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            ua = ((boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1]) +
                  (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1]) - inter)
            if inter / max(ua, 1e-8) > thr:
                suppressed[j] = True
    return keep


def test_nms_matches_greedy_reference():
    rng = np.random.default_rng(0)
    n = 80
    centers = rng.uniform(0, 100, size=(n, 2))
    wh = rng.uniform(5, 30, size=(n, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, size=(n,)).astype(np.float32)

    expected = _nms_numpy(boxes, scores, 0.5)
    keep_idx, keep_valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                               max_outputs=n, pre_top_k=n)
    got = [int(i) for i, v in zip(keep_idx, keep_valid) if v]
    assert got == expected


def test_nms_respects_valid_mask_and_padding():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    mask = jnp.asarray([True, True, False])
    keep_idx, keep_valid = nms(boxes, scores, 0.5, max_outputs=3, pre_top_k=3,
                               valid_mask=mask)
    got = [int(i) for i, v in zip(keep_idx, keep_valid) if v]
    assert got == [0]
    assert int(keep_idx[-1]) == -1


# ---------------------------------------------------------------- grid_sample

def test_grid_sample_identity():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    ys, xs = np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 12), indexing='ij')
    grid = np.stack([xs, ys], axis=-1)[None].repeat(2, axis=0).astype(np.float32)
    out = grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=True)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)


def test_grid_sample_interpolates_midpoint():
    img = np.zeros((1, 2, 2, 1), np.float32)
    img[0, :, :, 0] = [[0, 1], [2, 3]]
    grid = np.zeros((1, 1, 1, 2), np.float32)  # center
    out = grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=True)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], 1.5, atol=1e-6)


# ---------------------------------------------------------------- cost volume

def _corr_numpy(left, right, d_max):
    b, h, w, c = left.shape
    out = np.zeros((b, h, w, d_max), np.float32)
    for d in range(d_max):
        for wi in range(d, w):
            out[:, :, wi, d] = (left[:, :, wi] * right[:, :, wi - d]).mean(-1)
    return out


def test_correlation_volume_xla_matches_naive():
    rng = np.random.default_rng(2)
    left = rng.standard_normal((2, 4, 16, 8)).astype(np.float32)
    right = rng.standard_normal((2, 4, 16, 8)).astype(np.float32)
    out = correlation_volume_xla(jnp.asarray(left), jnp.asarray(right), 6)
    np.testing.assert_allclose(np.asarray(out), _corr_numpy(left, right, 6), atol=1e-5)


def test_correlation_volume_pallas_matches_xla():
    rng = np.random.default_rng(3)
    left = rng.standard_normal((2, 4, 32, 16)).astype(np.float32)
    right = rng.standard_normal((2, 4, 32, 16)).astype(np.float32)
    ref = correlation_volume_xla(jnp.asarray(left), jnp.asarray(right), 8)
    interpret = jax.default_backend() != 'tpu'
    out = correlation_volume_pallas(jnp.asarray(left), jnp.asarray(right), 8,
                                    interpret=interpret)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_correlation_volume_interleaved_matches_split():
    """Interleaved-eye kernel == split+corr, incl. a non-dividing H tail
    (H=12, TR=8 on TPU) and the custom-VJP backward."""
    from visualdet3d_tpu.ops.cost_volume import (
        correlation_volume_pallas_interleaved, correlation_volume_interleaved)

    rng = np.random.default_rng(7)
    interpret = jax.default_backend() != 'tpu'
    for h in (8, 12):
        both = rng.standard_normal((4, h, 32, 16)).astype(np.float32)
        ref = correlation_volume_xla(jnp.asarray(both[0::2]),
                                     jnp.asarray(both[1::2]), 8)
        out = correlation_volume_pallas_interleaved(jnp.asarray(both), 8,
                                                    interpret=interpret)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    both = jnp.asarray(rng.standard_normal((4, 8, 32, 16)).astype(np.float32))
    g_ref = jax.grad(lambda x: jnp.sum(
        correlation_volume_xla(x[0::2], x[1::2], 8) ** 2))(both)
    g_out = jax.grad(lambda x: jnp.sum(
        correlation_volume_interleaved(x, 8, use_pallas=False) ** 2))(both)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), atol=1e-5)


def test_concat_volume_semantics():
    rng = np.random.default_rng(4)
    left = rng.standard_normal((1, 2, 8, 3)).astype(np.float32)
    right = rng.standard_normal((1, 2, 8, 3)).astype(np.float32)
    vol = np.asarray(concat_volume(jnp.asarray(left), jnp.asarray(right), 3))
    assert vol.shape == (1, 3, 2, 8, 6)
    # d=0: plain concat
    np.testing.assert_allclose(vol[0, 0, :, :, :3], left[0], atol=1e-6)
    np.testing.assert_allclose(vol[0, 0, :, :, 3:], right[0], atol=1e-6)
    # d=2: left masked below w=2, right shifted
    assert np.all(vol[0, 2, :, :2] == 0)
    np.testing.assert_allclose(vol[0, 2, :, 2:, :3], left[0, :, 2:], atol=1e-6)
    np.testing.assert_allclose(vol[0, 2, :, 2:, 3:], right[0, :, :-2], atol=1e-6)


# ---------------------------------------------------------------- deform conv

def test_modulated_deform_conv_zero_offset_equals_conv():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 9, 11, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    offset = np.zeros((2, 9, 11, 18), np.float32)
    mask = np.ones((2, 9, 11, 9), np.float32)
    out = modulated_deform_conv(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), jnp.asarray(w), padding=1)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), window_strides=(1, 1), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_modulated_deform_conv_integer_shift():
    """Offset of exactly (0, +1) on every tap shifts the sampling grid right."""
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 6, 8, 2)).astype(np.float32)
    w = rng.standard_normal((3, 3, 2, 3)).astype(np.float32)
    offset = np.zeros((1, 6, 8, 18), np.float32)
    offset[..., 1::2] = 1.0  # dx = +1
    mask = np.ones((1, 6, 8, 9), np.float32)
    out = modulated_deform_conv(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), jnp.asarray(w), padding=1)
    # equivalent to convolving the left-shifted image
    x_shift = np.concatenate([x[:, :, 1:], np.zeros_like(x[:, :, :1])], axis=2)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x_shift), jnp.asarray(w), window_strides=(1, 1), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    # interior columns must match (border columns differ by zero-padding)
    np.testing.assert_allclose(np.asarray(out)[:, 1:-1, 1:-2],
                               np.asarray(ref)[:, 1:-1, 1:-2], atol=1e-4)


def test_modulated_deform_conv_matches_reference_formulation():
    """Fast pair-gather formulation == naive per-corner formulation, for
    fractional / far-out-of-image offsets, strides, dilations, and grads."""
    from visualdet3d_tpu.ops.deform_conv import modulated_deform_conv_reference
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 10, 14, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 5)).astype(np.float32) * 0.1)
    msk = jnp.asarray(rng.uniform(0, 1, (2, 10, 14, 9)).astype(np.float32))
    for scale in (0.7, 3.0, 30.0):
        off = jnp.asarray(
            rng.uniform(-scale, scale, (2, 10, 14, 18)).astype(np.float32))
        ref = np.asarray(modulated_deform_conv_reference(x, off, msk, w))
        got = np.asarray(modulated_deform_conv(x, off, msk, w))
        np.testing.assert_allclose(got, ref, atol=2e-5)
    # stride 2
    off2 = jnp.asarray(rng.uniform(-2, 2, (2, 5, 7, 18)).astype(np.float32))
    msk2 = jnp.asarray(rng.uniform(0, 1, (2, 5, 7, 9)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(modulated_deform_conv(x, off2, msk2, w, stride=2)),
        np.asarray(modulated_deform_conv_reference(x, off2, msk2, w, stride=2)),
        atol=2e-5)
    # dilation 2
    off3 = jnp.asarray(rng.uniform(-2, 2, (2, 10, 14, 18)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(modulated_deform_conv(x, off3, msk, w, padding=2, dilation=2)),
        np.asarray(modulated_deform_conv_reference(x, off3, msk, w, padding=2,
                                                   dilation=2)),
        atol=2e-5)
    # offset gradients agree (bilinear corner-weight derivative path)
    g_fast = jax.grad(lambda o: jnp.sum(modulated_deform_conv(x, o, msk, w) ** 2))(off3)
    g_ref = jax.grad(lambda o: jnp.sum(
        modulated_deform_conv_reference(x, o, msk, w) ** 2))(off3)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=2e-4)


def test_modulated_deform_conv_packed_bf16_path():
    """bf16 + c_in=64 exercises the packed-u32 fused Pallas lerp-matmul
    inference branch (_packed_conv; interpret mode on CPU). Asserts the
    packed branch is actually taken and matches both the pair-gather path
    (VD3D_DCN_IMPL=pairs) and the f32 reference within bf16 tolerance."""
    import os
    from visualdet3d_tpu.ops.deform_conv import (
        _packed_ok, modulated_deform_conv_reference)
    rng = np.random.default_rng(9)
    b, h, w_, c = 1, 8, 16, 64
    x32 = rng.standard_normal((b, h, w_, c)).astype(np.float32)
    wt32 = (rng.standard_normal((3, 3, c, 64)) * 0.05).astype(np.float32)
    off32 = rng.uniform(-3, 3, (b, h, w_, 18)).astype(np.float32)
    msk32 = rng.uniform(0, 1, (b, h, w_, 9)).astype(np.float32)

    assert _packed_ok(h * w_, c, 64, jnp.bfloat16), \
        'fixture must hit the packed branch'

    x16 = jnp.asarray(x32, jnp.bfloat16)
    wt16 = jnp.asarray(wt32, jnp.bfloat16)
    off16 = jnp.asarray(off32, jnp.bfloat16)
    msk16 = jnp.asarray(msk32, jnp.bfloat16)

    assert os.environ.get('VD3D_DCN_IMPL', 'packed') == 'packed'
    packed = np.asarray(modulated_deform_conv(x16, off16, msk16, wt16)
                        ).astype(np.float32)
    os.environ['VD3D_DCN_IMPL'] = 'pairs'
    try:
        pairs = np.asarray(modulated_deform_conv(x16, off16, msk16, wt16)
                           ).astype(np.float32)
    finally:
        os.environ.pop('VD3D_DCN_IMPL')
    ref32 = np.asarray(modulated_deform_conv_reference(
        jnp.asarray(x32), jnp.asarray(off32), jnp.asarray(msk32),
        jnp.asarray(wt32)))

    scale = np.abs(ref32).max()
    # packed and pairs both consume identical bf16 inputs; their outputs may
    # differ only by accumulation order / lerp formulation at bf16 ULP scale
    np.testing.assert_allclose(packed, pairs, atol=0.03 * scale)
    # and both must track the f32 reference within bf16 rounding of inputs
    np.testing.assert_allclose(packed, ref32, atol=0.06 * scale)


def test_modulated_deform_conv_packed_f32_path():
    """f32 + c_in%32==0 exercises the 4C-corner fused Pallas path
    (_packed_f32_conv; interpret mode on CPU): exact vs the naive corner
    formulation, including far-out offsets and gradients (pairs-recompute
    backward)."""
    from visualdet3d_tpu.ops.deform_conv import (
        _packed_f32_ok, modulated_deform_conv_reference)
    rng = np.random.default_rng(10)
    b, h, w_, c = 1, 8, 16, 32
    x = jnp.asarray(rng.standard_normal((b, h, w_, c)).astype(np.float32))
    wt = jnp.asarray((rng.standard_normal((3, 3, c, 48)) * 0.1).astype(np.float32))
    off = jnp.asarray(rng.uniform(-4, 4, (b, h, w_, 18)).astype(np.float32))
    msk = jnp.asarray(rng.uniform(0, 1, (b, h, w_, 9)).astype(np.float32))

    assert _packed_f32_ok(h * w_, c, 48, jnp.float32), \
        'fixture must hit the f32 packed branch'
    got = np.asarray(modulated_deform_conv(x, off, msk, wt))
    ref = np.asarray(modulated_deform_conv_reference(x, off, msk, wt))
    np.testing.assert_allclose(got, ref, atol=3e-5)

    # gradients flow through the pairs-recompute custom VJP
    g_got = jax.grad(lambda o: jnp.sum(
        modulated_deform_conv(x, o, msk, wt) ** 2))(off)
    g_ref = jax.grad(lambda o: jnp.sum(
        modulated_deform_conv_reference(x, o, msk, wt) ** 2))(off)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=2e-4)


def test_modulated_deform_conv_premul_path():
    """bf16 channel-REDUCING DCN (c_out < c_in) exercises the pre-multiply
    branch (_premul_conv: lerp(X) @ Wk == lerp(X @ Wk), gathered in
    output-channel space). Parity vs the f32 naive formulation within bf16
    tolerance + grads via the pairs-recompute VJP."""
    from visualdet3d_tpu.ops.deform_conv import (
        _premul_ok, modulated_deform_conv_reference)
    rng = np.random.default_rng(11)
    b, h, w_, c, cout = 1, 8, 16, 128, 64
    x32 = rng.standard_normal((b, h, w_, c)).astype(np.float32)
    wt32 = (rng.standard_normal((3, 3, c, cout)) * 0.05).astype(np.float32)
    off32 = rng.uniform(-3, 3, (b, h, w_, 18)).astype(np.float32)
    msk32 = rng.uniform(0, 1, (b, h, w_, 9)).astype(np.float32)

    import os
    os.environ['VD3D_DCN_PREMUL'] = '1'  # opt-in path (off by default)
    try:
        assert _premul_ok(h * w_, c, cout, jnp.bfloat16), \
            'fixture must hit the premul branch'
        _run_premul_case(x32, wt32, off32, msk32)
    finally:
        os.environ.pop('VD3D_DCN_PREMUL', None)


def _run_premul_case(x32, wt32, off32, msk32):
    from visualdet3d_tpu.ops.deform_conv import modulated_deform_conv_reference
    x16 = jnp.asarray(x32, jnp.bfloat16)
    wt16 = jnp.asarray(wt32, jnp.bfloat16)
    off16 = jnp.asarray(off32, jnp.bfloat16)
    msk16 = jnp.asarray(msk32, jnp.bfloat16)
    got = np.asarray(modulated_deform_conv(x16, off16, msk16, wt16)
                     ).astype(np.float32)
    ref = np.asarray(modulated_deform_conv_reference(
        jnp.asarray(x32), jnp.asarray(off32), jnp.asarray(msk32),
        jnp.asarray(wt32)))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=0.08 * scale)

    g = jax.grad(lambda o: jnp.sum(
        modulated_deform_conv(x16, o, msk16, wt16).astype(jnp.float32) ** 2))(
        off16)
    assert np.all(np.isfinite(np.asarray(g, np.float32)))


def test_modulated_deform_conv_packed_train_grads():
    """The bf16 TRAINING path now uses _packed_conv with its direct Pallas
    backward (r4). Gate: every gradient (image, offset, mask, weight) must
    track the f32 pairs-path oracle at least as well as the bf16 pairs
    path itself does — i.e. the new backward adds no error beyond the bf16
    noise floor, measured per-run (rtm3d grad-parity style)."""
    import os
    from visualdet3d_tpu.ops.deform_conv import _packed_ok
    rng = np.random.default_rng(3)
    b, h, w_, c, co = 2, 8, 16, 64, 64
    x32 = rng.standard_normal((b, h, w_, c)).astype(np.float32)
    off32 = rng.uniform(-3.5, 3.5, (b, h, w_, 18)).astype(np.float32)
    msk32 = rng.uniform(0, 1, (b, h, w_, 9)).astype(np.float32)
    wt32 = (rng.standard_normal((3, 3, c, co)) * 0.05).astype(np.float32)
    assert _packed_ok(h * w_, c, co, jnp.bfloat16)

    def grads(args, train_packed):
        os.environ['VD3D_DCN_TRAIN_PACKED'] = '1' if train_packed else '0'
        try:
            return jax.grad(
                lambda x_, o_, m_, k_: jnp.sum(modulated_deform_conv(
                    x_, o_, m_, k_, train=True) ** 2),
                argnums=(0, 1, 2, 3))(*args)
        finally:
            os.environ.pop('VD3D_DCN_TRAIN_PACKED')

    a16 = tuple(jnp.asarray(v, jnp.bfloat16)
                for v in (x32, off32, msk32, wt32))
    a32 = tuple(jnp.asarray(v) for v in (x32, off32, msk32, wt32))
    g_packed = grads(a16, True)
    g_pairs = grads(a16, False)
    g_oracle = grads(a32, False)

    for name, gp, gq, go in zip(('dx', 'doff', 'dmask', 'dw'),
                                g_packed, g_pairs, g_oracle):
        gp = np.asarray(gp, np.float64)
        gq = np.asarray(gq, np.float64)
        go = np.asarray(go, np.float64)
        scale = np.abs(go).max() + 1e-9
        floor = np.abs(gq - go).max() / scale        # bf16 pairs noise
        err = np.abs(gp - go).max() / scale
        assert err <= max(1.5 * floor, 1e-6), (name, err, floor)


def test_modulated_deform_conv_split_gather_exact(monkeypatch):
    """Per-batch-item split gathers (the r4 gather-locality win: 2.7 vs
    10.6 ns/slice on >32 MB operands, tools/probe_gather_height.py) must be
    bit-identical to the batched-gather form in fwd AND every training grad.
    Small shapes never cross the real threshold, so force it to 0 here."""
    import importlib
    dc = importlib.import_module('visualdet3d_tpu.ops.deform_conv')
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((3, 8, 10, 64)).astype(np.float32))
    off = jnp.asarray(rng.uniform(-2, 2, (3, 8, 10, 18)).astype(np.float32))
    msk = jnp.asarray(rng.uniform(0, 1, (3, 8, 10, 9)).astype(np.float32))
    w = jnp.asarray((0.05 * rng.standard_normal((3, 3, 64, 32))).astype(np.float32))

    def loss(*a):
        return jnp.sum(dc.modulated_deform_conv(*a, train=True) ** 2)

    ref_fwd = dc.modulated_deform_conv(x, off, msk, w)
    ref_g = jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, msk, w)
    monkeypatch.setattr(dc, '_SPLIT_GATHER_MIN_BYTES', 0)
    monkeypatch.setattr(dc, '_SPLIT_GATHER_MIN_SLICES', 0)
    split_fwd = dc.modulated_deform_conv(x, off, msk, w)
    split_g = jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, msk, w)
    np.testing.assert_array_equal(np.asarray(ref_fwd), np.asarray(split_fwd))
    for a, b in zip(ref_g, split_g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_gather_predicate_geometry():
    """The split fires for KM3D's stride-4/-8 DCN geometries (large per-item
    slice counts: the measured 2.1x locality win) but NOT for the stereo
    head's 18x80 DCN, whose 13k-slice/item split regressed the r4 flagship
    bench ~25% (BENCH_r04 349.8 vs the pre-split 466.5 fps). Counts the
    gather ops in the jaxpr of _gather_rows at each geometry."""
    import importlib
    dc = importlib.import_module('visualdet3d_tpu.ops.deform_conv')

    def n_gathers(b, r, c_u32, n):
        src = jax.ShapeDtypeStruct((b, r, c_u32), jnp.uint32)
        start = jax.ShapeDtypeStruct((b, n, 1), jnp.int32)
        jaxpr = jax.make_jaxpr(dc._gather_rows)(src, start)
        return sum(1 for e in jaxpr.jaxpr.eqns if e.primitive.name == 'gather')

    # KM3D stride-4: 96x320 map, 64 ch packed (2C u32 cols), 9 taps/pos.
    assert n_gathers(16, (96 + 4) * (320 + 4), 64, 96 * 320 * 9) == 16
    # Stereo head: 18x80 map, 1408 ch -> huge operand but only 13k slices.
    assert n_gathers(16, (18 + 4) * (80 + 4), 1408, 18 * 80 * 9) == 1
    # Small operand (batch 1-ish): always batched.
    assert n_gathers(2, 32, 64, 9 * 64) == 1


def test_modulated_deform_conv_is_differentiable():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 5, 5, 2)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 2)).astype(np.float32))
    offset = jnp.asarray(0.3 * rng.standard_normal((1, 5, 5, 18)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (1, 5, 5, 9)).astype(np.float32))

    def loss(params):
        x_, off_, m_, w_ = params
        return jnp.sum(modulated_deform_conv(x_, off_, m_, w_) ** 2)

    grads = jax.grad(loss)((x, offset, mask, w))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


# ---------------------------------------------------------------- rotated IoU

def test_rotated_iou_axis_aligned_matches_2d():
    a = jnp.asarray([[5.0, 5.0, 10.0, 10.0, 0.0]])
    b = jnp.asarray([[10.0, 5.0, 10.0, 10.0, 0.0]])
    iou = rotated_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou)[0, 0], 50.0 / 150.0, atol=1e-5)


def test_rotated_iou_45_degrees():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    np.testing.assert_allclose(np.asarray(rotated_iou(a, b))[0, 0], expect, atol=1e-4)


def test_rotated_iou_rotation_invariant_self():
    boxes = jnp.asarray([[3.0, -2.0, 4.0, 2.0, 0.7]])
    np.testing.assert_allclose(np.asarray(rotated_iou(boxes, boxes))[0, 0], 1.0, atol=1e-4)


def test_boxes_iou3d_identical_and_disjoint():
    a = jnp.asarray([[0.0, 1.5, 10.0, 1.6, 1.5, 3.9, 0.3]])
    b = jnp.asarray([[0.0, 1.5, 10.0, 1.6, 1.5, 3.9, 0.3],
                     [50.0, 1.5, 10.0, 1.6, 1.5, 3.9, 0.3]])
    iou = np.asarray(boxes_iou3d(a, b))
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(iou[0, 1], 0.0, atol=1e-6)


def test_boxes_iou3d_height_overlap():
    # same BEV rect, half-overlapping height spans
    a = jnp.asarray([[0.0, 2.0, 10.0, 2.0, 2.0, 4.0, 0.0]])  # y in [0, 2]
    b = jnp.asarray([[0.0, 3.0, 10.0, 2.0, 2.0, 4.0, 0.0]])  # y in [1, 3]
    iou = np.asarray(boxes_iou3d(a, b))[0, 0]
    np.testing.assert_allclose(iou, 1.0 / 3.0, atol=1e-4)


def test_rotated_nms_suppresses():
    boxes = jnp.asarray([
        [0.0, 0.0, 4.0, 2.0, 0.0],
        [0.1, 0.0, 4.0, 2.0, 0.05],   # near-duplicate of box 0
        [20.0, 0.0, 4.0, 2.0, 1.0],
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep, valid = rotated_nms(boxes, scores, 0.3, max_outputs=3)
    got = [int(i) for i, v in zip(keep, valid) if v]
    assert got == [0, 2]
