"""Post-training int8 quantization for the inference conv trunk.

Rationale (r4): the v5e MXU does 394 int8 TOPS vs 197 bf16 TFLOP/s, and the
stereo flagship's head/pyramid 3x3 convs already run at ~94% of bf16 peak
(tools/bench_head_conv.py) — quantization is the only remaining throughput
lever at those shapes. Measured on chip (tools/bench_int8_chain.py): a
chain of 1408-ch 3x3 convs with fused quantize epilogues runs 1.97x bf16;
1152-ch 2.04x; low-channel stride-2 convs regress (0.79x) and are excluded
by the selection rule.

Scheme: symmetric int8, per-OUTPUT-CHANNEL weight scales, per-TENSOR
activation scales calibrated offline (absmax over calibration batches).
Static scales keep the quantize step (scale+round+clip+cast) a pure
elementwise epilogue that XLA fuses into the producer, so a quantized conv
is: int8 gemm -> int32 -> f32 scale (+bias) -> next op. Zero-padding is
exact under symmetric quantization (0 -> 0).

Mechanics: no model-definition changes. Selected ``nn.Conv`` kernels (and
biases) are MOVED out of ``params`` into an int8 ``quant`` collection by
:func:`quantize_variables` (host-side, applied AFTER BN folding —
models/fold_bn.py — so the folded f32 kernels are what gets quantized).
At predict time a flax method interceptor (``nn.intercept_methods``, the
same mechanism fold_bn uses for pair detection) replaces each selected
conv's computation with the int8 path; everything else (correlation
volumes, DCN, decode, BN shifts) runs bf16/f32 untouched.

The quantized-variables artifact is inference-only: training and
f32/bf16 predict must use the unquantized variables.

reference anchor: the benchmark forward this accelerates is
visualDet3D/networks/detectors/yolostereo3d_core.py:110-126.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

QUANT_COLLECTION = 'quant'

PathT = Tuple[str, ...]


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _norm_padding(padding):
    """nn.Conv padding attr -> lax.conv_general_dilated padding arg."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * 2
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def _s2d_enabled() -> bool:
    """VD3D_INT8_S2D=1 also quantizes stride-2 convs via the exact
    space-to-depth reformulation (stride-2 KxK == stride-1 ceil(K/2)^2 over
    the 2x2-block-to-channel transform): the DIRECT stride-2 int8 emitter
    was a measured 0.79x regression (tools/bench_int8_chain.py), which is
    why plain stride-2 stays excluded."""
    import os
    return os.environ.get('VD3D_INT8_S2D', '') == '1'


def _min_channels() -> int:
    """VD3D_INT8_MINCH (default 64): smallest cin/cout a conv needs to be
    quantized. The 64-ch convs are memory-bound (~49 TOPS measured in the
    r5 stereo profile — nowhere near the 394 int8 peak) and quantizing
    layer1 drags an int8 (4,1)-retile layout dance into the stem (the
    2.26 ms {3,0,2,1}->{3,2,1,0} relu fusion + slow maxpool); 128 keeps
    layer1 bf16 to test whether the restored stem layout wins more."""
    import os
    return int(os.environ.get('VD3D_INT8_MINCH', '64'))


def default_select(mod: nn.Module, x, deny: frozenset,
                   min_channels: Optional[int] = None,
                   s2d: Optional[bool] = None) -> bool:
    """Quantize 2-D, ungrouped, stride-1 convs with cin/cout >= min_channels.

    The channel/stride bounds come straight from tools/bench_int8_chain.py:
    below 64 channels the int8 conv emitter wins little, and stride-2 at 64
    channels is a measured 0.79x regression. ``deny`` excludes the final
    prediction convs (raw logits / regression outputs keep bf16 precision).
    Stride-2 convs join via the s2d reformulation when ``s2d`` (default
    VD3D_INT8_S2D=1), with no kernel dilation (the s2d identity assumes
    dense taps). ``min_channels``/``s2d`` default to the env knobs so
    direct callers (tests, tools) keep the env-only behavior; the config
    surface threads them through Int8InferenceMixin._int8_select_opts.
    """
    minch = _min_channels() if min_channels is None else min_channels
    if not (isinstance(mod, nn.Conv)
            and len(mod.kernel_size) == 2
            and mod.feature_group_count == 1
            and hasattr(x, 'ndim') and x.ndim == 4
            and x.shape[-1] >= minch and mod.features >= minch
            and tuple(mod.path) not in deny):
        return False
    strides = _pair(mod.strides or 1)
    if strides == (1, 1):
        return True
    s2d_on = _s2d_enabled() if s2d is None else s2d
    return (strides == (2, 2) and s2d_on
            and _pair(mod.kernel_dilation or 1) == (1, 1))


def record_act_absmax(apply_fn: Callable, variables, batches: Iterable[tuple],
                      deny: frozenset = frozenset(),
                      select: Callable = None) -> Dict[PathT, float]:
    """Calibration: per-conv input absmax over ``batches``.

    apply_fn(variables, *batch) must apply the net in eval mode. Returns
    {conv_path: float absmax} for every conv ``select`` (default
    :func:`default_select`) picks.
    """
    select = select or default_select

    def one(variables, *batch):
        rec: Dict[PathT, jnp.ndarray] = {}

        def interceptor(next_fn, args, kwargs, context):
            mod = context.module
            if (context.method_name == '__call__'
                    and select(mod, args[0], deny)):
                rec[tuple(mod.path)] = jnp.max(
                    jnp.abs(args[0].astype(jnp.float32)))
            return next_fn(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            apply_fn(variables, *batch)
        return rec

    fn = jax.jit(one)
    out: Dict[PathT, float] = {}
    for batch in batches:
        rec = jax.device_get(fn(variables, *batch))
        for k, v in rec.items():
            out[k] = max(out.get(k, 0.0), float(v))
    return out


def _get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def quantize_variables(variables, act_absmax: Dict[PathT, float],
                       trace_fn: Callable, *trace_args,
                       deny: frozenset = frozenset(),
                       select: Callable = None):
    """Return inference-only variables with selected convs quantized.

    ``variables`` must be the FOLDED f32 variables (fold_inference_variables
    first). Selected conv kernels/biases move from ``params`` into the
    ``quant`` collection as {kernel_q int8 [kh,kw,cin,cout], w_scale f32
    [cout], act_scale f32 [], bias? f32 [cout]}. trace_fn(variables,
    *trace_args) applies the net in eval mode and is only shape-traced.
    """
    from flax.core import unfreeze

    select = select or default_select
    selected = set()

    def interceptor(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        mod = context.module
        if (context.method_name == '__call__'
                and select(mod, args[0], deny)
                and tuple(mod.path) in act_absmax):
            selected.add(tuple(mod.path))
        return out

    with nn.intercept_methods(interceptor):
        # trace through a FRESH function object: jax.eval_shape caches the
        # trace per function identity, so re-quantizing with the same
        # trace_fn (e.g. after toggling VD3D_INT8_S2D/VD3D_INT8_ALL in one
        # process) would otherwise hit the cache, skip the interceptor, and
        # silently select nothing.
        jax.eval_shape(lambda v, *a: trace_fn(v, *a), variables, *trace_args)

    params = unfreeze(variables['params'])
    quant: dict = {}
    for path in sorted(selected):
        node = _get(params, path)
        k = np.asarray(node.pop('kernel'), np.float32)
        w_scale = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-12) / 127.0
        k_q = np.clip(np.rint(k / w_scale), -127, 127).astype(np.int8)
        entry = {
            'kernel_q': jnp.asarray(k_q),
            'w_scale': jnp.asarray(w_scale.astype(np.float32)),
            'act_scale': jnp.asarray(
                np.float32(max(act_absmax[path], 1e-12) / 127.0)),
        }
        if 'bias' in node:
            entry['bias'] = jnp.asarray(
                np.asarray(node.pop('bias'), np.float32))
        _set(quant, path, entry)

    out = dict(variables)
    out['params'] = params
    out[QUANT_COLLECTION] = quant
    _store_block_fusions(out, quant)
    return out


def flatten_quant(quant) -> Dict[PathT, dict]:
    """Nested quant collection -> {conv_path: entry} lookup."""
    flat: Dict[PathT, dict] = {}

    def walk(node, path):
        if isinstance(node, dict) and 'kernel_q' in node:
            flat[path] = node
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))

    walk(dict(quant), ())
    return flat


def _resolve_padding(padding, in_hw, k_hw, strides):
    """nn.Conv padding -> numeric [(pt,pb),(pl,pr)] (XLA SAME semantics)."""
    if padding == 'VALID':
        return [(0, 0), (0, 0)]
    if padding == 'SAME':
        out = []
        for d, k, s in zip(in_hw, k_hw, strides):
            o = -(-d // s)
            total = max((o - 1) * s + k - d, 0)
            out.append((total // 2, total - total // 2))
        return out
    return _norm_padding(padding)


def _s2d_conv_int8(xq, kq, padding):
    """Exact stride-2 int8 conv as space-to-depth + stride-1 VALID conv.

    O[y,x] = sum_{dy,dx} X'[2y+dy, 2x+dx] W[dy,dx] with dy = 2q+a maps onto
    a ceil(K/2)^2 stride-1 conv over Y[u,v,(a,b,c)] = X'[2u+a, 2v+b, c] with
    W2[q,r,(a,b,c),o] = W[2q+a, 2r+b, c, o] (zero-padded where 2q+a >= K).
    Integer arithmetic is reassociated only — bit-identical int32 results.
    The point: the stride-1 form keeps the int8 MXU emitter on its fast
    path (the direct stride-2 emitter measured 0.79x bf16,
    tools/bench_int8_chain.py) and quadruples the contraction depth.
    """
    b, h, w, c = xq.shape
    kh, kw, _, co = kq.shape
    (pt, pb), (pl, pr) = padding
    oh = (h + pt + pb - kh) // 2 + 1
    ow = (w + pl + pr - kw) // 2 + 1
    k2h, k2w = -(-kh // 2), -(-kw // 2)
    hp, wp = h + pt + pb, w + pl + pr
    xp = jnp.pad(xq, ((0, 0), (pt, pb + hp % 2), (pl, pr + wp % 2), (0, 0)))
    u, v = (hp + hp % 2) // 2, (wp + wp % 2) // 2
    y = xp.reshape(b, u, 2, v, 2, c).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b, u, v, 4 * c)
    kp = jnp.pad(kq, ((0, 2 * k2h - kh), (0, 2 * k2w - kw), (0, 0), (0, 0)))
    k2 = kp.reshape(k2h, 2, k2w, 2, c, co).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(k2h, k2w, 4 * c, co)
    acc = jax.lax.conv_general_dilated(
        y, k2, (1, 1), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    return acc[:, :oh, :ow]


def _int8_conv(mod: nn.Conv, x, entry, compute_dtype):
    inv = 1.0 / entry['act_scale']
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                  -127, 127).astype(jnp.int8)
    strides = _pair(mod.strides or 1)
    if strides == (2, 2) and _pair(mod.kernel_dilation or 1) == (1, 1):
        padding = _resolve_padding(mod.padding, x.shape[1:3],
                                   mod.kernel_size, strides)
        acc = _s2d_conv_int8(xq, entry['kernel_q'], padding)
    else:
        acc = jax.lax.conv_general_dilated(
            xq, entry['kernel_q'],
            window_strides=strides,
            padding=_norm_padding(mod.padding),
            rhs_dilation=_pair(mod.kernel_dilation or 1),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=mod.feature_group_count,
            preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (entry['w_scale'] * entry['act_scale'])
    if 'bias' in entry:
        y = y + entry['bias']
    return y.astype(compute_dtype)


BLOCK_FUSE_KEY = 'block_fuse'


def _store_block_fusions(variables, quant: dict) -> None:
    """Detect fusable identity-shortcut BasicBlocks and store their fused
    BN affines in the quant collection (under ``<block path>/block_fuse``).

    Motivation (r5 stereo int8 profile, docs/int8_roofline.md): the 64-ch
    layer1 region spends ~9.2 of 45.7 ms on HBM round-trips XLA inserts
    *around* the int8 convs — raw s32 conv outputs materialized before
    their requant, plus f32 tensors from the BatchNorm modules' dtype
    promotion on the residual path. Computing the whole block
    (quantize -> s8 conv -> scale+shift -> relu -> quantize -> s8 conv ->
    scale+shift -> +identity -> relu) as one flat elementwise-between-convs
    chain gives XLA single-consumer epilogues it can fuse.

    Detection runs HERE, at quantize time, on concrete values: under jit
    the predict path sees only tracers, so the data-dependent check (the
    paired BatchNorms must be the pure per-channel affines fold_batchnorm
    leaves behind: var' == 1 - eps, so BN(x) == x*scale - mean'*scale +
    bias) cannot run at trace time. The stored entries ride the quant
    collection (f32-exempt from the bf16 inference cast, saved/loaded with
    the artifact); :func:`collect_block_entries` is then purely structural.
    Whether the fused path is USED stays a runtime knob
    (VD3D_INT8_BLOCK / cfg.int8_block). reference anchor: the block
    structure, visualDet3D/networks/backbones/resnet.py:23-53.
    """
    stats = variables.get('batch_stats', {})
    params = variables.get('params', {})
    qflat = flatten_quant(quant)
    for path in list(qflat):
        if path[-1] != 'Conv_0':
            continue
        bp = path[:-1]
        e1, e2 = qflat.get(bp + ('Conv_0',)), qflat.get(bp + ('Conv_1',))
        if e1 is None or e2 is None:
            continue
        k1 = np.asarray(e1['kernel_q'])
        k2 = np.asarray(e2['kernel_q'])
        if not (k1.shape[:2] == (3, 3) and k2.shape[:2] == (3, 3)
                and k1.shape[2] == k2.shape[3]):  # identity: cin == cout
            continue
        try:
            par = _get(params, bp)
            bn1p, bn2p = par['BatchNorm_0'], par['BatchNorm_1']
            bn1s = _get(stats, bp + ('BatchNorm_0',))
            bn2s = _get(stats, bp + ('BatchNorm_1',))
        except (KeyError, TypeError):
            continue
        if 'Conv_2' in par:  # projection shortcut: not an identity block
            continue
        entry = {}
        ok = True
        for tag, bnp, bns in (('1', bn1p, bn1s), ('2', bn2p, bn2s)):
            var = np.asarray(bns['var'], np.float32)
            if not np.allclose(var + 1e-5, 1.0, atol=1e-6):
                ok = False  # not a folded pure-affine BN
                break
            scale = np.asarray(bnp.get('scale', 1.0), np.float32)
            mean = np.asarray(bns['mean'], np.float32)
            bias = np.asarray(bnp.get('bias', 0.0), np.float32)
            entry[f'bn{tag}_scale'] = jnp.asarray(scale)
            entry[f'bn{tag}_shift'] = jnp.asarray(bias - mean * scale)
        if ok:
            _set(quant, bp + (BLOCK_FUSE_KEY,), entry)


def collect_block_entries(quant, qflat: Dict[PathT, dict]) -> Dict[PathT, dict]:
    """{BasicBlock path: fused-chain entry} from the quant collection's
    stored ``block_fuse`` affines (see :func:`_store_block_fusions`).
    Purely structural — safe on tracers inside a jitted predict."""
    blocks: Dict[PathT, dict] = {}
    for path in qflat:
        if path[-1] != 'Conv_0':
            continue
        bp = path[:-1]
        try:
            fuse = _get(dict(quant), bp + (BLOCK_FUSE_KEY,))
        except (KeyError, TypeError):
            continue
        e2 = qflat.get(bp + ('Conv_1',))
        if e2 is None:
            continue
        blocks[bp] = {**fuse, 'e1': qflat[path], 'e2': e2}
    return blocks


def _quantize_act(x, act_scale):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / act_scale)),
                    -127, 127).astype(jnp.int8)


def _conv3x3_s8(xq, kq, padding):
    return jax.lax.conv_general_dilated(
        xq, kq, (1, 1), padding, dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)


def _int8_basic_block(x, be, compute_dtype):
    """Fused identity-shortcut BasicBlock forward (f32 epilogues; the
    unfused path's extra bf16 casts after each conv and the BN modules'
    f32 promotion are dropped — slightly MORE accurate, parity-gated by
    tests/test_quant.py::test_int8_block_chain_matches_unfused)."""
    e1, e2 = be['e1'], be['e2']
    xq = _quantize_act(x, e1['act_scale'])
    acc1 = _conv3x3_s8(xq, e1['kernel_q'], [(1, 1), (1, 1)])
    h = (acc1.astype(jnp.float32)
         * (e1['w_scale'] * e1['act_scale'] * be['bn1_scale'])
         + be['bn1_shift'])
    h = nn.relu(h)
    hq = _quantize_act(h, e2['act_scale'])
    acc2 = _conv3x3_s8(hq, e2['kernel_q'], [(1, 1), (1, 1)])
    y = (acc2.astype(jnp.float32)
         * (e2['w_scale'] * e2['act_scale'] * be['bn2_scale'])
         + be['bn2_shift'])
    y = nn.relu(y + x.astype(jnp.float32))
    return y.astype(compute_dtype)


def _is_fusable_basic_block(mod) -> bool:
    from .backbones.resnet import BasicBlock
    return (isinstance(mod, BasicBlock) and mod.stride == 1
            and mod.dilation == 1)


def _block_maxch() -> int:
    """VD3D_INT8_BLOCK_MAXCH (default 64): widest channel count routed to
    the Pallas fused-block kernel. XLA's requant-fusion failure is a
    64-ch phenomenon (docs/int8_roofline.md); wider blocks already run
    near peak through the XLA emitter."""
    import os
    return int(os.environ.get('VD3D_INT8_BLOCK_MAXCH', '64'))


def int8_interceptor(qflat: Dict[PathT, dict], compute_dtype=jnp.bfloat16,
                     blocks: Optional[Dict[PathT, dict]] = None,
                     block_impl: str = 'pallas'):
    """Flax method interceptor running quantized convs from ``qflat``
    (and, when ``blocks`` is given, whole fused BasicBlock chains —
    ``block_impl`` 'pallas' for the in-VMEM kernel (ops/int8_block.py),
    'xla' for the flat jnp chain)."""
    blocks = blocks or {}

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if context.method_name == '__call__':
            if blocks and _is_fusable_basic_block(mod):
                be = blocks.get(tuple(mod.path))
                if be is not None and args[0].shape[-1] == mod.features:
                    if (block_impl == 'pallas'
                            and mod.features <= _block_maxch()):
                        from visualdet3d_tpu.ops.int8_block import (
                            int8_basic_block_fused)
                        return int8_basic_block_fused(args[0], be,
                                                      compute_dtype)
                    if block_impl == 'xla':
                        return _int8_basic_block(args[0], be, compute_dtype)
            if isinstance(mod, nn.Conv):
                entry = qflat.get(tuple(mod.path))
                if entry is not None:
                    return _int8_conv(mod, args[0], entry, compute_dtype)
        return next_fn(*args, **kwargs)

    return interceptor


class Int8InferenceMixin:
    """Adds post-training int8 inference to a detector system.

    Host API:  absmax = system.calibrate_int8(folded_vars, batches)
               qvars = system.quantize_int8(folded_vars, absmax, image_hw)
               cfg.inference_dtype = 'int8'; system.predict(qvars, ...)
    Classes provide: ``self.net`` (flax module applied via ``_eval_apply``),
    ``_int8_trace_args(image_hw, batch_size)`` (ShapeDtypeStructs matching
    the net inputs) and ``int8_deny`` (prediction-conv paths kept bf16).
    """

    int8_deny: tuple = ()

    def _int8_deny_set(self) -> frozenset:
        """Deny set; cfg.int8_all=True or VD3D_INT8_ALL=1 lifts it
        (quantizes the final prediction convs too — measured -1.0 ms of
        batch-16 stereo device time, tools/bench_int8_knobs.py; the
        test_quant parity/AP gates are the arbiter of whether that trade
        is safe). Env overrides config either way."""
        import os
        env = os.environ.get('VD3D_INT8_ALL')
        on = (env == '1') if env is not None else bool(
            self.cfg.get('int8_all', False))
        if on:
            return frozenset()
        return frozenset(self.int8_deny)

    def _int8_select(self) -> Callable:
        """Selection predicate honoring the config keys
        ``int8_min_channels`` / ``int8_s2d`` (env knobs VD3D_INT8_MINCH /
        VD3D_INT8_S2D override — the bench tooling sweeps via env)."""
        import os
        import functools
        env_minch = os.environ.get('VD3D_INT8_MINCH')
        minch = int(env_minch) if env_minch is not None else int(
            self.cfg.get('int8_min_channels', 64))
        env_s2d = os.environ.get('VD3D_INT8_S2D')
        s2d = (env_s2d == '1') if env_s2d is not None else bool(
            self.cfg.get('int8_s2d', False))
        return functools.partial(default_select,
                                 min_channels=minch, s2d=s2d)

    def _eval_apply(self, variables, *inputs):
        return self.net.apply(variables, *inputs, train=False)

    def _int8_trace_args(self, image_hw, batch_size: int = 1):
        import jax as _jax
        img = _jax.ShapeDtypeStruct((batch_size, *image_hw, 3), jnp.float32)
        return (img,)

    def calibrate_int8(self, variables, batches):
        """Per-conv activation absmax over calibration batches (f32 vars)."""
        return record_act_absmax(self._eval_apply, variables, batches,
                                 deny=self._int8_deny_set(),
                                 select=self._int8_select())

    def int8_calib_inputs(self, batch: dict) -> tuple:
        """Collated dataset batch dict -> the ``_eval_apply`` input tuple
        (so calibration can draw real images straight from a dataset —
        the config/CLI quantization surface, pipelines/inference_prep.py)."""
        return (batch['images'], batch['P2'])

    def quantize_int8(self, variables, act_absmax, image_hw,
                      batch_size: int = 1):
        """FOLDED f32 variables -> inference-only int8 variables (adds the
        'quant' collection; use with cfg.inference_dtype = 'int8')."""
        return quantize_variables(
            variables, act_absmax, self._eval_apply,
            *self._int8_trace_args(image_hw, batch_size),
            deny=self._int8_deny_set(), select=self._int8_select())

    def _inference_cast(self, variables, images_list):
        """Apply cfg.inference_dtype: returns (variables, cast image list,
        apply-context). For 'int8' the quant collection drives the conv
        interceptor and the float remainder runs bf16."""
        import contextlib
        dtype = self.cfg.get('inference_dtype', 'float32')
        if dtype == 'float32':
            return variables, images_list, contextlib.nullcontext()
        if dtype == 'int8':
            assert QUANT_COLLECTION in variables, (
                "inference_dtype='int8' needs quantize_int8 variables")
            qflat = flatten_quant(variables[QUANT_COLLECTION])
            # fused BasicBlock chains (VD3D_INT8_BLOCK / cfg.int8_block):
            # affines pre-stored in the quant collection at quantize time
            # (f32-exempt from the bf16 cast below), lookup tracer-safe
            env = __import__('os').environ.get('VD3D_INT8_BLOCK')
            raw = env if env is not None else self.cfg.get('int8_block',
                                                           False)
            if raw in (True, '1', 'pallas'):
                block_impl = 'pallas'
            elif raw == 'xla':
                block_impl = 'xla'
            else:
                block_impl = ''
            blocks = collect_block_entries(
                variables[QUANT_COLLECTION], qflat) if block_impl else None
            ctx = nn.intercept_methods(int8_interceptor(
                qflat, blocks=blocks, block_impl=block_impl))
            variables = {
                k: (v if k == QUANT_COLLECTION
                    else _cast_floating(v, jnp.bfloat16))
                for k, v in variables.items()}
            return (variables,
                    [im.astype(jnp.bfloat16) for im in images_list], ctx)
        variables = _cast_floating(variables, dtype)
        return (variables, [im.astype(dtype) for im in images_list],
                contextlib.nullcontext())


def _cast_floating(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)
