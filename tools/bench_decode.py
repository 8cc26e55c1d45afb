"""Micro-bench the decode/NMS sub-stages on the TPU."""
import json
import sys
import time


def timeit(fn, *args, iters=30):
    import jax
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import os
    import sys as _s
    _s.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    import jax
    import jax.numpy as jnp
    from visualdet3d_tpu.geometry import calc_iou
    from visualdet3d_tpu.models.heads import target_coding
    from visualdet3d_tpu.ops.nms import _greedy_suppress

    b, n, k, c = 8, 28800, 1024, 2
    rng = np.random.default_rng(0)
    cls_preds = jnp.asarray(rng.standard_normal((b, n, c + 1)).astype(np.float32))
    reg_preds = jnp.asarray(rng.standard_normal((b, n, 12)).astype(np.float32))
    anchors = jnp.asarray(rng.uniform(0, 1000, (n, 4)).astype(np.float32))
    mean_std = jnp.asarray(rng.uniform(0.5, 2, (n, c, 6, 2)).astype(np.float32))
    boxes4 = jnp.asarray(rng.uniform(0, 1000, (b, n, 4)).astype(np.float32))
    scores = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))

    results = {}

    @jax.jit
    def sigmoid_decode(cp, rp):
        def one(cls_p, reg_p):
            probs = jax.nn.sigmoid(cls_p)
            ms = probs[:, :c].max(-1)
            lab = probs[:, :c].argmax(-1)
            sel = target_coding.select_mean_std_by_class(mean_std, lab)
            bx, ok = target_coding.decode(anchors, reg_p, sel, probs[:, c:c + 1])
            return bx, ms
        return jax.vmap(one)(cp, rp)
    results['sigmoid_decode_ms'] = timeit(sigmoid_decode, cls_preds, reg_preds)

    @jax.jit
    def topk_only(s):
        return jax.vmap(lambda x: jax.lax.top_k(x, k))(s)
    results['topk_ms'] = timeit(topk_only, scores)

    @jax.jit
    def gather_rows(bx, s):
        def one(boxes, sc):
            _, order = jax.lax.top_k(sc, k)
            return boxes[order]
        return jax.vmap(one)(bx, s)
    results['topk_gather_ms'] = timeit(gather_rows, boxes4, scores)

    @jax.jit
    def iou_mat(bx, s):
        def one(boxes, sc):
            _, order = jax.lax.top_k(sc, k)
            cand = boxes[order]
            return calc_iou(cand, cand)
        return jax.vmap(one)(bx, s)
    results['topk_gather_iou_ms'] = timeit(iou_mat, boxes4, scores)

    @jax.jit
    def full_nms(bx, s):
        def one(boxes, sc):
            top, order = jax.lax.top_k(sc, k)
            cand = boxes[order]
            iou = calc_iou(cand, cand)
            keep = _greedy_suppress(iou, top > 0.5, 0.4)
            rank = jnp.where(keep, jnp.arange(k), k)
            sel = jnp.argsort(rank)[:32]
            return order[sel], keep[sel]
        return jax.vmap(one)(bx, s)
    results['full_nms_ms'] = timeit(full_nms, boxes4, scores)

    print(json.dumps({kk: round(v, 2) for kk, v in results.items()}))


if __name__ == '__main__':
    main()
