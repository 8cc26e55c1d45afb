"""Time the real get_bboxes on TPU with production shapes."""
import json, sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def timeit(fn, *args, iters=30):
    import jax
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000

def main():
    import jax, jax.numpy as jnp
    from visualdet3d_tpu.models.heads import detection_3d_head as head_lib

    b, n, c = 8, 28800, 2
    rng = np.random.default_rng(0)
    cls_preds = jnp.asarray(rng.standard_normal((b, n, c + 1)).astype(np.float32))
    reg_preds = jnp.asarray(rng.standard_normal((b, n, 12)).astype(np.float32))
    anchors = jnp.asarray(rng.uniform(0, 1000, (n, 4)).astype(np.float32))
    mean_std = jnp.asarray(rng.uniform(0.5, 2, (n, c, 6, 2)).astype(np.float32))
    useful = jnp.asarray(rng.uniform(0, 1, (b, n)) > 0.5)

    @jax.jit
    def decode_all(cp, rp, um):
        def one(c_, r_, m_):
            return head_lib.get_bboxes(c_, r_, anchors, mean_std, m_,
                                       num_classes=c, image_hw=(288, 1280),
                                       score_thr=0.75, nms_iou_thr=0.4,
                                       max_detections=32, pre_top_k=1024)
        return jax.vmap(one)(cp, rp, um)
    print(json.dumps({'real_get_bboxes_ms': round(timeit(decode_all, cls_preds, reg_preds, useful), 2)}))

if __name__ == '__main__':
    main()
